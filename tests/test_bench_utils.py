"""Unit tests for bench.py's pure reporting helpers.

The bench itself needs the real chip; these pin the link-normalisation
math (docs/PERF.md round-5: regressions at unequal tunnel health must be
mechanically visible in bench_history.jsonl).
"""

import importlib.util
import sys
from pathlib import Path


def _load_bench():
    path = Path(__file__).resolve().parents[1] / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_module", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_module"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_link_normalise_adds_ratio_fields():
    bench = _load_bench()
    details = {
        "link_put_mb_per_sec": 25.0,
        "end_to_end_epoch_utts_per_sec": 250.0,
        "audio_feats_tracks_per_sec": 100.0,
        "train_step_utts_per_sec": 3100.0,  # NOT link-bound: untouched
    }
    bench._link_normalise(details)
    assert details["end_to_end_epoch_utts_per_sec_per_link_mbps"] == 10.0
    assert details["audio_feats_tracks_per_sec_per_link_mbps"] == 4.0
    assert "train_step_utts_per_sec_per_link_mbps" not in details
    # missing metrics don't create fields
    assert "dense_inference_e2e_imgs_per_sec_per_link_mbps" not in details


def test_link_normalise_requires_link_measurement():
    bench = _load_bench()
    details = {"end_to_end_epoch_utts_per_sec": 250.0}
    bench._link_normalise(details)  # no link_put_mb_per_sec: no-op
    assert all(not k.endswith("_per_link_mbps") for k in details)


def test_numerics_gate_passes_self_and_fails_perturbed(tmp_path, monkeypatch):
    """The numerics smoke (docs/PERF.md round-5) must PASS against its
    own probe output and FAIL when the golden drifts beyond tolerance —
    pinned here without touching a device by stubbing the probe."""
    import numpy as np

    bench = _load_bench()
    probe = {
        "frontend": np.linspace(-2.0, 2.0, 64).reshape(2, 32),
        "losses": np.asarray([2.08, 2.05, 2.01], np.float64),
    }
    monkeypatch.setattr(bench, "_numerics_probe", lambda: probe)

    good = tmp_path / "golden.npz"
    np.savez(good, **probe)
    details = {}
    bench.bench_numerics(details, str(good))
    assert details["numerics_ok"] is True
    assert details["numerics_frontend_rel"] == 0.0

    # loss drift beyond the documented bf16 envelope must trip the gate
    bad = tmp_path / "bad.npz"
    np.savez(bad, frontend=probe["frontend"],
             losses=probe["losses"] * (1 + 2 * bench._NUMERICS_LOSS_RTOL))
    details = {}
    bench.bench_numerics(details, str(bad))
    assert details["numerics_ok"] is False

    # frontend drift alone must trip it too
    bad2 = tmp_path / "bad2.npz"
    np.savez(bad2, losses=probe["losses"], frontend=probe["frontend"]
             + 2 * bench._NUMERICS_FRONTEND_RTOL * 2.0)
    details = {}
    bench.bench_numerics(details, str(bad2))
    assert details["numerics_ok"] is False

    # a missing golden records nothing rather than a false PASS
    details = {}
    bench.bench_numerics(details, str(tmp_path / "absent.npz"))
    assert "numerics_ok" not in details


def test_online_keymap_covers_worker_fields():
    """Every field the online e2e worker emits lands in a distinct
    details key (a dropped mapping would silently shrink the record)."""
    bench = _load_bench()
    src = bench.bench_end_to_end_epoch.__doc__ or ""
    assert "online" in src
    import inspect

    code = inspect.getsource(bench.bench_end_to_end_epoch)
    for field in ("utts_per_sec", "num_samples", "feed_bound_frac",
                  "feed_bytes_per_utt", "frames_per_crop"):
        assert f'"{field}"' in code, field
    assert '"online_epoch_utts_per_sec"' in code


def test_link_bound_keys_all_ratcheted():
    """Every link-bound metric ratchets a `*_best` line, never downward,
    and only for metrics measured this run (the ratchet iterates
    _LINK_BOUND_KEYS directly, so the lists cannot drift)."""
    bench = _load_bench()
    assert len(bench._LINK_BOUND_KEYS) >= 4
    # Seed the ratcheted key explicitly (not positionally from
    # _LINK_BOUND_KEYS) so the downward-ratchet assertion can never go
    # vacuous if the key list is reordered.
    assert "end_to_end_epoch_utts_per_sec" in bench._LINK_BOUND_KEYS
    other = next(k for k in bench._LINK_BOUND_KEYS
                 if k != "end_to_end_epoch_utts_per_sec")
    merged = {"end_to_end_epoch_utts_per_sec_best": 300.0}
    details = {"end_to_end_epoch_utts_per_sec": 250.0, other: 250.0}
    bench._ratchet_best(merged, details)
    # existing higher best survives a worse run; new metric gets a line
    assert merged["end_to_end_epoch_utts_per_sec_best"] == 300.0
    assert merged[f"{other}_best"] == 250.0
    # unmeasured metrics get no spurious ratchet
    assert all(f"{k}_best" not in merged
               for k in bench._LINK_BOUND_KEYS
               if k not in details)
