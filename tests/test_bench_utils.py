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
