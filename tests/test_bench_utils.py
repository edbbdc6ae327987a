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
    """Every link-bound metric has a `*_best` ratchet in main(); keep the
    two lists in sync by construction."""
    bench = _load_bench()
    src = Path(bench.__file__).read_text()
    for key in bench._LINK_BOUND_KEYS:
        assert src.count(f'"{key}"') >= 2, (
            f"{key} missing from the best-ratchet list or vice versa")
