"""FER2013+ benchmark reproduction recipe (the reference's regression).

The reference's de-facto regression test is rerunning
``benchmark_ferplus_models`` against its README accuracy table
(SURVEY.md section 4.5; /root/reference/README.md:40-41):

    resnet50-ferplus   val 89.0 %   test 87.6 %
    senet50-ferplus    val 89.8 %   test 88.8 %   <- parity north star

This driver makes that a one-command, checkable run:

    python -m mcncrossmodalemotions_tpu.exp.reproduce_ferplus \
        --fer-csv fer2013.csv --ferplus-csv fer2013new.csv

1. resolves the released teacher .mat weights through the artifact
   registry (download-on-miss; offline -> actionable error),
2. parses the FER2013/FER+ csvs into the imdb,
3. evaluates both released models on val and test through the exact
   preprocessing chain (gray->3ch, mean-subtract, bilinear resize),
4. compares against the expected numbers within ``tolerance`` and
   writes a pass/fail report.

The csvs themselves are gated behind a Kaggle licence and cannot be
redistributed or auto-downloaded (same situation as the reference,
which requires the user to fetch them — getFerPlusImdb upstream).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

# README.md:40-41 of the reference
EXPECTED_ACCURACY: Dict[str, Dict[str, float]] = {
    "resnet50-ferplus": {"valAcc": 0.890, "testAcc": 0.876},
    "senet50-ferplus": {"valAcc": 0.898, "testAcc": 0.888},
}
# MatConvNet->Flax import crosses bf16 conv stacks + resize kernels;
# half a percentage point is the documented acceptance band. The
# augmentation double-resample deviation contributes ~nothing to it:
# measured single- vs double-resample training differs by +0.009 with a
# 0.15 seed std — two of three seeds bit-identical accuracy
# (tools/ablate_ferplus_resample.py; docs/PERF.md round-4 resample
# study) — so the band covers bf16 numerics + run variance only.
DEFAULT_TOLERANCE = 0.005

MODELS = (("resnet50-ferplus", "softmaxlog"),
          ("senet50-ferplus", "distributions"))


def check_results(results: Dict[str, Dict[str, float]],
                  tolerance: float = DEFAULT_TOLERANCE,
                  expected: Optional[dict] = None) -> dict:
    """Compare measured accuracies to the reference table.

    Returns {"pass": bool, "rows": [...]}; exercised by tests with
    synthetic results so the comparison logic itself is regression-safe.
    """
    expected = expected or EXPECTED_ACCURACY
    rows, ok = [], True
    for model, want in expected.items():
        got = results.get(model)
        for subset, target in want.items():
            measured = None if got is None else got.get(subset)
            passed = (measured is not None
                      and abs(measured - target) <= tolerance)
            ok &= passed
            rows.append({"model": model, "subset": subset,
                         "expected": target, "measured": measured,
                         "pass": passed})
    return {"pass": ok, "tolerance": tolerance, "rows": rows}


def reproduce_ferplus(fer_csv: str, ferplus_csv: str,
                      out_root: str = "exps/reproduce-ferplus",
                      tolerance: float = DEFAULT_TOLERANCE,
                      download: bool = True,
                      batch_size: int = 128,
                      input_size: int = 224) -> dict:
    """Run the full reproduction; returns the check_results report."""
    from mcncrossmodalemotions_tpu.data.ferplus import parse_ferplus_csvs
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        FerPlusConfig,
        benchmark_ferplus_models,
    )
    from mcncrossmodalemotions_tpu.zoo.artifacts import fetch_artifact

    mats = {name: str(fetch_artifact(name, download=download))
            for name, _ in MODELS}
    imdb = parse_ferplus_csvs(fer_csv, ferplus_csv)
    results = benchmark_ferplus_models(
        imdb, out_root=out_root, models=MODELS, pretrained_mats=mats,
        base_cfg=FerPlusConfig(batch_size=batch_size,
                               input_size=input_size),
        cache_dir=str(Path(out_root) / "cache"))
    report = check_results(results, tolerance)
    report["results"] = results
    out = Path(out_root)
    out.mkdir(parents=True, exist_ok=True)
    (out / "report.json").write_text(json.dumps(report, indent=2) + "\n")
    for row in report["rows"]:
        status = "PASS" if row["pass"] else "FAIL"
        measured = ("none" if row["measured"] is None
                    else f"{row['measured']:.3f}")
        print(f"[{status}] {row['model']} {row['subset']}: "
              f"measured {measured} vs expected {row['expected']:.3f} "
              f"(±{tolerance})")
    return report


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--fer-csv", required=True,
                   help="path to fer2013.csv (Kaggle)")
    p.add_argument("--ferplus-csv", required=True,
                   help="path to fer2013new.csv (FERPlus votes)")
    p.add_argument("--out-root", default="exps/reproduce-ferplus")
    p.add_argument("--tolerance", type=float, default=DEFAULT_TOLERANCE)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--no-download", action="store_true")
    args = p.parse_args(argv)
    report = reproduce_ferplus(args.fer_csv, args.ferplus_csv,
                               out_root=args.out_root,
                               tolerance=args.tolerance,
                               download=not args.no_download,
                               batch_size=args.batch_size,
                               input_size=args.input_size)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
