"""CLI entry points with dotted-path overrides (vl_argparse equivalent).

Every experiment driver is reachable as::

    python -m mcncrossmodalemotions_tpu.cli <command> [key=value ...]

mirroring the reference's ``function(varargin)`` + ``vl_argparse``
pattern (run_distillation.m:71-90), including nested dotted paths.
Examples::

    python -m mcncrossmodalemotions_tpu.cli distill \
        num_epochs=10 batch_size=32 loss_type=hot-cross-ent
    python -m mcncrossmodalemotions_tpu.cli ferplus model=senet50-ferplus
    python -m mcncrossmodalemotions_tpu.cli benchmark-ferplus
    python -m mcncrossmodalemotions_tpu.cli bench
"""

from __future__ import annotations

import sys

from mcncrossmodalemotions_tpu.utils.config import parse_overrides, struct2str


def _split_args(argv):
    overrides = [a for a in argv if "=" in a]
    flags = [a for a in argv if "=" not in a]
    return overrides, flags


def cmd_distill(argv):
    from mcncrossmodalemotions_tpu.exp.run_distillation import (
        DistillationConfig,
        run_distillation,
    )

    overrides, _ = _split_args(argv)
    cfg = parse_overrides(DistillationConfig(), *overrides)
    print(struct2str(cfg))
    _, history, exp_dir = run_distillation(cfg)
    print(f"done; exp dir: {exp_dir}")
    return 0


def cmd_ferplus(argv):
    from mcncrossmodalemotions_tpu.data.ferplus import parse_ferplus_csvs
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        FerPlusConfig,
        ferplus_baselines,
    )

    overrides, flags = _split_args(argv)
    eval_only = None
    for flag in ("--eval-val", "--eval-test"):
        if flag in flags:
            eval_only = flag.rsplit("-", 1)[-1]
    cfg = parse_overrides(FerPlusConfig(), *[o for o in overrides
                                             if not o.startswith("data.")])
    data_overrides = dict(o.split("=", 1) for o in overrides
                          if o.startswith("data."))
    fer_csv = data_overrides.get("data.fer_csv", "data/fer2013/fer2013.csv")
    plus_csv = data_overrides.get("data.ferplus_csv",
                                  "data/fer2013/fer2013new.csv")
    print(struct2str(cfg))
    imdb = parse_ferplus_csvs(fer_csv, plus_csv)
    result = ferplus_baselines(cfg, imdb, evaluate_only=eval_only)
    if eval_only:
        print(f"{eval_only} accuracy: {result[1]['accuracy']:.4f}")
    return 0


def cmd_benchmark_ferplus(argv):
    from mcncrossmodalemotions_tpu.data.ferplus import parse_ferplus_csvs
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        benchmark_ferplus_models,
    )

    overrides, _ = _split_args(argv)
    opts = dict(o.split("=", 1) for o in overrides)
    imdb = parse_ferplus_csvs(
        opts.get("fer_csv", "data/fer2013/fer2013.csv"),
        opts.get("ferplus_csv", "data/fer2013/fer2013new.csv"),
    )
    benchmark_ferplus_models(imdb, out_root=opts.get("out_root", "exps"),
                             cache_dir=opts.get("cache_dir"))
    return 0


def cmd_bench(argv):
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path("bench.py", run_name="__main__")
    return 0


def cmd_reproduce_ferplus(argv):
    """Released-weights FER+ regression vs the reference README table."""
    from mcncrossmodalemotions_tpu.exp.reproduce_ferplus import main as rmain

    return rmain(argv)


def cmd_fetch(argv):
    """Resolve released artifacts by name (download-on-miss).

    Usage: fetch [name ...]   — no names lists the registry.
    The reference's interactive y/n download prompts (emoVoxZoo.m:74-102)
    become an explicit command.
    """
    from mcncrossmodalemotions_tpu.zoo.artifacts import (
        ARTIFACTS,
        artifact_path,
        fetch_artifact,
    )

    if not argv:
        for name, art in sorted(ARTIFACTS.items()):
            state = "cached" if artifact_path(name).exists() else "absent"
            print(f"{name:28s} [{art.kind}] {state:7s} {art.url}")
        return 0
    rc = 0
    for name in argv:
        try:
            print(f"{name}: {fetch_artifact(name)}")
        except Exception as exc:
            print(f"{name}: FAILED — {exc}", file=sys.stderr)
            rc = 1
    return rc


COMMANDS = {
    "distill": cmd_distill,
    "ferplus": cmd_ferplus,
    "benchmark-ferplus": cmd_benchmark_ferplus,
    "reproduce-ferplus": cmd_reproduce_ferplus,
    "bench": cmd_bench,
    "fetch": cmd_fetch,
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        print(__doc__)
        print("commands:", ", ".join(COMMANDS))
        return 0 if argv and argv[0] in ("-h", "--help") else 1
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
