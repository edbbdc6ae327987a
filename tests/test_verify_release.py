"""verify-release battery on synthetic stand-in artifacts.

The orchestrated release gate (exp/verify_release.py; VERDICT r3 missing
#1) must PASS on a well-formed synthetic release tree, FAIL on a
wrong-weights fixture, and gate FER+ accuracy against the expected
table (README.md:38-47 / ferPlusZoo.m:103-114 are the real targets).
"""

import numpy as np
import pytest
import scipy.io

from tests.test_matconvnet_import import (
    _flax_to_matconvnet,
    _save_dagnn_mat,
    _tiny_teacher_release,
)


def _write_dagnn(path, named_params):
    path.parent.mkdir(parents=True, exist_ok=True)
    _save_dagnn_mat(path, named_params, container="classic")


def _build_release_tree(root, rng):
    """Synthetic stand-ins for every released artifact, laid out exactly
    where the registry expects them (<root>/<kind>/<filename>)."""
    import jax

    from mcncrossmodalemotions_tpu.models.vggm import VGGMStudent
    from mcncrossmodalemotions_tpu.zoo.artifacts import artifact_path

    # tiny student release
    model = VGGMStudent(fc6_features=32, fc7_features=16)
    x = np.asarray(rng.randn(1, 512, 100, 1), np.float32)
    variables = jax.device_get(model.init(jax.random.PRNGKey(0), x))
    _write_dagnn(artifact_path("emovoxceleb-student", root=root),
                 _flax_to_matconvnet(variables))

    # tiny teacher releases
    for name, use_se in (("resnet50-ferplus", False),
                         ("senet50-ferplus", True)):
        _, _, _, mat = _tiny_teacher_release(use_se, rng)
        _write_dagnn(artifact_path(name, root=root), mat)

    # released-logits imdb (classic container, reference schema)
    names = ["sp001/a.wav", "sp001/b.wav", "sp002/c.wav"]
    logits = [rng.randn(f, 8).astype(np.float32) * 3 for f in (4, 2, 5)]
    wav_logits = np.empty(len(logits), dtype=object)
    for i, l in enumerate(logits):
        wav_logits[i] = l
    images = {
        "name": np.asarray(names, dtype=object),
        "sp": np.asarray(["sp001", "sp001", "sp002"], dtype=object),
        "set": np.asarray([1, 1, 2], np.float64),
        "denseFrames": np.asarray(
            [f"f{i}.jpg" for i in range(11)], dtype=object),
        "denseFramesWavIds": np.asarray(
            [1] * 4 + [2] * 2 + [3] * 5, np.float64),
    }
    lpath = artifact_path("emovoxceleb-logits", root=root)
    lpath.parent.mkdir(parents=True, exist_ok=True)
    scipy.io.savemat(lpath, {"images": images, "wavLogits": wav_logits})


@pytest.fixture()
def release_tree(tmp_path):
    rng = np.random.RandomState(7)
    root = tmp_path / "artifacts"
    _build_release_tree(root, rng)
    return root


def _run(release_root, tmp_path, **kw):
    from mcncrossmodalemotions_tpu.exp.verify_release import verify_release

    kw.setdefault("artifact_root", str(release_root))
    kw.setdefault("download", False)
    kw.setdefault("probe_image_size", 32)
    kw.setdefault("probe_wav_seconds", 1.0)
    kw.setdefault("out_root", str(tmp_path / "out"))
    kw.setdefault("verbose", False)
    return verify_release(**kw)


def test_verify_release_passes_on_good_tree(release_tree, tmp_path):
    report = _run(release_tree, tmp_path)
    assert report["pass"], report
    assert report["stages"]["artifacts"]["status"] == "pass"
    assert report["stages"]["import_forward"]["status"] == "pass"
    assert report["stages"]["released_logits"]["status"] == "pass"
    assert report["stages"]["released_logits"]["tracks"] == 3
    # no csvs supplied -> the accuracy gate skips, and says why
    assert report["stages"]["ferplus_accuracy"]["status"] == "skip"
    assert (tmp_path / "out" / "verify-release.json").exists()
    # sha256 sidecars were pinned by the artifact stage
    for row in report["stages"]["artifacts"]["rows"]:
        assert row["sha256"] and len(row["sha256"]) == 64


def test_verify_release_fails_on_wrong_weights(release_tree, tmp_path):
    """A mis-scaled release (the wrong-weights fixture) must FAIL the
    probe-forward gate, not sail through."""
    import jax

    from mcncrossmodalemotions_tpu.models.vggm import VGGMStudent
    from mcncrossmodalemotions_tpu.zoo.artifacts import artifact_path

    model = VGGMStudent(fc6_features=32, fc7_features=16)
    x = np.asarray(np.random.RandomState(3).randn(1, 512, 100, 1),
                   np.float32)
    variables = jax.device_get(model.init(jax.random.PRNGKey(3), x))
    mat = _flax_to_matconvnet(variables)
    mat["fc7f"] = mat["fc7f"] * 1e9  # blows the logit-magnitude cap
    path = artifact_path("emovoxceleb-student", root=release_tree)
    path.unlink()
    path.with_suffix(path.suffix + ".sha256").unlink(missing_ok=True)
    _write_dagnn(path, mat)

    report = _run(release_tree, tmp_path)
    assert not report["pass"]
    assert "import_forward" in report["failed"]
    student_row = [r for r in report["stages"]["import_forward"]["rows"]
                   if r["name"] == "emovoxceleb-student"][0]
    assert student_row["status"] == "fail"


def test_verify_release_fails_on_corrupt_logits_imdb(release_tree,
                                                     tmp_path):
    from mcncrossmodalemotions_tpu.zoo.artifacts import artifact_path

    lpath = artifact_path("emovoxceleb-logits", root=release_tree)
    mat = scipy.io.loadmat(lpath, squeeze_me=False)
    bad = mat["wavLogits"].ravel()
    bad[1] = np.full_like(np.asarray(bad[1]), np.nan)
    lpath.unlink()
    lpath.with_suffix(lpath.suffix + ".sha256").unlink(missing_ok=True)
    scipy.io.savemat(lpath, {"images": mat["images"], "wavLogits": bad})

    report = _run(release_tree, tmp_path)
    assert not report["pass"]
    assert "released_logits" in report["failed"]
    assert any("NaN" in p
               for p in report["stages"]["released_logits"]["problems"])


def test_verify_release_fails_on_corrupt_artifact(release_tree, tmp_path):
    """A same-size byte tamper sails through fetch_artifact's size fast
    path, but the release gate re-hashes (full_check) and must FAIL with
    a 'corrupt' row — corruption is never a benign miss here."""
    from mcncrossmodalemotions_tpu.zoo.artifacts import artifact_path

    # first run pins the sha256 sidecars
    report = _run(release_tree, tmp_path)
    assert report["pass"], report

    lpath = artifact_path("emovoxceleb-logits", root=release_tree)
    blob = bytearray(lpath.read_bytes())
    blob[len(blob) // 2] ^= 0xFF  # same size, different bytes
    lpath.write_bytes(bytes(blob))

    report = _run(release_tree, tmp_path)
    assert not report["pass"]
    assert "artifacts" in report["failed"]
    row = [r for r in report["stages"]["artifacts"]["rows"]
           if r["name"] == "emovoxceleb-logits"][0]
    assert row["status"] == "corrupt"


def test_verify_release_container_agreement(release_tree, tmp_path):
    """With a `<name>-v73.mat` sibling present, the classic and HDF5
    importer paths must agree bitwise: an identical re-save PASSES the
    stage, a single perturbed parameter FAILS it (round-4 VERDICT weak
    #5 — the probe forward alone would pass a subtly wrong import)."""
    from mcncrossmodalemotions_tpu.zoo.artifacts import artifact_path
    from mcncrossmodalemotions_tpu.zoo.matconvnet import load_mat_params

    path = artifact_path("emovoxceleb-student", root=release_tree)
    params = load_mat_params(path)
    alt = path.with_name(path.stem + "-v73" + path.suffix)
    _save_dagnn_mat(alt, params, container="v73")

    report = _run(release_tree, tmp_path)
    assert report["pass"], report
    stage = report["stages"]["container_agreement"]
    assert stage["status"] == "pass"
    assert [r["name"] for r in stage["rows"]] == ["emovoxceleb-student"]

    # perturb ONE value in the v7.3 copy: must FAIL, naming the param
    k = sorted(params)[0]
    bad = dict(params)
    bad[k] = np.asarray(bad[k]).copy()
    bad[k].flat[0] += 1e-3
    _save_dagnn_mat(alt, bad, container="v73")
    report = _run(release_tree, tmp_path)
    assert not report["pass"]
    assert "container_agreement" in report["failed"]
    row = report["stages"]["container_agreement"]["rows"][0]
    assert row["status"] == "fail"
    assert any(k in p for p in row["problems"])
    alt.unlink()

    # no pair on disk -> stage skips (and the battery passes again)
    report = _run(release_tree, tmp_path)
    assert report["pass"]
    assert report["stages"]["container_agreement"]["status"] == "skip"


def test_verify_release_sha_manifest(release_tree, tmp_path):
    """A provenance manifest pins artifact hashes independently of the
    first-seen sidecar: matching pins PASS (rows say so), a wrong pin is
    a hard corrupt-row FAIL even though the bytes match their own
    sidecar."""
    import json

    report = _run(release_tree, tmp_path)  # pins sidecars
    assert report["pass"]
    pins = {r["name"]: r["sha256"]
            for r in report["stages"]["artifacts"]["rows"]}

    manifest = tmp_path / "pins.json"
    manifest.write_text(json.dumps(pins))
    report = _run(release_tree, tmp_path, sha_manifest=str(manifest))
    assert report["pass"], report
    assert all(r["manifest"] == "match"
               for r in report["stages"]["artifacts"]["rows"])

    pins["emovoxceleb-student"] = "0" * 64
    manifest.write_text(json.dumps(pins))
    report = _run(release_tree, tmp_path, sha_manifest=str(manifest))
    assert not report["pass"]
    assert "artifacts" in report["failed"]
    row = [r for r in report["stages"]["artifacts"]["rows"]
           if r["name"] == "emovoxceleb-student"][0]
    assert row["status"] == "corrupt" and "manifest" in row["error"]


def test_verify_release_manifest_checked_without_sidecar(release_tree,
                                                         tmp_path):
    """A manifest pin must be enforced even when the artifact's sha256
    sidecar is absent (e.g. torn write treated as no-pin): the bytes are
    hashed directly. Good pin PASSES; wrong pin FAILS."""
    import json

    from mcncrossmodalemotions_tpu.zoo.artifacts import (
        _file_sha256,
        artifact_path,
    )

    path = artifact_path("emovoxceleb-student", root=release_tree)
    good = _file_sha256(path)
    manifest = tmp_path / "pins.json"

    def _drop_sidecars():
        for sc in release_tree.rglob("*.sha256"):
            sc.unlink()

    manifest.write_text(json.dumps({"emovoxceleb-student": good}))
    _drop_sidecars()
    report = _run(release_tree, tmp_path, sha_manifest=str(manifest))
    assert report["pass"], report

    manifest.write_text(json.dumps({"emovoxceleb-student": "0" * 64}))
    _drop_sidecars()
    report = _run(release_tree, tmp_path, sha_manifest=str(manifest))
    assert not report["pass"]
    row = [r for r in report["stages"]["artifacts"]["rows"]
           if r["name"] == "emovoxceleb-student"][0]
    assert row["status"] == "corrupt" and "manifest" in row["error"]


def test_verify_release_empty_tree_does_not_pass(tmp_path):
    """An offline run with nothing available must not report PASS (all
    stages skipped is not verification)."""
    report = _run(tmp_path / "nothing-here", tmp_path)
    assert not report["pass"]
    assert report["executed"] == []


def _write_fer_csvs(tmp_path, rng, n=24):
    fer_csv = tmp_path / "fer2013.csv"
    ferplus_csv = tmp_path / "fer2013new.csv"
    usages = (["Training"] * (n // 2) + ["PublicTest"] * (n // 4)
              + ["PrivateTest"] * (n - n // 2 - n // 4))
    with open(fer_csv, "w") as f:
        f.write("emotion,pixels,Usage\n")
        for i in range(n):
            pix = " ".join(str(v) for v in rng.randint(0, 255, 48 * 48))
            f.write(f"0,{pix},{usages[i]}\n")
    with open(ferplus_csv, "w") as f:
        f.write("Usage,Image name,neutral,happiness,surprise,sadness,"
                "anger,disgust,fear,contempt,unknown,NF\n")
        for i in range(n):
            votes = rng.randint(0, 5, 10)
            votes[rng.randint(0, 8)] += 6
            f.write(f"{usages[i]},fer{i:07d}.png,"
                    + ",".join(str(v) for v in votes) + "\n")
    return str(fer_csv), str(ferplus_csv)


def test_verify_release_ferplus_gate(release_tree, tmp_path):
    """With csvs supplied the accuracy gate runs end to end: random tiny
    weights miss an ambitious expected table (FAIL), and hit their own
    measured numbers (PASS — proves the gate passes when accuracy
    matches, cache-keyed so the second run is cheap)."""
    rng = np.random.RandomState(11)
    fer_csv, ferplus_csv = _write_fer_csvs(tmp_path, rng)
    common = dict(fer_csv=fer_csv, ferplus_csv=ferplus_csv,
                  check_logits_imdb=False,
                  models=("senet50-ferplus",),
                  ferplus_batch_size=8, ferplus_input_size=48)

    report = _run(release_tree, tmp_path,
                  expected_accuracy={
                      "senet50-ferplus": {"valAcc": 0.898,
                                          "testAcc": 0.888}},
                  **common)
    assert not report["pass"]
    assert "ferplus_accuracy" in report["failed"]
    measured = report["stages"]["ferplus_accuracy"]["results"][
        "senet50-ferplus"]

    report2 = _run(release_tree, tmp_path,
                   expected_accuracy={"senet50-ferplus": dict(measured)},
                   **common)
    assert report2["pass"], report2["stages"]["ferplus_accuracy"]
    assert "ferplus_accuracy" in report2["executed"]


def test_verify_release_ferplus_gate_runs_on_available_subset(
        release_tree, tmp_path):
    """When only SOME expected models have artifacts, the accuracy gate
    runs on the available ones (recording the rest as skipped_models)
    instead of silently skipping the whole stage."""
    from mcncrossmodalemotions_tpu.zoo.artifacts import artifact_path

    # remove the resnet50 artifact: senet50 remains available
    rpath = artifact_path("resnet50-ferplus", root=release_tree)
    rpath.unlink()
    rpath.with_suffix(rpath.suffix + ".sha256").unlink(missing_ok=True)

    rng = np.random.RandomState(13)
    fer_csv, ferplus_csv = _write_fer_csvs(tmp_path, rng)
    report = _run(
        release_tree, tmp_path,
        fer_csv=fer_csv, ferplus_csv=ferplus_csv,
        check_logits_imdb=False,
        models=("senet50-ferplus", "resnet50-ferplus"),
        ferplus_batch_size=8, ferplus_input_size=48,
        expected_accuracy={
            "senet50-ferplus": {"valAcc": 0.898, "testAcc": 0.888},
            "resnet50-ferplus": {"valAcc": 0.879, "testAcc": 0.871}})
    stage = report["stages"]["ferplus_accuracy"]
    # the gate RAN (on senet50) rather than skipping outright
    assert stage["status"] in ("pass", "fail")
    assert stage["skipped_models"] == ["resnet50-ferplus"]
    assert list(stage["results"]) == ["senet50-ferplus"]
    # and the artifacts stage records the miss without failing the run
    assert report["stages"]["artifacts"]["missing"] == ["resnet50-ferplus"]
    assert report["stages"]["artifacts"]["status"] == "pass"
    # but the OVERALL verdict must not claim the release verified when a
    # requested model was never seen (transient download failure must
    # not exit 0) — the miss is surfaced as `unverified`
    assert report["unverified"] == ["resnet50-ferplus"]
    assert not report["pass"]


def test_cli_verify_release(release_tree, tmp_path, capsys):
    from mcncrossmodalemotions_tpu.cli import main

    rc = main(["verify-release", f"root={release_tree}",
               "download=false", "check_logits_imdb=true",
               "probe_image_size=32", "probe_wav_seconds=1.0",
               f"out_root={tmp_path / 'cli-out'}"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "verify-release: PASS" in out
    assert (tmp_path / "cli-out" / "verify-release.json").exists()
