"""Download-on-miss artifact registry + released-imdb import tests.

Network is unavailable here, so the registry is tested offline: local
cache hits, sidecar sha256 pinning, corruption detection, graceful
skips, and name->path resolution through the zoos. The released
EmoVoxCeleb logits imdb import is tested against synthetic files in
both MATLAB container formats (classic scipy.io and v7.3/HDF5).
"""

import numpy as np
import pytest

from mcncrossmodalemotions_tpu.zoo.artifacts import (
    ARTIFACTS,
    ArtifactUnavailable,
    artifact_path,
    ensure_artifact,
    fetch_artifact,
)


def test_registry_covers_reference_urls():
    """Every artifact the reference downloads has a registry entry with
    the reference's URL scheme (emoVoxZoo.m:74-102,
    fetch_emovoxceleb_imdb.m:288-324, teacher_stats.m:85-121)."""
    assert ARTIFACTS["emovoxceleb-student"].url.endswith(
        "models/emovoxceleb/emovoxceleb-student.mat")
    assert ARTIFACTS["senet50-ferplus"].url.endswith(
        "models/ferplus/senet50-ferplus.mat")
    assert ARTIFACTS["resnet50-ferplus"].url.endswith(
        "models/ferplus/resnet50-ferplus.mat")
    assert ARTIFACTS["voxceleb-imdb"].url.endswith(
        "cross-modal-emotions/voxceleb-imdb.mat")
    assert ARTIFACTS["emovoxceleb-logits"].url.endswith(
        "cross-modal-emotions/senet50-ferplus-logits.mat")
    assert ARTIFACTS["afew-logits"].url.endswith(
        "cross-modal-emotions/afew-logits.mat")


def test_offline_miss_raises_with_instructions(tmp_path):
    with pytest.raises(ArtifactUnavailable) as exc:
        fetch_artifact("senet50-ferplus", root=tmp_path, download=False)
    msg = str(exc.value)
    assert "robots.ox.ac.uk" in msg and "senet50-ferplus" in msg


def test_ensure_artifact_graceful_none(tmp_path):
    assert ensure_artifact("afew-logits", root=tmp_path,
                           download=False) is None


def test_cache_hit_pins_and_detects_corruption(tmp_path):
    path = artifact_path("senet50-ferplus", root=tmp_path)
    path.parent.mkdir(parents=True)
    path.write_bytes(b"fake release contents")
    got = fetch_artifact("senet50-ferplus", root=tmp_path, download=False)
    assert got == path
    sidecar = path.with_suffix(path.suffix + ".sha256")
    assert sidecar.exists()
    # same content -> still fine
    fetch_artifact("senet50-ferplus", root=tmp_path, download=False)
    # corrupt the file -> pinned digest mismatch
    path.write_bytes(b"tampered")
    with pytest.raises(ArtifactUnavailable, match="sha256 changed"):
        fetch_artifact("senet50-ferplus", root=tmp_path, download=False)


def test_truncated_sidecar_recovers(tmp_path):
    """A crash mid-write can leave an empty/garbled .sha256 sidecar
    (write_text is not atomic). Loads must re-pin, not die with
    IndexError forever."""
    path = artifact_path("senet50-ferplus", root=tmp_path)
    path.parent.mkdir(parents=True)
    path.write_bytes(b"fake release contents")
    sidecar = path.with_suffix(path.suffix + ".sha256")
    for garbage in ("", "shorttoken"):
        sidecar.write_text(garbage)
        got = fetch_artifact("senet50-ferplus", root=tmp_path,
                             download=False)
        assert got == path
        parts = sidecar.read_text().split()  # re-pinned cleanly
        assert len(parts[0]) == 64 and int(parts[1]) == path.stat().st_size
    # a well-formed hash token with a garbled size is treated as a real
    # pin: mismatching content still raises (corruption detection keeps
    # priority over recovery)
    sidecar.write_text("a" * 64 + " notanint")
    with pytest.raises(ArtifactUnavailable, match="sha256 changed"):
        fetch_artifact("senet50-ferplus", root=tmp_path, download=False)


def test_unknown_artifact_keyerror():
    with pytest.raises(KeyError):
        fetch_artifact("nonexistent-model")


def test_zoo_resolves_registry_names(tmp_path, monkeypatch):
    """load_pretrained_teacher('senet50-ferplus') resolves through the
    artifact cache (download-on-miss path, offline cache hit here)."""
    import scipy.io

    from tests.test_matconvnet_import import (
        _export_via_map,
        _tiny_teacher_release,
    )

    rng = np.random.RandomState(0)
    _, _, _, mat = _tiny_teacher_release(True, rng)
    path = artifact_path("senet50-ferplus", root=tmp_path)
    path.parent.mkdir(parents=True)
    dtype = [("name", object), ("value", object)]
    arr = np.zeros((len(mat),), dtype=dtype)
    for i, (n, v) in enumerate(mat.items()):
        arr[i] = (n, v)
    scipy.io.savemat(path, {"net": {"params": arr}})

    monkeypatch.setenv("MCN_TPU_ARTIFACT_ROOT", str(tmp_path))
    from mcncrossmodalemotions_tpu.zoo import load_pretrained_teacher

    model, variables = load_pretrained_teacher("senet50-ferplus",
                                               download=False)
    assert model.use_se and model.num_outputs == 8


# ---------------------------------------------------------------------------
# Released EmoVoxCeleb imdb (senet50-ferplus-logits.mat) import
# ---------------------------------------------------------------------------

_NAMES = ["A.J._Buckley/1zcIwhmdeo4_0000001.wav",
          "A.J._Buckley/1zcIwhmdeo4_0000002.wav",
          "A.R._Rahman/0juFHTCUnracy_0000003.wav"]
_SPEAKERS = ["A.J._Buckley", "A.J._Buckley", "A.R._Rahman"]
_SETS = [1, 3, 2]
_FRAMES = ["A.J._Buckley/1zcIwhmdeo4_0000001/01.jpg",
           "A.J._Buckley/1zcIwhmdeo4_0000001/07.jpg",
           "A.J._Buckley/1zcIwhmdeo4_0000002/01.jpg",
           "A.R._Rahman/0juFHTCUnracy_0000003/01.jpg",
           "A.R._Rahman/0juFHTCUnracy_0000003/07.jpg",
           "A.R._Rahman/0juFHTCUnracy_0000003/13.jpg"]
_FRAME_WAV_IDS = [1, 1, 2, 3, 3, 3]  # MATLAB 1-based


def _reference_logits(rng):
    return [rng.randn(2, 8).astype(np.float32),
            rng.randn(1, 8).astype(np.float32),
            rng.randn(3, 8).astype(np.float32)]


def _check_imported(imdb, logits):
    assert list(imdb.wav_paths) == _NAMES
    assert list(imdb.speaker) == _SPEAKERS
    assert list(imdb.set_id) == _SETS
    for got, want in zip(imdb.wav_logits, logits):
        np.testing.assert_allclose(got, want, rtol=1e-6)
    assert len(imdb.dense_frames) == 3
    assert list(imdb.dense_frames[0]) == _FRAMES[:2]
    assert list(imdb.dense_frames[1]) == _FRAMES[2:3]
    assert list(imdb.dense_frames[2]) == _FRAMES[3:]


def test_emovox_imdb_from_mat_scipy(tmp_path):
    import scipy.io

    from mcncrossmodalemotions_tpu.data.imdb import emovox_imdb_from_mat

    rng = np.random.RandomState(1)
    logits = _reference_logits(rng)
    images = {
        "name": np.asarray(_NAMES, dtype=object),
        "sp": np.asarray(_SPEAKERS, dtype=object),
        "set": np.asarray(_SETS, np.float64),
        "denseFrames": np.asarray(_FRAMES, dtype=object),
        "denseFramesWavIds": np.asarray(_FRAME_WAV_IDS, np.float64),
    }
    wav_logits = np.empty(3, dtype=object)
    for i, l in enumerate(logits):
        wav_logits[i] = l
    path = tmp_path / "senet50-ferplus-logits.mat"
    scipy.io.savemat(path, {"images": images, "wavLogits": wav_logits})

    imdb = emovox_imdb_from_mat(path, wav_dir="/w", frame_dir="/f")
    _check_imported(imdb, logits)
    assert imdb.wav_dir == "/w"


def test_emovox_imdb_from_mat_v73(tmp_path):
    """MATLAB -v7.3 layout: HDF5 with uint16-codepoint strings, object
    references for cells, and column-major (transposed) numerics."""
    import h5py

    from mcncrossmodalemotions_tpu.data.imdb import emovox_imdb_from_mat

    rng = np.random.RandomState(2)
    logits = _reference_logits(rng)
    path = tmp_path / "senet50-ferplus-logits-v73.mat"
    with h5py.File(path, "w") as f:
        refs_grp = f.create_group("#refs#")

        def make_str_cell(parent, name, strings):
            cell = parent.create_dataset(
                name, shape=(len(strings), 1),
                dtype=h5py.special_dtype(ref=h5py.Reference))
            for i, s in enumerate(strings):
                ds = refs_grp.create_dataset(
                    f"{name}_{i}",
                    data=np.asarray([[ord(c)] for c in s], np.uint16))
                cell[i, 0] = ds.ref
            return cell

        images = f.create_group("images")
        make_str_cell(images, "name", _NAMES)
        make_str_cell(images, "sp", _SPEAKERS)
        images.create_dataset("set", data=np.asarray(_SETS, np.float64)
                              .reshape(1, -1))
        make_str_cell(images, "denseFrames", _FRAMES)
        images.create_dataset(
            "denseFramesWavIds",
            data=np.asarray(_FRAME_WAV_IDS, np.float64).reshape(1, -1))
        cell = f.create_dataset(
            "wavLogits", shape=(len(logits), 1),
            dtype=h5py.special_dtype(ref=h5py.Reference))
        for i, l in enumerate(logits):
            ds = refs_grp.create_dataset(f"logits_{i}", data=l.T)  # col-major
            cell[i, 0] = ds.ref

    imdb = emovox_imdb_from_mat(path)
    _check_imported(imdb, logits)


def test_fetch_driver_uses_released_imdb(tmp_path, monkeypatch):
    """fetch_emovoxceleb_imdb(download=True) resolves the released logits
    imdb from the artifact cache and converts it (offline cache hit)."""
    import scipy.io

    from mcncrossmodalemotions_tpu.exp.fetch_emovoxceleb_imdb import (
        fetch_emovoxceleb_imdb,
    )

    rng = np.random.RandomState(3)
    logits = _reference_logits(rng)
    images = {
        "name": np.asarray(_NAMES, dtype=object),
        "sp": np.asarray(_SPEAKERS, dtype=object),
        "set": np.asarray(_SETS, np.float64),
        "denseFrames": np.asarray(_FRAMES, dtype=object),
        "denseFramesWavIds": np.asarray(_FRAME_WAV_IDS, np.float64),
    }
    wav_logits = np.empty(3, dtype=object)
    for i, l in enumerate(logits):
        wav_logits[i] = l
    mat_path = artifact_path("emovoxceleb-logits", root=tmp_path)
    mat_path.parent.mkdir(parents=True)
    scipy.io.savemat(mat_path, {"images": images, "wavLogits": wav_logits})
    monkeypatch.setenv("MCN_TPU_ARTIFACT_ROOT", str(tmp_path))

    cache = tmp_path / "emovox.npz"
    imdb = fetch_emovoxceleb_imdb(tmp_path / "data", download=True,
                                  cache_path=str(cache))
    _check_imported(imdb, logits)
    assert cache.exists()  # converted imdb cached as npz


def test_emovox_imdb_from_mat_scipy_single_wav(tmp_path):
    """A 1-track classic .mat: squeeze_me collapses the wavLogits cell to
    the bare [F, 8] array; the importer must not explode it into F rows."""
    import scipy.io

    from mcncrossmodalemotions_tpu.data.imdb import emovox_imdb_from_mat

    rng = np.random.RandomState(5)
    logits = rng.randn(4, 8).astype(np.float32)
    images = {
        "name": np.asarray([_NAMES[0]], dtype=object),
        "sp": np.asarray([_SPEAKERS[0]], dtype=object),
        "set": np.asarray([1], np.float64),
    }
    wav_logits = np.empty(1, dtype=object)
    wav_logits[0] = logits
    path = tmp_path / "single.mat"
    scipy.io.savemat(path, {"images": images, "wavLogits": wav_logits})

    imdb = emovox_imdb_from_mat(path, with_frames=False)
    assert imdb.num_tracks == 1
    np.testing.assert_allclose(imdb.wav_logits[0], logits, rtol=1e-6)


def test_sidecar_fast_path_and_size_change(tmp_path):
    """Cache hits take the size fast path; a size change re-hashes and
    flags the corruption."""
    path = artifact_path("afew-logits", root=tmp_path)
    path.parent.mkdir(parents=True)
    path.write_bytes(b"0123456789")
    fetch_artifact("afew-logits", root=tmp_path, download=False)
    sidecar = path.with_suffix(path.suffix + ".sha256")
    digest, size = sidecar.read_text().split()
    assert int(size) == 10
    # same-size tamper passes the fast path (documented tradeoff) but a
    # full check catches it — and reports it as ArtifactCorrupt, which
    # integrity gates (verify-release) treat as FAIL, not a benign miss
    from mcncrossmodalemotions_tpu.zoo.artifacts import (
        ArtifactCorrupt,
        _verify,
    )
    path.write_bytes(b"9876543210")
    fetch_artifact("afew-logits", root=tmp_path, download=False)  # fast path
    with pytest.raises(ArtifactCorrupt, match="sha256 changed"):
        _verify(path, None, full_check=True)
    with pytest.raises(ArtifactCorrupt, match="sha256 changed"):
        fetch_artifact("afew-logits", root=tmp_path, download=False,
                       full_check=True)
    # graceful-skip callers catching ArtifactUnavailable still skip
    assert issubclass(ArtifactCorrupt, ArtifactUnavailable)
