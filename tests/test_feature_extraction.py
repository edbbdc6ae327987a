"""Feature extractors: bucketed audio inference, visual inference,
dense imdb build (compute_audio_feats / compute_visual_feats /
fetch_emovoxceleb_imdb equivalents)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcncrossmodalemotions_tpu.exp.compute_audio_feats import (
    AudioFeatureExtractor,
    bucket_for,
    compute_audio_feats,
    pad_frames_shape,
)


def test_bucket_selection():
    assert bucket_for(100) == 100
    assert bucket_for(399) == 300
    assert bucket_for(1000) == 1000
    assert bucket_for(1990) == 1000
    assert bucket_for(50) == 100  # minimum bucket
    assert pad_frames_shape(399) == 400
    assert pad_frames_shape(1990) == 2000


@pytest.fixture(scope="module")
def tiny_student():
    from mcncrossmodalemotions_tpu.zoo import build_student

    model = build_student(tiny=True, with_frontend=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 512, 100, 1)))
    return model, variables


def test_audio_extractor_variable_lengths(tmp_path, tiny_student, rng):
    """Tracks of different durations produce per-track [1, 8] logits."""
    from mcncrossmodalemotions_tpu.data.audio import write_wav

    model, variables = tiny_student
    paths = []
    for i, seconds in enumerate([1.5, 3.0, 4.5]):
        p = tmp_path / f"t{i}.wav"
        write_wav(p, rng.randn(int(16000 * seconds)).astype(np.float32) * 0.2,
                  16000)
        paths.append(str(p))
    extractor = AudioFeatureExtractor(model, variables, batch_size=2)
    logits = extractor.track_logits(paths, verbose=False)
    assert len(logits) == 3
    for l in logits:
        assert l.shape == (1, 8)
        assert np.all(np.isfinite(l))


def test_audio_extractor_batching_invariance(tmp_path, tiny_student, rng):
    """Same tracks, different batch size -> identical logits."""
    from mcncrossmodalemotions_tpu.data.audio import write_wav

    model, variables = tiny_student
    paths = []
    for i in range(4):
        p = tmp_path / f"b{i}.wav"
        write_wav(p, rng.randn(16000 * 3).astype(np.float32) * 0.2, 16000)
        paths.append(str(p))
    a = AudioFeatureExtractor(model, variables, batch_size=1).track_logits(
        paths, verbose=False)
    b = AudioFeatureExtractor(model, variables, batch_size=4).track_logits(
        paths, verbose=False)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-2)


def test_audio_extractor_packed_feed_matches_python(tmp_path, tiny_student,
                                                    rng):
    """The fused C++ read+quantise chunk path must produce the SAME
    logits as reading floats and packing in numpy (bit-identical feed)."""
    from mcncrossmodalemotions_tpu.data import native
    from mcncrossmodalemotions_tpu.data.audio import write_wav

    if not native.packed_reads_available():
        pytest.skip("native packed reads not built")
    model, variables = tiny_student
    paths = []
    for i, seconds in enumerate([1.5, 3.0, 3.0, 4.5]):
        p = tmp_path / f"q{i}.wav"
        write_wav(p, rng.randn(int(16000 * seconds)).astype(np.float32) * 0.3,
                  16000)
        paths.append(str(p))
    for fmt_kw in ({"emit_int16": True}, {"emit_mulaw": True}):
        fused = AudioFeatureExtractor(model, variables, batch_size=2,
                                      **fmt_kw).track_logits(paths,
                                                             verbose=False)
        orig = native.packed_reads_available
        native.packed_reads_available = lambda: False
        try:
            host = AudioFeatureExtractor(model, variables, batch_size=2,
                                         **fmt_kw).track_logits(
                paths, verbose=False)
        finally:
            native.packed_reads_available = orig
        for x, y in zip(fused, host):
            np.testing.assert_array_equal(x, y)


def test_compute_audio_feats_caching(tmp_path, rng):
    from mcncrossmodalemotions_tpu.data.external import build_synthetic_track_imdb

    imdb = build_synthetic_track_imdb(tmp_path / "rml", tracks_per_class=1)
    feat_path = tmp_path / "feats.npz"
    a = compute_audio_feats(imdb, model_name="random", num_classes=8,
                            feat_path=str(feat_path))
    assert feat_path.exists()
    b = compute_audio_feats(imdb, model_name="random", num_classes=8,
                            feat_path=str(feat_path), seed=123)
    # second call hits the cache: identical despite different seed
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # clobber recomputes and overwrites (compute_audio_feats.m:38,55)
    c = compute_audio_feats(imdb, model_name="random", num_classes=8,
                            feat_path=str(feat_path), seed=123, clobber=True)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))
    d = compute_audio_feats(imdb, model_name="random", num_classes=8,
                            feat_path=str(feat_path))  # cache now seed-123
    for x, y in zip(c, d):
        np.testing.assert_array_equal(x, y)


@pytest.fixture(scope="module")
def tiny_teacher_pipeline():
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        FerPlusConfig,
        build_pipeline,
    )

    cfg = FerPlusConfig(tiny_model=True, input_size=48, dropout=0.0,
                        augment=False)
    model = build_pipeline(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1), jnp.uint8))
    return model, variables


def test_visual_extractor_and_regrouping(tmp_path, tiny_teacher_pipeline):
    from mcncrossmodalemotions_tpu.data.images import save_synthetic_frame
    from mcncrossmodalemotions_tpu.exp.compute_visual_feats import (
        compute_visual_feats,
    )
    from mcncrossmodalemotions_tpu.data.external import build_synthetic_track_imdb

    model, variables = tiny_teacher_pipeline
    imdb = build_synthetic_track_imdb(tmp_path / "rml", tracks_per_class=1,
                                      with_frames=True)
    logits = compute_visual_feats(imdb, model=model, variables=variables,
                                  batch_size=4, verbose=False)
    assert len(logits) == imdb.num_tracks
    for track_frames, track_logits in zip(imdb.frame_paths, logits):
        assert track_logits.shape == (len(track_frames), 8)


def test_compute_visual_feats_clobber(tmp_path):
    """clobber recomputes past an existing cache + discards stale
    partials (compute_visual_feats.m:5)."""
    from mcncrossmodalemotions_tpu.data.external import build_synthetic_track_imdb
    from mcncrossmodalemotions_tpu.exp.compute_visual_feats import (
        compute_visual_feats,
    )

    imdb = build_synthetic_track_imdb(tmp_path / "rml", tracks_per_class=1,
                                      with_frames=True)
    feat_path = tmp_path / "vfeats.npz"
    a = compute_visual_feats(imdb, model_name="random", feat_path=str(feat_path))
    stale_partial = tmp_path / "vfeats.npz.partial.npz"
    stale_partial.write_bytes(b"junk")
    b = compute_visual_feats(imdb, model_name="random",
                             feat_path=str(feat_path), seed=123, clobber=True)
    assert not stale_partial.exists()
    assert any(not np.array_equal(x, y) for x, y in zip(a, b))
    c = compute_visual_feats(imdb, model_name="random", feat_path=str(feat_path))
    for x, y in zip(b, c):
        np.testing.assert_array_equal(x, y)


def test_fetch_emovoxceleb_imdb_build(tmp_path, tiny_teacher_pipeline):
    """Dense-inference imdb genesis: frames registered to wavs, per-wav
    logit matrices, frameless tracks dropped."""
    from mcncrossmodalemotions_tpu.data.audio import write_wav
    from mcncrossmodalemotions_tpu.data.images import save_synthetic_frame
    from mcncrossmodalemotions_tpu.exp.fetch_emovoxceleb_imdb import (
        fetch_emovoxceleb_imdb,
    )

    model, variables = tiny_teacher_pipeline
    root = tmp_path / "voxceleb"
    rng = np.random.RandomState(0)
    for s in range(2):
        for t in range(2):
            rel = f"spk{s}/track{t}"
            write_wav(root / "wavs" / (rel + ".wav"),
                      rng.randn(16000).astype(np.float32) * 0.2, 16000)
            if not (s == 1 and t == 1):  # leave one track frameless
                for k in range(2):
                    save_synthetic_frame(
                        root / "frames" / rel / f"{k:02d}.jpg", s * 2 + t)
    cache = tmp_path / "imdb.npz"
    imdb = fetch_emovoxceleb_imdb(root, model, variables,
                                  cache_path=str(cache), verbose=False)
    assert imdb.num_tracks == 3  # frameless track dropped
    assert imdb.wav_logits[0].shape == (2, 8)
    assert cache.exists()
    # second fetch hits the in-memory cache (same object)
    again = fetch_emovoxceleb_imdb(root, cache_path=str(cache))
    assert again is imdb


def test_visual_extractor_resume_from_partial(tmp_path, tiny_teacher_pipeline):
    """The dense pass resumes from a partial checkpoint and matches a
    clean run exactly."""
    from mcncrossmodalemotions_tpu.data.images import save_synthetic_frame
    from mcncrossmodalemotions_tpu.exp.compute_visual_feats import (
        VisualFeatureExtractor,
    )

    model, variables = tiny_teacher_pipeline
    paths = []
    for i in range(10):
        p = tmp_path / f"f{i:02d}.jpg"
        save_synthetic_frame(p, i % 4, seed=i)
        paths.append(str(p))
    ex = VisualFeatureExtractor(model, variables, batch_size=2)
    clean = ex.frame_logits(paths, verbose=False)

    # simulate an interrupted run: a valid partial checkpoint (correct
    # job fingerprint) holding the first 6 rows
    partial = tmp_path / "partial.npz"
    np.savez(partial, logits=clean[:6], key=ex._job_key(paths))
    resumed = ex.frame_logits(paths, verbose=False, partial_path=str(partial))
    np.testing.assert_allclose(resumed, clean, atol=1e-5)
    assert not partial.exists()  # cleaned up on completion

    # a stale checkpoint (different model/frame list -> different key)
    # must be ignored, not silently mixed in
    np.savez(partial, logits=np.full((6, 8), 99.0, np.float32), key="stale")
    restarted = ex.frame_logits(paths, verbose=False, partial_path=str(partial))
    np.testing.assert_allclose(restarted, clean, atol=1e-5)


def test_visual_extractor_with_mesh(tmp_path, tiny_teacher_pipeline):
    """Mesh-sharded inference == single-device inference."""
    from mcncrossmodalemotions_tpu.data.images import save_synthetic_frame
    from mcncrossmodalemotions_tpu.exp.compute_visual_feats import (
        VisualFeatureExtractor,
    )
    from mcncrossmodalemotions_tpu.parallel.mesh import make_mesh

    model, variables = tiny_teacher_pipeline
    paths = []
    for i in range(8):
        p = tmp_path / f"m{i:02d}.jpg"
        save_synthetic_frame(p, i % 3, seed=i)
        paths.append(str(p))
    single = VisualFeatureExtractor(model, variables, batch_size=8)
    sharded = VisualFeatureExtractor(model, variables, batch_size=8,
                                     mesh=make_mesh())
    a = single.frame_logits(paths, verbose=False)
    b = sharded.frame_logits(paths, verbose=False)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_uniform_track_cache_roundtrip(tmp_path):
    """Uniformly-shaped [1, C] per-track logits must survive the npz
    cache as float arrays: np.asarray(dtype=object) used to collapse
    them into an (N, 1, C) object ndarray whose rows broke np.exp in
    student_stats (reproduced crash)."""
    import numpy as np

    from mcncrossmodalemotions_tpu.data.imdb import (
        TrackImdb,
        float_tracks,
        object_array,
    )

    rows = [np.full((1, 8), i, np.float32) for i in range(5)]
    arr = object_array(rows)
    assert arr.shape == (5,) and arr.dtype == object
    assert arr[3].dtype == np.float32

    # through the TrackImdb npz round-trip
    imdb = TrackImdb(track_ids=np.arange(5).astype(str),
                     labels=np.zeros(5, np.int32),
                     set_id=np.ones(5, np.int32),
                     logits=rows)
    p = tmp_path / "ti.npz"
    imdb.save(p)
    back = TrackImdb.load(p)
    assert back.logits[2].dtype == np.float32
    np.testing.assert_array_equal(back.logits[2], rows[2])
    # softmax over the concatenation works (the crash site)
    from mcncrossmodalemotions_tpu.exp.student_stats import softmax_np

    s = softmax_np(np.concatenate(back.logits), axis=1)
    assert np.isfinite(s).all()

    # legacy collapsed caches (old writer) still load as float rows
    legacy = tmp_path / "legacy.npz"
    np.savez(legacy, logits=np.asarray(rows, dtype=object))
    fixed = float_tracks(np.load(legacy, allow_pickle=True)["logits"])
    assert fixed[1].dtype == np.float32
    np.testing.assert_array_equal(fixed[1], rows[1])


def test_visual_partial_key_includes_input_size(tmp_path):
    """A dense-pass partial checkpoint is invalid across input_size
    changes (every logit depends on the decode resolution)."""
    from mcncrossmodalemotions_tpu.exp.compute_visual_feats import (
        VisualFeatureExtractor,
    )

    class Dummy:
        def apply(self, v, x, train=False):
            return x

    a = VisualFeatureExtractor(Dummy(), {"w": np.zeros(1)}, input_size=224)
    b = VisualFeatureExtractor(Dummy(), {"w": np.zeros(1)}, input_size=112)
    paths = ["x/1.jpg", "x/2.jpg"]
    assert a._job_key(paths) != b._job_key(paths)


def test_feat_cache_identity_checks(tmp_path):
    """The finished feature cache must not be silently returned across
    models or imdb sizes, and limit= dev runs must never write it."""
    import pytest

    from mcncrossmodalemotions_tpu.data.emovox import build_synthetic_imdb
    from mcncrossmodalemotions_tpu.exp.compute_audio_feats import (
        compute_audio_feats,
    )

    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=2,
                                tracks_per_speaker=2, seed=0,
                                duration_range=(1.0, 1.5))
    p = tmp_path / "feats.npz"

    # limit= runs are never cached
    out = compute_audio_feats(imdb, model_name="random", limit=2,
                              feat_path=str(p), verbose=False)
    assert len(out) == 2 and not p.exists()

    # a full random-baseline run caches with its model identity...
    full = compute_audio_feats(imdb, model_name="random",
                               feat_path=str(p), verbose=False)
    assert len(full) == 4 and p.exists()
    # ...and a different model must refuse the poisoned cache
    with pytest.raises(ValueError, match="random"):
        compute_audio_feats(imdb, model_name="emovoxceleb-student",
                            feat_path=str(p), verbose=False)

    # same model: cache hit returns the same rows
    again = compute_audio_feats(imdb, model_name="random",
                                feat_path=str(p), verbose=False)
    np.testing.assert_array_equal(np.concatenate(again),
                                  np.concatenate(full))

    # wrong track count (stale cache for a different imdb) raises
    bigger = build_synthetic_imdb(tmp_path / "wavs2", num_speakers=2,
                                  tracks_per_speaker=3, seed=1,
                                  duration_range=(1.0, 1.5))
    with pytest.raises(ValueError, match="stale cache"):
        compute_audio_feats(bigger, model_name="random",
                            feat_path=str(p), verbose=False)

    # limit= never READS the cache either (ADVICE r3): a dev-limited call
    # against the full cache must return `limit` tracks, not all of them
    limited = compute_audio_feats(imdb, model_name="random", limit=2,
                                  feat_path=str(p), verbose=False)
    assert len(limited) == 2

    # legacy cache (no model_name key) with a mismatched count is
    # recomputed + rewritten rather than crashing
    from mcncrossmodalemotions_tpu.data.imdb import object_array

    np.savez_compressed(p, logits=object_array(full[:2]))
    relegacy = compute_audio_feats(imdb, model_name="random",
                                   feat_path=str(p), verbose=False)
    assert len(relegacy) == 4


def test_visual_extractor_max_frames_bound(tmp_path, tiny_teacher_pipeline):
    """max_frames= bounds a single call to whole batches, flushes the
    partial, returns None; a follow-up unbounded call completes to the
    exact clean-run result (the dense_chunked worker primitive)."""
    from mcncrossmodalemotions_tpu.data.images import save_synthetic_frame
    from mcncrossmodalemotions_tpu.exp.compute_visual_feats import (
        VisualFeatureExtractor,
    )

    model, variables = tiny_teacher_pipeline
    paths = []
    for i in range(10):
        p = tmp_path / f"f{i:02d}.jpg"
        save_synthetic_frame(p, i % 4, seed=i)
        paths.append(str(p))
    ex = VisualFeatureExtractor(model, variables, batch_size=2)
    clean = ex.frame_logits(paths, verbose=False)

    partial = tmp_path / "partial.npz"
    with pytest.raises(ValueError, match="partial_path"):
        ex.frame_logits(paths, verbose=False, max_frames=4)
    out = ex.frame_logits(paths, verbose=False, partial_path=str(partial),
                          max_frames=4)
    assert out is None
    data = np.load(partial, allow_pickle=False)
    assert data["logits"].shape == (4, 8)  # two whole batches
    # max_frames below one batch still progresses by one batch
    out = ex.frame_logits(paths, verbose=False, partial_path=str(partial),
                          max_frames=1)
    assert out is None
    assert np.load(partial, allow_pickle=False)["logits"].shape[0] == 6
    done = ex.frame_logits(paths, verbose=False, partial_path=str(partial))
    np.testing.assert_array_equal(done, clean)
    assert not partial.exists()


def test_chunked_frame_logits_subprocess(tmp_path):
    """The productised worker-cycling supervisor (exp/dense_chunked.py,
    round-4 VERDICT next #3): bounded subprocess workers over the shared
    partial checkpoint reproduce the in-process result exactly, across
    more than one worker cycle."""

    from mcncrossmodalemotions_tpu.data.images import save_synthetic_frame
    from mcncrossmodalemotions_tpu.exp.compute_visual_feats import (
        VisualFeatureExtractor,
    )
    from mcncrossmodalemotions_tpu.exp.dense_chunked import (
        build_worker_model,
        chunked_frame_logits,
    )

    spec = {"teacher": {"name": "senet50-ferplus", "tiny": True},
            "input_size": 48}
    model, _ = build_worker_model(spec)  # same constructor as the worker
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1), jnp.uint8),
                           train=False)
    paths = []
    for i in range(12):
        p = tmp_path / f"f{i:02d}.jpg"
        save_synthetic_frame(p, i % 4, seed=i)
        paths.append(str(p))
    ex = VisualFeatureExtractor(model, variables, batch_size=2,
                                input_size=48)
    clean = ex.frame_logits(paths, verbose=False)

    # match the conftest runtime EXACTLY via worker_jax_config (config
    # updates, not env vars): env-var platform selection eager-inits a
    # differently-threaded client whose bf16 reduction order measurably
    # differs from the config path — equality requires the same route
    partial = tmp_path / "dense.partial.npz"
    out = chunked_frame_logits(
        spec, variables, paths, str(partial),
        chunk_frames=6, batch_size=2, input_size=48, verbose=False,
        worker_jax_config={"jax_platforms": "cpu",
                           "jax_num_cpu_devices": 8})
    np.testing.assert_array_equal(out, clean)
    assert not partial.exists()
    assert not partial.with_suffix(".job").exists()
