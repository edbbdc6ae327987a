"""C++ data service vs pure-Python reference implementations."""

import numpy as np
import pytest

from mcncrossmodalemotions_tpu.data import native
from mcncrossmodalemotions_tpu.data.audio import read_wav as py_read_wav
from mcncrossmodalemotions_tpu.data.audio import write_wav
from mcncrossmodalemotions_tpu.data.images import load_face_frame, save_synthetic_frame

needs_native = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


@needs_native
def test_native_wav_info(tmp_path, rng):
    path = tmp_path / "a.wav"
    write_wav(path, rng.randn(12345).astype(np.float32) * 0.3, 16000)
    n, rate, channels, bits = native.wav_info(str(path))
    assert (n, rate, channels, bits) == (12345, 16000, 1, 16)


@needs_native
def test_native_read_matches_python(tmp_path, rng):
    path = tmp_path / "b.wav"
    write_wav(path, rng.randn(20000).astype(np.float32) * 0.3, 16000)
    py, _ = py_read_wav(path, 500, 4000)
    nat, rate = native.read_wav(str(path), 500, 4000)
    assert rate == 16000
    np.testing.assert_allclose(nat, py, atol=1e-7)


@needs_native
def test_native_batched_crops_and_padding(tmp_path, rng):
    paths, starts = [], []
    for i, n in enumerate([30000, 5000]):  # second file shorter than crop
        p = tmp_path / f"c{i}.wav"
        write_wav(p, rng.randn(n).astype(np.float32) * 0.3, 16000)
        paths.append(str(p))
        starts.append(100 * i)
    out = native.read_crops(paths, starts, 8000, num_threads=4)
    assert out.shape == (2, 8000)
    ref0, _ = py_read_wav(paths[0], 0, 8000)
    np.testing.assert_allclose(out[0], ref0, atol=1e-7)
    # short file: valid prefix then zero padding
    ref1, _ = py_read_wav(paths[1], 100, 4900)
    np.testing.assert_allclose(out[1, :4900], ref1, atol=1e-7)
    assert np.all(out[1, 4900:] == 0)


@needs_native
def test_native_jpeg_decode_matches_pil(tmp_path):
    path = tmp_path / "face.jpg"
    save_synthetic_frame(path, pattern_id=2, size=96)
    ref = load_face_frame(path, out_size=48)
    got = native.decode_faces([str(path)], out_size=48, num_threads=2)[0]
    assert got.shape == ref.shape == (48, 48, 1)
    # Same sampling convention -> agreement to interpolation rounding.
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max abs diff {diff.max()}"


def test_face_crop_is_output_aspect_square(tmp_path):
    """vl_imreadjpeg CropSize semantics: the crop is the largest
    OUTPUT-aspect (square) region scaled by the ratio — side
    crop_ratio*min(h, w), centered — NOT an anisotropic (w*r, h*r) box
    (fetch_emovoxceleb_imdb.m:169; compute_visual_feats.m:123-143 uses
    the default ratio 1.0)."""
    from PIL import Image

    # gradient image: column index in the red channel scaled to 0..255
    w, h = 120, 80
    col = np.tile(np.arange(w, dtype=np.float64)[None, :], (h, 1))
    rgb = np.stack([col * 255 / (w - 1)] * 3, axis=-1).astype(np.uint8)
    src = tmp_path / "grad.png"  # png: lossless, exact column values
    Image.fromarray(rgb).save(src)
    out = load_face_frame(src, out_size=40, crop_ratio=1.0)
    # ratio 1.0 on a 120x80 image crops the centered 80x80 square:
    # columns 20..99 -> gray values span that range, not the full width
    lo, hi = 20 * 255 / (w - 1), 99 * 255 / (w - 1)
    assert abs(float(out[0, 0, 0]) - lo) <= 2
    assert abs(float(out[0, -1, 0]) - hi) <= 2
    # and the 1/1.6 ratio crops side round(80/1.6) = 50: columns 35..84
    out2 = load_face_frame(src, out_size=40, crop_ratio=1 / 1.6)
    lo2, hi2 = 35 * 255 / (w - 1), 84 * 255 / (w - 1)
    assert abs(float(out2[0, 0, 0]) - lo2) <= 2
    assert abs(float(out2[0, -1, 0]) - hi2) <= 2


@needs_native
def test_native_jpeg_decode_matches_pil_nonsquare(tmp_path):
    """Python and C++ paths agree on NON-square sources for both the
    EmoVoxCeleb (1/1.6) and external (1.0) crop ratios."""
    from PIL import Image

    rng = np.random.RandomState(0)
    img = (rng.rand(80, 120, 3) * 255).astype(np.uint8)
    path = tmp_path / "ns.jpg"
    Image.fromarray(img).save(path, quality=95)
    for ratio in (1 / 1.6, 1.0):
        ref = load_face_frame(path, out_size=48, crop_ratio=ratio)
        got = native.decode_faces([str(path)], out_size=48,
                                  crop_ratio=ratio, num_threads=2)[0]
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 1, f"ratio {ratio}: max abs diff {diff.max()}"


def test_visual_extractor_crop_defaults():
    """External feature extraction uses CropSize 1.0 (the reference
    passes no CropSize for external faces); the EmoVoxCeleb dense build
    pins 1/1.6. Defaults checked so a refactor can't silently swap
    them."""
    import inspect

    from mcncrossmodalemotions_tpu.exp.compute_visual_feats import (
        VisualFeatureExtractor,
        compute_visual_feats,
    )

    assert VisualFeatureExtractor.__dataclass_fields__[
        "crop_ratio"].default == 1.0
    assert (inspect.signature(compute_visual_feats)
            .parameters["crop_ratio"].default == 1.0)
    import mcncrossmodalemotions_tpu.exp.fetch_emovoxceleb_imdb as fei

    assert "crop_ratio=1.0 / 1.6" in inspect.getsource(fei)


@needs_native
def test_native_missing_file_errors(tmp_path):
    with pytest.raises(IOError):
        native.read_crops([str(tmp_path / "nope.wav")], [0], 100)
    with pytest.raises(IOError):
        native.decode_faces([str(tmp_path / "nope.jpg")], out_size=32)


@needs_native
def test_batcher_native_path_matches_python(tmp_path):
    """The C++ fast path and the pure-Python loader must produce identical
    batches for the same epoch RNG (no augmentation)."""
    from mcncrossmodalemotions_tpu.data import native as native_mod
    from mcncrossmodalemotions_tpu.data.emovox import (
        BatchConfig,
        EmoVoxBatcher,
        build_synthetic_imdb,
    )

    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=2,
                                tracks_per_speaker=3)
    cfg = BatchConfig(batch_size=3)
    batcher = EmoVoxBatcher(imdb, cfg, train=True, seed=7)
    native_batches = list(batcher.batches(epoch=2))
    assert native_mod.available()
    # force the python path by monkeypatching availability
    orig = native_mod.available
    native_mod.available = lambda: False
    try:
        py_batches = list(batcher.batches(epoch=2))
    finally:
        native_mod.available = orig
    assert len(native_batches) == len(py_batches)
    for nb, pb in zip(native_batches, py_batches):
        np.testing.assert_allclose(nb["data"], pb["data"], atol=1e-7)
        np.testing.assert_array_equal(nb["max_label"], pb["max_label"])
        np.testing.assert_allclose(nb["logit_target"], pb["logit_target"])


@needs_native
def test_native_packed_reads_bit_exact(tmp_path, rng):
    """Fused read+quantise (ds_read_crops_packed) must equal reading
    floats and packing in Python BIT FOR BIT — same to-nearest-even
    rounding, same 64K lin->ulaw table, fp32 division by the peak."""
    from mcncrossmodalemotions_tpu.data.audio import pack_mulaw8, pack_pcm16

    if not native.packed_reads_available():
        pytest.skip("native library predates packed reads")
    paths, starts = [], []
    for i in range(6):
        p = tmp_path / f"p{i}.wav"
        write_wav(p, rng.randn(20000).astype(np.float32) * 0.4, 16000)
        paths.append(str(p))
        starts.append(137 * i)
    need = 8000  # includes zero-padded tails for late starts
    ref = native.read_crops(paths, starts, need)
    got16 = native.read_crops_packed(paths, starts, need, "int16")
    assert got16.dtype == np.int16
    np.testing.assert_array_equal(got16, pack_pcm16(ref))
    got8 = native.read_crops_packed(paths, starts, need, "mulaw8")
    assert got8.dtype == np.uint8
    np.testing.assert_array_equal(got8, pack_mulaw8(ref))


@needs_native
def test_batcher_native_packed_mulaw_matches_python(tmp_path):
    """EmoVoxBatcher's native fast path with the mu-law feed must equal
    the pure-Python path exactly (same RNG stream, same bytes)."""
    from mcncrossmodalemotions_tpu.data import native as native_mod
    from mcncrossmodalemotions_tpu.data.emovox import (
        BatchConfig,
        EmoVoxBatcher,
        build_synthetic_imdb,
    )

    if not native.packed_reads_available():
        pytest.skip("native library predates packed reads")
    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=2,
                                tracks_per_speaker=3)
    cfg = BatchConfig(batch_size=3, emit_mulaw=True)
    batcher = EmoVoxBatcher(imdb, cfg, train=True, seed=7)
    native_batches = list(batcher.batches(epoch=2))
    assert native_batches[0]["data"].dtype == np.uint8
    orig = native_mod.available
    native_mod.available = lambda: False
    try:
        py_batches = list(batcher.batches(epoch=2))
    finally:
        native_mod.available = orig
    for nb, pb in zip(native_batches, py_batches):
        np.testing.assert_array_equal(nb["data"], pb["data"])
        np.testing.assert_array_equal(nb["max_label"], pb["max_label"])


@needs_native
def test_native_corrupt_jpeg_fails_cleanly(tmp_path):
    """A corrupt JPEG must fail the decode, not kill the process
    (libjpeg's default error handler calls exit())."""
    good = tmp_path / "good.jpg"
    save_synthetic_frame(good, 1, size=32)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(good.read_bytes()[:40])  # truncated header
    with pytest.raises(IOError):
        native.decode_faces([str(bad)], out_size=32)
    # and the process is still healthy: good file decodes afterwards
    out = native.decode_faces([str(good)], out_size=32)
    assert out.shape == (1, 32, 32, 1)


@needs_native
def test_native_concurrent_callers(tmp_path, rng):
    """The global C++ thread pool must serve concurrent Python callers
    without races (decode + wav reads hammered from 4 threads)."""
    from concurrent.futures import ThreadPoolExecutor

    wavs, jpgs = [], []
    for i in range(6):
        w = tmp_path / f"w{i}.wav"
        write_wav(w, rng.randn(12000).astype(np.float32) * 0.3, 16000)
        wavs.append(str(w))
        j = tmp_path / f"j{i}.jpg"
        save_synthetic_frame(j, i % 3, size=40, seed=i)
        jpgs.append(str(j))
    expected_wav = native.read_crops(wavs, [0] * 6, 4000)
    expected_jpg = native.decode_faces(jpgs, out_size=32)

    def hammer(k):
        for _ in range(10):
            got_w = native.read_crops(wavs, [0] * 6, 4000, num_threads=4)
            np.testing.assert_array_equal(got_w, expected_wav)
            got_j = native.decode_faces(jpgs, out_size=32, num_threads=4)
            np.testing.assert_array_equal(got_j, expected_jpg)
        return k

    with ThreadPoolExecutor(max_workers=4) as pool:
        assert sorted(pool.map(hammer, range(4))) == [0, 1, 2, 3]


@needs_native
def test_batcher_mixed_rate_per_file_fallback(tmp_path):
    """One off-rate (32 kHz) file must NOT poison the batch's fast path:
    only that file takes the python resample fallback, the rest stay
    native, and the result matches the all-python path exactly (the RNG
    stream stays aligned: one draw per sample on both paths)."""
    from pathlib import Path

    from mcncrossmodalemotions_tpu.data import native as native_mod
    from mcncrossmodalemotions_tpu.data.audio import write_wav
    from mcncrossmodalemotions_tpu.data.emovox import (
        BatchConfig,
        EmoVoxBatcher,
        build_synthetic_imdb,
    )

    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=2,
                                tracks_per_speaker=3)
    # rewrite one file at 32 kHz (same duration, so logits stay aligned)
    off_idx = 1
    path = Path(imdb.wav_dir) / imdb.wav_paths[off_idx]
    duration = 6.0
    rng_local = np.random.RandomState(3)
    n = int(duration * 32000)
    tt = np.arange(n) / 32000.0
    wave = (0.5 * np.sin(2 * np.pi * 500.0 * tt)
            + 0.05 * rng_local.randn(n)).astype(np.float32)
    write_wav(path, wave, 32000)

    for train in (False, True):
        cfg = BatchConfig(batch_size=3)
        batcher = EmoVoxBatcher(imdb, cfg, train=train, seed=11)
        native_batches = list(batcher.batches(epoch=1))
        orig = native_mod.available
        native_mod.available = lambda: False
        try:
            py_batches = list(batcher.batches(epoch=1))
        finally:
            native_mod.available = orig
        assert len(native_batches) == len(py_batches) == 2
        for nb, pb in zip(native_batches, py_batches):
            np.testing.assert_allclose(nb["data"], pb["data"], atol=1e-7)
            np.testing.assert_array_equal(nb["max_label"], pb["max_label"])


@needs_native
def test_native_corrupt_wav_fails_cleanly(tmp_path, rng):
    """Truncated/bogus wav files must fail the read (clean IOError via
    the failure count), not crash or return garbage silently."""
    good = tmp_path / "good.wav"
    write_wav(good, rng.randn(20000).astype(np.float32) * 0.3, 16000)
    # truncated header
    trunc = tmp_path / "trunc.wav"
    trunc.write_bytes(good.read_bytes()[:20])
    # right magic, garbage chunks
    bogus = tmp_path / "bogus.wav"
    bogus.write_bytes(b"RIFF" + b"\xff" * 60)
    for bad in (trunc, bogus):
        with pytest.raises(IOError):
            native.read_crops([str(bad)], [0], 1000)
        if native.packed_reads_available():
            with pytest.raises(IOError):
                native.read_crops_packed([str(bad)], [0], 1000, "int16")
    # a mixed batch raises (failure count), and the service stays
    # healthy: the good file still reads correctly afterwards
    with pytest.raises(IOError):
        native.read_crops([str(good), str(trunc)], [0, 0], 1000)
    ref, _ = py_read_wav(good, 0, 1000)
    out = native.read_crops([str(good)], [0], 1000)
    np.testing.assert_allclose(out[0], ref, atol=1e-7)


def test_python_corrupt_wav_fails_cleanly(tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFF" + b"\x00" * 8)  # written BEFORE raises: only
    # the reader under test may satisfy the expectation
    with pytest.raises((ValueError, IOError, EOFError)):
        py_read_wav(bad, 0, 100)


def _write_stereo_wav(path, left, right, rate=16000):
    import struct

    import numpy as np

    frames = np.stack([left, right], axis=1)
    pcm = np.clip(np.round(frames * 32768.0), -32768, 32767).astype("<i2")
    payload = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 2, rate, rate * 4, 4, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)


def test_stereo_reads_take_left_channel(tmp_path):
    """Stereo wavs must yield the LEFT stream, matching the reference
    (compute_audio_feats.m:176 ``z = z(:,1)``) — in BOTH readers."""
    rng = np.random.RandomState(7)
    left = (rng.rand(4000).astype(np.float32) - 0.5) * 0.9
    right = (rng.rand(4000).astype(np.float32) - 0.5) * 0.9
    path = tmp_path / "stereo.wav"
    _write_stereo_wav(path, left, right)
    got, fs = py_read_wav(path, 100, 2000)
    assert fs == 16000
    # quantisation only — not a (L+R)/2 downmix
    np.testing.assert_allclose(got, left[100:2100], atol=1.0 / 32768)
    if native.available():
        n, rate, channels, bits = native.wav_info(str(path))
        assert channels == 2 and n == 4000
        nat = native.read_crops([str(path)], [100], 2000)[0]
        np.testing.assert_allclose(nat, got, atol=1e-7)


def _write_pcm24_wav(path, num_frames=1000, rate=16000):
    import struct

    payload = b"\x00\x01\x02" * num_frames  # 24-bit mono frames
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 3, 3, 24))
        f.write(b"data")
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)


def test_unsupported_bit_depth_errors_in_both_readers(tmp_path):
    """24-bit PCM is outside both readers' decode support: the Python
    reader raises ValueError, and the C++ reader must ERROR the same
    way (failure count), not silently return all-zero 'silence'."""
    path = tmp_path / "pcm24.wav"
    _write_pcm24_wav(path)
    with pytest.raises(ValueError):
        py_read_wav(path, 0, 100)
    if native.available():
        with pytest.raises(IOError):
            native.read_crops([str(path)], [0], 100)
        if native.packed_reads_available():
            with pytest.raises(IOError):
                native.read_crops_packed([str(path)], [0], 100, "int16")


def test_corrupt_fmt_chunk_size_fails_not_terminates(tmp_path):
    """A fmt chunk whose size field claims ~4 GB must fail the parse in
    bounded time — not attempt the allocation (bad_alloc escaping a
    loader thread would std::terminate the process)."""
    import struct

    path = tmp_path / "hugefmt.wav"
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 100))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<I", 0xFFFFFFF0))  # corrupt fmt size
        f.write(b"\x00" * 64)
    with pytest.raises((ValueError, IOError, EOFError, Exception)):
        py_read_wav(path, 0, 100)
    if native.available():
        with pytest.raises(IOError):
            native.read_crops([str(path)], [0], 100)


@needs_native
def test_thread_pool_grows_beyond_first_call(tmp_path, rng):
    """The global pool must honour a LARGER num_threads on later calls
    (the first caller's count used to pin it for the process)."""
    wavs = []
    for i in range(12):
        p = tmp_path / f"t{i}.wav"
        write_wav(p, rng.randn(4000).astype(np.float32) * 0.3, 16000)
        wavs.append(str(p))
    # first call with 1 thread, then a wider call: both must complete
    # correctly (correctness check; the growth itself is observable only
    # through timing, which is not assertable on a 1-core CI box)
    a = native.read_crops(wavs, [0] * 12, 2000, num_threads=1)
    b = native.read_crops(wavs, [0] * 12, 2000, num_threads=8)
    np.testing.assert_array_equal(a, b)
