"""Distillation training throughput benchmark (the BASELINE.json metric).

Headline (the ONE stdout JSON line): steady-state utts/sec/chip of the
full student distillation train step — on-device spectrogram frontend +
VGG-M forward + backward + SGD update, 4 s crops, batch 128 (the
run_distillation.m defaults scaled to chip saturation) — on whatever
accelerator is visible (the driver runs this on one real TPU chip).

``vs_baseline`` is utts/sec divided by an **estimate** of the reference
MatConvNet-GPU pipeline's throughput (60 utts/sec): the reference
publishes no wall-clock numbers at all (SURVEY.md section 6 /
BASELINE.md), so there is nothing measured to divide by. The estimate
comes from the reference's serial per-sample CPU wav-decode + MATLAB
spectrogram hot loop (~15 ms/sample class of hardware,
getBatchEmoVoxCeleb.m hot loop, SURVEY.md section 3.1). Treat the ratio
as vs-estimate, not vs-measurement.

The headline reuses an on-device batch, i.e. it reports the chip's
compute throughput with the host feed fully overlapped — what the
training engine's double-buffered prefetch + int16 waveform shipping
achieve on PCIe-attached hosts. The END-TO-END number (synthetic
on-disk imdb -> native threaded loader -> prefetch -> train step) is
measured separately and reported in bench_details.json; on this dev
environment the host link is a ~33 MB/s network tunnel, which caps the
feed at ~250 utts/s regardless of design — an artifact of the tunnel,
not the pipeline.

Usage:
    python bench.py              # headline + MFU + details file
    python bench.py --full       # + end-to-end epoch, teacher, fused,
                                 #   audio-feats sub-benchmarks
    python bench.py --quick      # headline only
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

MATCONVNET_BASELINE_UTTS_PER_SEC = 60.0  # ESTIMATE — see module docstring

# bf16 peak of the chip kinds we may land on (MXU TFLOPS)
_PEAK_TFLOPS = {
    "TPU v5 lite": 197.0, "TPU v5e": 197.0,
    "TPU v4": 275.0, "TPU v6 lite": 918.0, "TPU v6e": 918.0,
}


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _sync(x) -> float:
    """The ONLY reliable device sync on this runtime: device_get a value
    that depends on the computation (block_until_ready returns without
    waiting under the axon-tunnelled TPU backend)."""
    import jax

    return float(np.asarray(jax.device_get(x)).ravel()[0])


def _best_of(fn, sync, iters=20, reps=3):
    """Best steady-state window (the tunnelled runtime shows ~10%
    run-to-run jitter unrelated to the program)."""
    fn()
    sync()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        sync()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_train_step(details: dict):
    """Headline: full distillation train step, on-device batch."""
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.ops.spectrogram import DEFAULT_SPEC
    from mcncrossmodalemotions_tpu.train.state import (
        SGDConfig,
        TrainState,
        make_train_step,
    )
    from mcncrossmodalemotions_tpu.zoo import build_student, student_loss_fn

    batch_size = 128  # throughput saturates at bs>=128 on one v5e chip
    crop = DEFAULT_SPEC.crop_samples(400)  # 4 s = 64,384 samples
    rng = np.random.RandomState(0)
    batch = {
        "data": jnp.asarray(rng.randn(batch_size, crop).astype(np.float32)),
        "logit_target": jnp.asarray(
            rng.randn(batch_size, 8).astype(np.float32) * 2),
        "max_label": jnp.asarray(rng.randint(0, 8, batch_size)),
    }
    model = build_student("emovoxceleb-student")
    variables = model.init(jax.random.PRNGKey(0), batch["data"][:1])
    state = TrainState.create(variables, jax.random.PRNGKey(1))
    loss_fn = student_loss_fn("hot-cross-ent", temperature=2.0)
    step_fn = make_train_step(model.apply, loss_fn,
                              SGDConfig(weight_decay=0.0))
    step = jax.jit(step_fn, donate_argnums=(0,))

    # analytic FLOPs from the compiled program (for the MFU estimate).
    # The timing loop calls the AOT `compiled` executable directly:
    # lower().compile() does NOT populate jit's dispatch cache, so
    # calling `step(...)` afterwards would re-trace and (without the
    # persistent compilation cache) pay the ~3 min XLA compile twice.
    flops = None
    compiled = None
    try:
        compiled = step.lower(state, batch, 1e-4).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as exc:  # cost analysis is backend-dependent
        _log(f"cost_analysis unavailable: {exc}")

    call = compiled if compiled is not None else step
    st = [state]
    metrics_box = [None]

    def run():
        s, m = call(st[0], batch, 1e-4)
        st[0] = s
        metrics_box[0] = m

    sec = _best_of(run, lambda: _sync(metrics_box[0]["loss"]))
    utts = batch_size / sec
    details["train_step_ms"] = round(sec * 1000, 3)
    details["train_step_utts_per_sec"] = round(utts, 2)
    if flops:
        kind = jax.devices()[0].device_kind
        peak = _PEAK_TFLOPS.get(kind)
        details["train_step_flops"] = flops
        details["achieved_tflops"] = round(flops / sec / 1e12, 2)
        if peak:
            details["device_kind"] = kind
            details["mfu_estimate"] = round(flops / sec / 1e12 / peak, 4)
            _log(f"MFU: {details['mfu_estimate']:.1%} "
                 f"({details['achieved_tflops']} TFLOPS of {peak} peak "
                 f"bf16 on {kind})")
    return utts


def _e2e_epoch_worker(emit_mulaw: bool) -> dict:
    """One feed format's end-to-end epoch measurement (runs in a FRESH
    subprocess: measured back-to-back in one process, the second config
    is systematically ~2x slower — accumulated process/runtime state on
    the tunnelled backend — which inverted the real ordering)."""
    import tempfile

    from mcncrossmodalemotions_tpu.data.emovox import (
        BatchConfig,
        EmoVoxBatcher,
        build_synthetic_imdb,
    )
    from mcncrossmodalemotions_tpu.train.engine import TrainConfig, Trainer
    from mcncrossmodalemotions_tpu.zoo import build_student, student_loss_fn

    root = Path(tempfile.mkdtemp(prefix="bench_e2e_"))
    imdb = build_synthetic_imdb(root / "wavs", num_speakers=8,
                                tracks_per_speaker=64,
                                duration_range=(4.2, 6.0))
    cfg = BatchConfig(batch_size=64, emit_mulaw=emit_mulaw)
    batcher = EmoVoxBatcher(imdb, cfg, train=True, seed=0)
    model = build_student("emovoxceleb-student")
    trainer = Trainer(
        model, student_loss_fn("hot-cross-ent", temperature=2.0),
        TrainConfig(num_epochs=3, learning_rate=1e-4, weight_decay=0.0,
                    log_every=10_000, resume=False,
                    exp_dir=str(root / "exp")))
    example = next(iter(
        batcher.batches(epoch=1, epoch_size=cfg.batch_size)))
    state = trainer.init_state(example)
    # epoch 1 warms the compile; epochs 2-3 measure (best of two — the
    # tunnelled dev link shows large run-to-run jitter; 512 samples =
    # 8 batches per epoch keeps a single straggler from dominating)
    state, _ = trainer.run_epoch(state, batcher.batches(epoch=1), 1, True)
    best = None
    for ep in (2, 3):
        state, stats = trainer.run_epoch(state, batcher.batches(epoch=ep),
                                         ep, True)
        if best is None or stats["samples_per_sec"] > best["samples_per_sec"]:
            best = stats
    # bytes the host must ship per utterance for THIS feed format (the
    # denominator that makes the metric comparable across tunnel health)
    feed_bytes = sum(np.asarray(leaf).nbytes
                     for leaf in __import__("jax").tree.leaves(example))
    return {"utts_per_sec": round(best["samples_per_sec"], 2),
            "num_samples": best["num_samples"],
            "feed_bound_frac": best.get("feed_bound_frac"),
            "feed_bytes_per_utt": int(feed_bytes / cfg.batch_size)}


def _online_epoch_worker() -> dict:
    """End-to-end FUSED online-distillation epoch (fresh subprocess):
    on-disk wavs + face-frame JPEGs -> batcher emitting waveforms AND
    [B, K, 224, 224, 1] uint8 frames -> Trainer.fit epochs whose train
    step is make_online_distill_step (frozen SENet50 forward + student
    fwd/bwd/update in ONE XLA program). This is the north star's
    co-scheduling claim measured at epoch level, host feed included —
    the microbench (bench_fused_online) measures the same program on an
    on-device batch. K=2 matches the microbench; the frames add
    2*224^2 = 100,352 B/utt to the feed, which is what decides
    fused-online vs offline-cached-logits on link-bound rigs (study in
    docs/PERF.md)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.data.emovox import (
        BatchConfig,
        EmoVoxBatcher,
        build_synthetic_imdb,
    )
    from mcncrossmodalemotions_tpu.models.teacher_pipeline import (
        FaceTeacherPipeline,
    )
    from mcncrossmodalemotions_tpu.train.distill import (
        make_online_distill_step,
    )
    from mcncrossmodalemotions_tpu.train.engine import TrainConfig, Trainer
    from mcncrossmodalemotions_tpu.train.state import SGDConfig
    from mcncrossmodalemotions_tpu.zoo import (
        build_student,
        build_teacher,
        student_loss_fn,
    )

    root = Path(tempfile.mkdtemp(prefix="bench_online_"))
    imdb = build_synthetic_imdb(root / "wavs", num_speakers=8,
                                tracks_per_speaker=64,
                                duration_range=(4.2, 6.0),
                                with_frames=True)
    cfg = BatchConfig(batch_size=64, frames_per_crop=2, frame_size=224)
    batcher = EmoVoxBatcher(imdb, cfg, train=True, seed=0)
    student = build_student("emovoxceleb-student")
    pipeline = FaceTeacherPipeline(
        teacher=build_teacher("senet50-ferplus"), augment=False)
    # jitted init: op-by-op SENet50 init costs minutes of round trips on
    # the tunnelled runtime (tools/soak_dense_genesis.py lesson)
    tvars = jax.jit(lambda: pipeline.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 224, 224, 1), jnp.uint8),
        train=False))()
    step = make_online_distill_step(
        student.apply, pipeline.apply, tvars,
        sgd=SGDConfig(weight_decay=0.0), pass_pad_mask=True)
    trainer = Trainer(
        student, student_loss_fn("hot-cross-ent", temperature=2.0),
        TrainConfig(num_epochs=3, learning_rate=1e-4, weight_decay=0.0,
                    log_every=10_000, resume=False,
                    exp_dir=str(root / "exp")),
        train_step_override=step)
    example = next(iter(
        batcher.batches(epoch=1, epoch_size=cfg.batch_size)))
    state = trainer.init_state(example)
    state, _ = trainer.run_epoch(state, batcher.batches(epoch=1), 1, True)
    best = None
    for ep in (2, 3):
        state, stats = trainer.run_epoch(state, batcher.batches(epoch=ep),
                                         ep, True)
        if best is None or stats["samples_per_sec"] > best["samples_per_sec"]:
            best = stats
    feed_bytes = sum(np.asarray(leaf).nbytes
                     for leaf in jax.tree.leaves(example))
    return {"utts_per_sec": round(best["samples_per_sec"], 2),
            "num_samples": best["num_samples"],
            "feed_bound_frac": best.get("feed_bound_frac"),
            "frames_per_crop": cfg.frames_per_crop,
            "feed_bytes_per_utt": int(feed_bytes / cfg.batch_size)}


def bench_end_to_end_epoch(details: dict):
    """One epoch over a synthetic ON-DISK imdb: native threaded loader +
    compact feed + double-buffered prefetch + train step (utts/s incl.
    host). Measured for both offline feed formats — int16 PCM (default,
    lossless) and the opt-in mu-law uint8 (half the feed bytes again —
    the lever when the host link, not compute, binds) — plus the FUSED
    online-distillation epoch (waveforms + face frames feed, teacher
    in-graph), each in a fresh subprocess so none inherits another's
    process state."""
    import subprocess

    # key templates per worker flag ({m} = the measured field); the
    # int16/mulaw8 names predate the online worker and stay stable for
    # bench_history comparability
    keymaps = {
        "int16": {"utts_per_sec": "end_to_end_epoch_utts_per_sec",
                  "num_samples": "end_to_end_epoch_samples",
                  "feed_bound_frac": "end_to_end_feed_bound_frac",
                  "feed_bytes_per_utt": "end_to_end_feed_bytes_per_utt"},
        "mulaw8": {
            "utts_per_sec": "end_to_end_epoch_utts_per_sec_mulaw8",
            "num_samples": "end_to_end_epoch_samples_mulaw8",
            "feed_bound_frac": "end_to_end_feed_bound_frac_mulaw8",
            "feed_bytes_per_utt": "end_to_end_feed_bytes_per_utt_mulaw8"},
        "online": {"utts_per_sec": "online_epoch_utts_per_sec",
                   "num_samples": "online_epoch_samples",
                   "feed_bound_frac": "online_epoch_feed_bound_frac",
                   "feed_bytes_per_utt": "online_epoch_feed_bytes_per_utt",
                   "frames_per_crop": "online_epoch_frames_per_crop"},
    }
    out = None
    for flag in ("int16", "mulaw8", "online"):
        try:
            proc = subprocess.run(
                [sys.executable, str(Path(__file__).resolve()),
                 "--e2e-worker", flag],
                capture_output=True, text=True, timeout=1800)
        except subprocess.TimeoutExpired:
            # A wedged runtime must not stall the whole bench run —
            # the e2e lines are best-effort extras around the headline.
            _log(f"e2e worker {flag} timed out; skipping")
            continue
        if proc.returncode != 0:
            _log(f"e2e worker {flag} failed: {proc.stderr[-500:]}")
            continue
        try:
            res = json.loads(proc.stdout.strip().splitlines()[-1])
        except (ValueError, IndexError):
            _log(f"e2e worker {flag}: unparseable output "
                 f"{proc.stdout[-200:]!r}")
            continue
        for field, key in keymaps[flag].items():
            if field in res:
                details[key] = res[field]
        if out is None:
            out = res["utts_per_sec"]
    return out


def bench_teacher(details: dict):
    """SENet50 teacher: inference imgs/s and train-step imgs/s (bs128).

    Train batch raised 32 -> 128 in round 4 after measuring the knee
    (2,103 / 2,165 / 2,385 imgs/s at bs 32/64/128 — the reference's own
    FER+ recipe trains at 128, ferplus_baselines.m:76).
    """
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.train.state import (
        SGDConfig,
        TrainState,
        make_train_step,
    )
    from mcncrossmodalemotions_tpu.zoo import build_teacher, teacher_loss_fn

    rng = np.random.RandomState(0)
    teacher = build_teacher("senet50-ferplus")
    x = jnp.asarray(rng.randn(128, 224, 224, 3).astype(np.float32))
    variables = teacher.init(jax.random.PRNGKey(0), x[:1])
    fwd = jax.jit(lambda v, a: teacher.apply(v, a, train=False))
    out = [None]

    def run_fwd():
        out[0] = fwd(variables, x)

    sec = _best_of(run_fwd, lambda: _sync(out[0].sum()), iters=10)
    details["teacher_inference_imgs_per_sec"] = round(128 / sec, 2)

    bs = 128
    batch = {
        "data": jnp.asarray(rng.randn(bs, 224, 224, 3).astype(np.float32)),
        "label_dist": jnp.asarray(
            np.full((bs, 8), 1 / 8, np.float32)),
        "hard_label": jnp.asarray(rng.randint(0, 8, bs)),
    }
    state = TrainState.create(variables, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(teacher.apply,
                                   teacher_loss_fn("distributions"),
                                   SGDConfig(weight_decay=0.0)),
                   donate_argnums=(0,))
    st, mbox = [state], [None]

    def run_step():
        s, m = step(st[0], batch, 1e-3)
        st[0] = s
        mbox[0] = m

    sec = _best_of(run_step, lambda: _sync(mbox[0]["loss"]), iters=10)
    details["teacher_train_imgs_per_sec"] = round(bs / sec, 2)


def bench_fused_online(details: dict):
    """Fused online distillation: frozen SENet50 fwd + student step in ONE
    XLA program (train/distill.py), bs64 x 2 frames (bs sweep: 32 ->
    1,491, 64 -> 1,663, 96 -> 1,659 utts/s — 64 is the knee and also
    the reference's batchSize default, run_distillation.m:75)."""
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.models.teacher_pipeline import (
        FaceTeacherPipeline,
    )
    from mcncrossmodalemotions_tpu.ops.spectrogram import DEFAULT_SPEC
    from mcncrossmodalemotions_tpu.train.distill import (
        make_online_distill_step,
    )
    from mcncrossmodalemotions_tpu.train.state import SGDConfig, TrainState
    from mcncrossmodalemotions_tpu.zoo import build_student, build_teacher

    rng = np.random.RandomState(0)
    bs, k = 64, 2
    crop = DEFAULT_SPEC.crop_samples(400)
    batch = {
        "data": jnp.asarray(rng.randn(bs, crop).astype(np.float32)),
        "frames": jnp.asarray(
            rng.randint(0, 255, (bs, k, 224, 224, 1)).astype(np.uint8)),
    }
    student = build_student("emovoxceleb-student")
    svars = student.init(jax.random.PRNGKey(0), batch["data"][:1])
    pipeline = FaceTeacherPipeline(
        teacher=build_teacher("senet50-ferplus"), augment=False)
    tvars = pipeline.init(jax.random.PRNGKey(1), batch["frames"][0, :1])
    state = TrainState.create(svars, jax.random.PRNGKey(2))
    step = jax.jit(
        make_online_distill_step(student.apply, pipeline.apply, tvars,
                                 sgd=SGDConfig(weight_decay=0.0)),
        donate_argnums=(0,))
    st, mbox = [state], [None]

    def run():
        s, m = step(st[0], batch, 1e-4)
        st[0] = s
        mbox[0] = m

    sec = _best_of(run, lambda: _sync(mbox[0]["loss"]), iters=10)
    details["fused_online_step_utts_per_sec"] = round(bs / sec, 2)
    details["fused_online_step_ms"] = round(sec * 1000, 2)
    details["fused_online_step_bs"] = bs  # step_ms scales with bs —
    # without this a bs change reads as a step-time regression


def bench_dense_inference(details: dict):
    """Dense teacher inference END TO END from disk (the dataset-genesis
    workload, fetch_emovoxceleb_imdb.m:119-136 / SURVEY section 3.3):
    synthetic on-disk JPEGs -> threaded native decode+crop+resize+gray ->
    double-buffered device feed -> SENet50 forward, imgs/s including the
    host. Complements teacher_inference_imgs_per_sec (compute-only)."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    import jax

    from mcncrossmodalemotions_tpu.data.images import save_synthetic_frame
    from mcncrossmodalemotions_tpu.exp.compute_visual_feats import (
        VisualFeatureExtractor,
    )
    from mcncrossmodalemotions_tpu.models.teacher_pipeline import (
        FaceTeacherPipeline,
    )
    from mcncrossmodalemotions_tpu.zoo import build_teacher

    root = Path(tempfile.mkdtemp(prefix="bench_dense_"))
    n_frames = 1280
    paths = [root / f"frames/{i // 64:03d}/{i % 64:05d}.jpg"
             for i in range(n_frames)]
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(
            lambda a: save_synthetic_frame(a[1], a[0] % 7, size=256,
                                           seed=a[0]),
            enumerate(paths)))
    pipeline = FaceTeacherPipeline(teacher=build_teacher("senet50-ferplus"),
                                   augment=False)
    x1 = np.zeros((1, 224, 224, 1), np.uint8)
    variables = pipeline.init(jax.random.PRNGKey(0), x1)
    extractor = VisualFeatureExtractor(pipeline, variables, batch_size=128)
    flat = [str(p) for p in paths]
    extractor.frame_logits(flat, verbose=False)  # warm compile + page cache
    t0 = time.perf_counter()
    logits = extractor.frame_logits(flat, verbose=False)
    sec = time.perf_counter() - t0
    assert logits.shape == (n_frames, 8) and np.isfinite(logits).all()
    details["dense_inference_e2e_imgs_per_sec"] = round(n_frames / sec, 2)
    # uint8 grayscale faces: input_size^2 bytes each over the host link
    details["dense_inference_bytes_per_img"] = extractor.input_size ** 2


def bench_audio_feats(details: dict):
    """Bucketed full-clip student extraction, end to end from disk
    (threaded native reads overlapped with device compute)."""
    import tempfile

    import jax

    from mcncrossmodalemotions_tpu.data.emovox import build_synthetic_imdb
    from mcncrossmodalemotions_tpu.exp.compute_audio_feats import (
        AudioFeatureExtractor,
    )
    from mcncrossmodalemotions_tpu.models import VGGMStudent

    root = Path(tempfile.mkdtemp(prefix="bench_feats_"))
    imdb = build_synthetic_imdb(root / "wavs", num_speakers=8,
                                tracks_per_speaker=25,
                                duration_range=(2.0, 9.5))
    model = VGGMStudent()
    x = np.zeros((1, 512, 100, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    extractor = AudioFeatureExtractor(model, variables)  # shipped default
    paths = [str(Path(imdb.wav_dir) / p) for p in imdb.wav_paths]
    # warm EVERY (pad-shape, bucket) jit combination the set will hit —
    # a partial warm-up leaves 20-40 s compiles inside the measurement
    extractor.track_logits(paths, verbose=False)
    t0 = time.perf_counter()
    out = extractor.track_logits(paths, verbose=False)
    sec = time.perf_counter() - t0
    assert all(o is not None for o in out)
    details["audio_feats_tracks_per_sec"] = round(len(paths) / sec, 2)
    details["audio_feats_batch_size"] = extractor.batch_size
    # shipped bytes per track: bucket-padded int16 PCM (emit_int16)
    ship = sum(extractor.spec.crop_samples(extractor._meta(p)[2]) * 2
               for p in paths)
    details["audio_feats_bytes_per_track"] = int(ship / len(paths))


def bench_frontend(details: dict):
    """Spectrogram frontend: jnp MXU-matmul DFT vs fused Pallas kernel."""
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.ops.spectrogram import (
        DEFAULT_SPEC,
        waveform_to_input,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.randn(128, DEFAULT_SPEC.crop_samples(400)).astype(np.float32))
    out = [None]
    for name, use_pallas in (("jnp", False), ("pallas", True)):
        try:
            f = jax.jit(lambda a, up=use_pallas: waveform_to_input(
                a, use_pallas=up))

            def run():
                out[0] = f(x)

            sec = _best_of(run, lambda: _sync(out[0].sum()), iters=10)
            details[f"frontend_{name}_ms"] = round(sec * 1000, 3)
        except Exception as exc:
            _log(f"frontend {name} bench failed: {exc}")


def _native_probe_ok() -> str:
    """Smoke the .so in a SUBPROCESS: a committed -march=native binary
    on an older CPU dies with SIGILL, and a missing shared-lib dep
    raises on load — both must not take the bench process down.

    Returns 'ok', 'crash' (nonzero exit: SIGILL/load/assert — the
    binary itself is bad) or 'timeout' (inconclusive: a loaded host can
    blow the 120 s budget with a perfectly good .so)."""
    import subprocess

    code = (
        "import numpy as np, tempfile, os\n"
        "from mcncrossmodalemotions_tpu.data import native\n"
        "from mcncrossmodalemotions_tpu.data.audio import write_wav\n"
        "assert native.available()\n"
        "p = os.path.join(tempfile.mkdtemp(), 'probe.wav')\n"
        "write_wav(p, np.zeros(400, np.float32), 16000)\n"
        "assert native.wav_info(p)[0] == 400\n"
    )
    try:
        rc = subprocess.run([sys.executable, "-c", code],
                            capture_output=True, timeout=120,
                            env={**__import__("os").environ,
                                 "JAX_PLATFORMS": "cpu"},
                            ).returncode
        return "ok" if rc == 0 else "crash"
    except subprocess.TimeoutExpired:
        return "timeout"
    except Exception:
        return "timeout"  # environment issue, not evidence against the .so


def _ensure_native_built():
    """Best-effort (re)build of the C++ data service. The committed .so
    is -march=native for the dev container; on a different host the
    subprocess probe fails (SIGILL/load error isolated there) and a
    fresh make runs. A missing toolchain just means the bit-identical
    Python fallbacks run (slower feed, same numbers)."""
    import os
    import subprocess

    def disable_softly(reason):
        # Inconclusive probe (timeout on a loaded host): skip native in
        # THIS run via an env flag the worker subprocesses inherit —
        # never rename the committed .so on weak evidence.
        _log(f"native probe inconclusive ({reason}); disabling native "
             "for this run (MCNCME_DISABLE_NATIVE=1)")
        os.environ["MCNCME_DISABLE_NATIVE"] = "1"

    outcome = _native_probe_ok()
    if outcome == "ok":
        return
    if outcome == "timeout":
        disable_softly("probe timeout")
        return
    lib = Path(__file__).parent / "native" / "libdataservice.so"
    try:
        proc = subprocess.run(
            ["make", "-C", str(lib.parent), "-B"],
            capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            _log("native build FAILED; using Python fallbacks:\n"
                 + proc.stderr[-400:])
        else:
            outcome = _native_probe_ok()
            if outcome == "ok":
                return
            if outcome == "timeout":
                disable_softly("post-rebuild probe timeout")
                return
            _log("native library unusable after rebuild; Python fallbacks")
    except subprocess.TimeoutExpired:
        disable_softly("make timeout")
        return
    except Exception as exc:
        _log(f"native build unavailable ({exc}); using Python fallbacks")
    # A binary that CRASHES must not stay where available() finds it —
    # the benchmark processes would load it and die instead of falling
    # back to the (bit-identical) Python paths.
    if lib.exists():
        lib.rename(lib.with_suffix(".so.unusable"))


# On-chip numerics tolerances vs the CPU golden (rationale measured and
# documented in docs/PERF.md round-5 "on-chip numerics smoke"): the
# spectrogram frontend pins Precision.HIGHEST so chip/CPU agree to
# ~1e-5 relative; the train-step losses go through bf16-matmul networks
# where ~1e-3..1e-2 relative drift is the expected bf16 envelope.
_NUMERICS_FRONTEND_RTOL = 1e-3
_NUMERICS_LOSS_RTOL = 5e-2


def _numerics_probe() -> dict:
    """Deterministic mini-computation run identically on CPU and chip:
    the frontend over a fixed 1 s batch + 3 tiny-student train-step
    losses on a fixed batch. PRNG (threefry) and inits are platform-
    invariant, so any disagreement beyond fp envelope is a real
    numerics bug on the accelerator path."""
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.ops.spectrogram import (
        DEFAULT_SPEC,
        waveform_to_input,
    )
    from mcncrossmodalemotions_tpu.train.state import (
        SGDConfig,
        TrainState,
        make_train_step,
    )
    from mcncrossmodalemotions_tpu.zoo import build_student, student_loss_fn

    rng = np.random.RandomState(0)
    wav = rng.randn(2, DEFAULT_SPEC.crop_samples(100)).astype(
        np.float32) * 0.1
    front = np.asarray(jax.device_get(
        jax.jit(waveform_to_input)(jnp.asarray(wav))), np.float64)
    batch = {
        "data": jnp.asarray(wav),
        "logit_target": jnp.asarray(rng.randn(2, 8).astype(np.float32) * 2),
        "max_label": jnp.asarray(rng.randint(0, 8, 2)),
    }
    model = build_student(tiny=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["data"])
    state = TrainState.create(variables, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(
        model.apply, student_loss_fn("hot-cross-ent", temperature=2.0),
        SGDConfig(weight_decay=0.0)))
    losses = []
    for _ in range(3):
        state, m = step(state, batch, 1e-4)
        losses.append(float(np.asarray(jax.device_get(m["loss"]))))
    return {"frontend": front, "losses": np.asarray(losses, np.float64)}


def _numerics_worker(out_path: str) -> None:
    """CPU golden for the numerics smoke (fresh subprocess — this
    process must not initialise the accelerator client)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    np.savez(out_path, **_numerics_probe())


def bench_numerics(details: dict, golden_path) -> None:
    """On-chip numerics smoke (round-4 VERDICT next #8): the bench run
    proves perf on the real chip and, with this field, also that the
    chip's numbers agree with the CPU reference within the documented
    bf16 envelope — every BENCH record carries `numerics_ok`."""
    if not golden_path or not Path(golden_path).exists():
        _log("numerics golden unavailable; skipping numerics smoke")
        return
    golden = np.load(golden_path)
    probe = _numerics_probe()
    scale = max(float(np.abs(golden["frontend"]).max()), 1e-6)
    frontend_rel = float(
        np.abs(probe["frontend"] - golden["frontend"]).max() / scale)
    loss_rel = float(np.max(
        np.abs(probe["losses"] - golden["losses"])
        / np.maximum(np.abs(golden["losses"]), 1e-6)))
    details["numerics_frontend_rel"] = round(frontend_rel, 8)
    details["numerics_loss_rel"] = round(loss_rel, 8)
    details["numerics_ok"] = bool(
        frontend_rel < _NUMERICS_FRONTEND_RTOL
        and loss_rel < _NUMERICS_LOSS_RTOL)
    if not details["numerics_ok"]:
        _log(f"NUMERICS SMOKE FAILED: frontend_rel={frontend_rel:.2e} "
             f"(tol {_NUMERICS_FRONTEND_RTOL}), loss_rel={loss_rel:.2e} "
             f"(tol {_NUMERICS_LOSS_RTOL})")


def bench_link_health(details: dict):
    """Tunnel-health proxy: wire time for a fixed 8 MB host->device put.

    Host-link-bound metrics swing ~2x with the dev tunnel's health; this
    one number, recorded alongside every run in bench_history.jsonl,
    lets a reader separate "pipeline regressed" from "bad tunnel window"
    (VERDICT r2 weak #2)."""
    import time

    import jax
    import jax.numpy as jnp

    arr = np.random.RandomState(0).randn(2 * 1024 * 1024).astype(np.float32)
    reduce = jax.jit(jnp.sum)
    # warm the dispatch path once with a tiny put
    _sync(reduce(jax.device_put(arr[:128])))
    times = []
    for _ in range(3):
        t0 = time.monotonic()
        _sync(reduce(jax.device_put(arr)))
        times.append(time.monotonic() - t0)
    sec = min(times)
    details["link_put_mb_per_sec"] = round(8.0 / sec, 2)


# Metrics whose ceiling is the host->device link, not the pipeline.
_LINK_BOUND_KEYS = ("end_to_end_epoch_utts_per_sec",
                    "end_to_end_epoch_utts_per_sec_mulaw8",
                    "online_epoch_utts_per_sec",
                    "dense_inference_e2e_imgs_per_sec",
                    "audio_feats_tracks_per_sec")


def _link_normalise(details: dict) -> None:
    """Add `<key>_per_link_mbps` = metric / link_put_mb_per_sec for every
    link-bound metric measured this run (VERDICT r3 next #7).

    The dev tunnel's health swings ~3x between runs and these metrics
    swing with it; dividing by the same run's measured link speed makes a
    REAL pipeline regression mechanically visible in bench_history.jsonl
    (the normalised number moves) while a bad-tunnel window does not (raw
    and link drop together, ratio holds). The *_bytes_per_* fields record
    each metric's shipped payload so the ratio's units are auditable:
    samples/s per MB/s of link."""
    link = details.get("link_put_mb_per_sec")
    if not link:
        return
    for key in _LINK_BOUND_KEYS:
        if key in details:
            details[f"{key}_per_link_mbps"] = round(details[key] / link, 3)


def _ratchet_best(merged: dict, details: dict) -> None:
    """Keep a best-observed `<key>_best` line per link-bound metric.

    Host-link-bound metrics swing ~2x with the dev tunnel's health
    (documented in docs/PERF.md); the ratchet keeps an explicit
    best-observed line next to the latest so a bad-tunnel run doesn't
    silently erase what the pipeline can do."""
    for key in _LINK_BOUND_KEYS:
        if key in details:
            best = max(merged.get(f"{key}_best", 0.0), details[key])
            merged[f"{key}_best"] = round(best, 2)


def _append_history(details: dict) -> None:
    """One JSONL row per bench run (committed bench_history.jsonl): the
    audit trail behind the `*_best` ratchets in bench_details.json."""
    import time

    row = {"timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
           "argv": sys.argv[1:], **details}
    path = Path(__file__).parent / "bench_history.jsonl"
    try:
        with path.open("a") as f:
            f.write(json.dumps(row, default=float) + "\n")
    except OSError as exc:
        _log(f"could not append bench_history.jsonl: {exc}")


def main():
    import jax

    try:
        # Persistent compilation cache: the full train step takes ~3 min
        # to compile on this runtime; repeated bench runs skip it.
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/mcncrossmodal_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass  # older jax without these options

    if "--e2e-worker" in sys.argv:
        # Workers inherit the parent's build/probe result via the
        # filesystem — no redundant probe+make inside each worker.
        flag = sys.argv[sys.argv.index("--e2e-worker") + 1]
        if flag == "online":
            print(json.dumps(_online_epoch_worker()))
        else:
            print(json.dumps(_e2e_epoch_worker(flag == "mulaw8")))
        return
    if "--numerics-worker" in sys.argv:
        _numerics_worker(sys.argv[sys.argv.index("--numerics-worker") + 1])
        return
    _ensure_native_built()

    full = "--full" in sys.argv
    quick = "--quick" in sys.argv
    details: dict = {}
    numerics_golden = None
    if not quick:
        # The e2e workers are subprocesses with their own runtime
        # clients; run them BEFORE this process touches the device (the
        # tunnelled runtime serialises clients — a parent already
        # holding the chip would starve the children).
        try:
            _log("running end_to_end sub-benchmark (subprocess workers)...")
            bench_end_to_end_epoch(details)
        except Exception as exc:
            _log(f"end_to_end sub-benchmark failed: {exc}")
        # CPU golden for the numerics smoke — also before the parent
        # owns the device
        try:
            import subprocess

            path = "/tmp/bench_numerics_golden.npz"
            subprocess.run(
                [sys.executable, str(Path(__file__).resolve()),
                 "--numerics-worker", path],
                capture_output=True, timeout=900, check=True)
            numerics_golden = path
        except Exception as exc:
            _log(f"numerics golden worker failed: {exc}")
    details.update({"device_kind": jax.devices()[0].device_kind,
                    "backend": jax.default_backend()})
    try:
        bench_link_health(details)
    except Exception as exc:
        _log(f"link-health probe failed: {exc}")

    utts_per_sec = bench_train_step(details)
    if not quick:
        try:
            _log("running numerics smoke (chip vs CPU golden) ...")
            bench_numerics(details, numerics_golden)
        except Exception as exc:
            _log(f"numerics smoke failed: {exc}")
        for name, fn in (("frontend", bench_frontend),
                         ("teacher", bench_teacher),
                         ("fused_online", bench_fused_online),
                         ("dense_inference", bench_dense_inference),
                         ("audio_feats", bench_audio_feats)):
            if not full and name in ("teacher", "fused_online",
                                     "dense_inference", "audio_feats"):
                continue
            try:
                _log(f"running {name} sub-benchmark ...")
                fn(details)
            except Exception as exc:
                _log(f"{name} sub-benchmark failed: {exc}")
        _link_normalise(details)
        try:
            # merge-update: a default run must not clobber the --full
            # sub-benchmark entries (teacher/fused/dense/audio) recorded
            # by an earlier full run
            out = Path("bench_details.json")
            merged = {}
            if out.exists():
                try:
                    merged = json.loads(out.read_text())
                except ValueError:
                    merged = {}
            merged.update(details)
            _ratchet_best(merged, details)
            out.write_text(json.dumps(merged, indent=2) + "\n")
            _log("details -> bench_details.json: "
                 + json.dumps(details))
        except OSError as exc:
            _log(f"could not write bench_details.json: {exc}")

    _append_history(details)
    print(json.dumps({
        "metric": "distillation_train_throughput",
        "value": round(utts_per_sec, 2),
        "unit": "utts/sec/chip",
        # vs an ESTIMATED 60 utts/s MatConvNet pipeline (no published
        # wall-clock exists) — see module docstring
        "vs_baseline": round(
            utts_per_sec / MATCONVNET_BASELINE_UTTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
