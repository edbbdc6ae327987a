"""EmoVoxCeleb student batch pipeline (``getBatchEmoVoxCeleb`` equivalent).

Per-sample logic replicated from getBatchEmoVoxCeleb.m:

- random ``num_seconds`` crop in train; deterministic (start-anchored) in
  val — the reference's 'vI' transform string (:21-26);
- clips capped at 19.9 s (:84-88), short clips zero-padded (:115-119);
- optional speed perturbation 0.95-1.05 via polyphase resample (:102-108);
- optional additive noise mixing from another random clip (:122-131);
- crop time -> teacher-logit frame indices via ``time_to_logit_idx``
  (fps=25, stride=6; :210-214); logits aggregated over the crop window by
  max or mean (:179-185), truncated to ``num_pred_emotions`` (:188);
- loss-specific targets (:28-44): softmaxlog -> max_label; euclidean ->
  logit_target + instance_weights + max_label; hot-cross-ent ->
  logit_target + max_label.

TPU-native split of responsibilities: this host pipeline emits raw
waveform crops ([B, 64384] float32, 0.25 MB/utt) plus targets; the
spectrogram frontend + instance norm run **on device inside the train
step** (ops/spectrogram.py), so the host never materialises the 4x larger
spectrogram and the STFT rides the MXU. (The reference computed
spectrograms on the CPU in the batch loader — its throughput bottleneck,
SURVEY.md section 3.1.)
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

from mcncrossmodalemotions_tpu.data.audio import read_wav, speed_perturb, wav_info
from mcncrossmodalemotions_tpu.data.imdb import EmoVoxImdb
from mcncrossmodalemotions_tpu.ops.spectrogram import DEFAULT_SPEC, SpecConfig

MAX_CLIP_SECONDS = 19.9  # getBatchEmoVoxCeleb.m:84-88
LOGIT_FPS = 25.0  # video frame rate (time2idx, :210-214)
LOGIT_STRIDE = 6  # teacher logits every 6th frame


@dataclasses.dataclass(frozen=True)
class NoiseConfig:
    """Noise-corpus augmentation (getBatchEmoVoxCeleb.m:122-131).

    The reference mixes noise from a DEDICATED corpus of numbered wavs:
    ``meta.noise.noisedir/%02d.wav`` with ``noisenum`` files each at
    least ``noiselen`` samples, picking a random file + random offset
    and mixing at ratio ``rand * noisevol``. ``noise_len=None`` infers
    each file's length from its header instead of assuming a corpus-wide
    constant.
    """

    noise_dir: str
    num_files: int               # meta.noise.noisenum
    noise_vol: float = 0.3       # meta.noise.noisevol
    noise_len: Optional[int] = None  # meta.noise.noiselen (samples)

    def file_path(self, index: int) -> Path:
        """1-based numbered corpus filename ('%02d.wav')."""
        return Path(self.noise_dir) / f"{index:02d}.wav"


@dataclasses.dataclass(frozen=True)
class BatchConfig:
    """Batch-loader options (run_distillation.m:71-89 defaults)."""

    num_seconds: float = 4.0
    batch_size: int = 64
    loss_type: str = "hot-cross-ent"
    logit_aggregator: str = "max"  # 'max' | 'mean'
    num_pred_emotions: int = 8
    speed_aug: bool = False
    noise_aug: bool = False    # corpus-free fallback: mix another clip
    noise: Optional[NoiseConfig] = None  # reference corpus semantics
    frames_per_crop: int = 0   # >0: emit face frames for online distillation
    frame_size: int = 224
    emit_int16: bool = True    # ship PCM16 crops (half the feed bytes;
                               # lossless for 16-bit sources, requantised
                               # only after speed/noise augmentation)
    emit_mulaw: bool = False   # ship mu-law uint8 crops instead (quarter
                               # the bytes, ~38 dB SNR) — opt-in for
                               # link-bound hosts; overrides emit_int16
    spec: SpecConfig = DEFAULT_SPEC

    @property
    def noise_enabled(self) -> bool:
        return self.noise_aug or self.noise is not None

    @property
    def num_frames(self) -> int:
        return int(round(self.num_seconds * self.spec.frames_per_second()))

    @property
    def crop_samples(self) -> int:
        return self.spec.crop_samples(self.num_frames)  # 64,384 for 4 s


def time_to_logit_idx(t_seconds: float, num_logits: int) -> int:
    """Map a time offset to a teacher-logit frame index: the EXACT
    time2idx arithmetic (getBatchEmoVoxCeleb.m:210-214,
    ``floor(max(t*fps - 1, 0)/stride) + 1`` 1-based -> the same floor
    zero-based). The -1 matters when ``t*fps`` lands on a stride
    multiple: t=0.24 s is frame 0 (the reference's idx 1), not frame 1."""
    idx = int(np.floor(max(t_seconds * LOGIT_FPS - 1.0, 0.0) / LOGIT_STRIDE))
    return int(np.clip(idx, 0, max(num_logits - 1, 0)))


def aggregate_logits(wav_logits: np.ndarray, t0: float, t1: float,
                     aggregator: str = "max") -> np.ndarray:
    """Aggregate per-frame teacher logits over the crop window [t0, t1]."""
    f = len(wav_logits)
    i0 = time_to_logit_idx(t0, f)
    i1 = max(time_to_logit_idx(t1, f) + 1, i0 + 1)
    window = wav_logits[i0:i1]
    if aggregator == "max":
        return window.max(axis=0)
    if aggregator == "mean":
        return window.mean(axis=0)
    raise ValueError(f"unknown aggregator {aggregator!r}")


def _stream_rng(seed: int, epoch: int, stream: str) -> np.random.RandomState:
    """Independent per-(seed, epoch, stream) RandomState.

    SeedSequence-derived so the shuffle and crop/augment streams can
    NEVER collide — additive formulas like ``seed + epoch`` vs
    ``seed*1000 + epoch`` coincide at seed 0 (and at (0, 1000) vs
    (1, 0)), coupling the epoch's permutation to its crop draws.
    """
    # SeedSequence rejects negative entropy; the legacy seed+epoch scheme
    # accepted negative seeds, so map ONLY those into the unsigned range
    # (64-bit two's complement). An earlier unconditional 32-bit mask
    # aliased previously-distinct seeds >= 2**32 onto colliding RNG
    # streams (pinned non-aliasing: tests/test_data.py, 2**32 vs 0).
    if seed < 0:
        seed &= 0xFFFFFFFFFFFFFFFF
    ss = np.random.SeedSequence(
        [seed, epoch, int.from_bytes(stream.encode(), "little")])
    return np.random.RandomState(ss.generate_state(4))


def pinned_start(start_seconds: float, native_fs: int,
                 num_samples: int) -> int:
    """fixedSegments pinned crop start, in native samples.

    The reference reads at ``wr = timeOffsets(ii)*fs+1`` without
    range-checking and pads only at the clip end
    (getBatchEmoVoxCeleb.m:91-99); clamp to a valid read instead. This
    mode also skips the DATASET_LIMIT cap (:81-89) — clamp only to the
    real file. ONE definition shared by the python and native feed paths
    (which must stay bit-identical).
    """
    return min(max(int(round(start_seconds * native_fs)), 0),
               max(num_samples - 1, 0))


def target_logit_window(wav_logits: np.ndarray, t0: Optional[float],
                        cfg: BatchConfig) -> np.ndarray:
    """Teacher-logit aggregation window for one crop.

    ``t0=None`` means fixedSegments mode: targets aggregate over the
    WHOLE track (getBatchEmoVoxCeleb.m:136-138 ``lgts_sampled = lgts``);
    otherwise over [t0, t0 + num_seconds]. Shared by the python and
    native feed paths.
    """
    if t0 is None:
        return aggregate_logits(wav_logits, 0.0, 1e6, cfg.logit_aggregator)
    return aggregate_logits(wav_logits, t0, t0 + cfg.num_seconds,
                            cfg.logit_aggregator)


def load_crop(wav_path: str | Path, cfg: BatchConfig,
              rng: Optional[np.random.RandomState] = None,
              noise_path: Optional[str] = None,
              start_seconds: Optional[float] = None):
    """Read one crop; returns (samples[crop_samples], t0_seconds, duration).

    Deterministic (start-anchored) when ``rng is None`` — the val-set 'vI'
    behavior; random crop start + optional augmentation otherwise.
    ``start_seconds`` pins the crop start explicitly — the reference's
    ``fixedSegments``/``timeOffsets`` mode (getBatchEmoVoxCeleb.m:91-99):
    no crop-position draw, segment read at the given offset, zero-padded
    past the clip end.
    """
    info = wav_info(wav_path)
    fs = cfg.spec.sample_rate
    native_fs = info.sample_rate
    total = min(info.num_samples, int(MAX_CLIP_SECONDS * native_fs))
    need = cfg.crop_samples

    factor = 1.0
    if rng is not None and cfg.speed_aug and start_seconds is None:
        # fixedSegments and chspeed are mutually exclusive branches in
        # the reference (getBatchEmoVoxCeleb.m:91-108 if/elseif): pinned
        # segments are read verbatim, never speed-perturbed (and must
        # not consume the extra RNG draw).
        factor = float(rng.uniform(0.95, 1.05))
    # All crop arithmetic in NATIVE-rate samples: `need` target-rate
    # samples correspond to need * native/target native samples (plus
    # speed-perturb headroom), and t0 must use the native rate — mixing
    # rates silently desynchronised the teacher-logit window.
    rate_ratio = native_fs / fs
    need_native = int(np.ceil(need * rate_ratio * factor)) + (
        4 if factor != 1.0 else 0
    )

    if start_seconds is not None:
        start = pinned_start(start_seconds, native_fs, info.num_samples)
        total = min(info.num_samples, start + need_native)  # allow tail
    else:
        max_start = max(total - need_native, 0)
        start = int(rng.randint(0, max_start + 1)) if (rng is not None and max_start > 0) else 0
    samples, got_fs = read_wav(wav_path, start, min(need_native, total - start))
    if got_fs != fs:
        from mcncrossmodalemotions_tpu.data.audio import resample_to

        samples = resample_to(samples, got_fs, fs)
    if factor != 1.0:
        samples = speed_perturb(samples, factor)
    if len(samples) < need:  # zero-pad short clips (:115-119)
        samples = np.pad(samples, (0, need - len(samples)))
    samples = samples[:need]
    if rng is not None and cfg.noise_aug and noise_path is not None:
        # corpus-free fallback: mix another dataset clip from offset 0
        # (read_noise_resampled shares the off-rate arithmetic with the
        # corpus mix)
        noise = read_noise_resampled(noise_path, need, fs)
        snr_scale = float(rng.uniform(0.0, 0.3))
        samples = samples + snr_scale * noise
    t0 = start / native_fs
    return samples.astype(np.float32), t0, info.duration


@functools.lru_cache(maxsize=256)
def _noise_wav_info(path_str: str):
    """Header info for a noise-corpus file, memoized: the corpus is a
    small FIXED set of numbered wavs (meta.noise.noisenum), so the
    per-sample header open the reference avoids via meta.noise.noiselen
    is paid at most once per file here, for both the length and the
    sample-rate reads."""
    return wav_info(Path(path_str))


def read_noise_resampled(path, need: int, target_fs: int,
                         start: int = 0) -> np.ndarray:
    """Read ``need`` target-rate samples of noise from ``path`` at
    native-rate offset ``start``, resampling off-rate corpora and
    zero-padding short reads. ONE definition of the rate-sensitive
    arithmetic, shared by the corpus mix and the corpus-free fallback
    (they previously desynchronised on exactly this computation)."""
    info = _noise_wav_info(str(path))
    need_native = (need if info.sample_rate == target_fs
                   else int(np.ceil(need * info.sample_rate / target_fs)) + 4)
    noise, fs = read_wav(path, start, need_native)
    if fs != target_fs:
        from mcncrossmodalemotions_tpu.data.audio import resample_to

        noise = resample_to(noise, fs, target_fs)
    if len(noise) < need:
        noise = np.pad(noise, (0, need - len(noise)))
    return noise[:need]


def mix_corpus_noise(samples: np.ndarray, ncfg: NoiseConfig,
                     rng: np.random.RandomState,
                     target_fs: int) -> np.ndarray:
    """Reference corpus mix (getBatchEmoVoxCeleb.m:122-131): random
    numbered file (``randi(noisenum)``), random offset within
    ``noiselen - numel(z)``, mix ratio ``rand * noisevol``.

    Exactly three RNG draws per sample, in the reference's order
    (file, offset, ratio), taken AFTER the crop draws so the crop RNG
    stream is identical with or without corpus noise.
    """
    need = len(samples)
    idx = int(rng.randint(1, ncfg.num_files + 1))
    path = ncfg.file_path(idx)
    info = _noise_wav_info(str(path))
    native_fs = info.sample_rate
    # All offset/length arithmetic in the corpus file's NATIVE samples
    # (an off-rate corpus otherwise reads ~fs_ratio of the intended
    # duration and pads the rest with silence). noise_len is in native
    # samples, like the reference's meta.noise.noiselen.
    need_native = (need if native_fs == target_fs
                   else int(np.ceil(need * native_fs / target_fs)) + 4)
    total = ncfg.noise_len if ncfg.noise_len is not None else info.num_samples
    max_start = max(total - need_native, 0)
    start = int(rng.randint(0, max_start + 1)) if max_start > 0 else 0
    noise = read_noise_resampled(path, need, target_fs, start=start)
    ratio = float(rng.uniform(0.0, ncfg.noise_vol))
    return (samples + ratio * noise).astype(np.float32)


def make_targets(logit_window: np.ndarray, cfg: BatchConfig) -> Dict[str, np.ndarray]:
    """Loss-specific target dict for one sample (:28-44)."""
    logits = logit_window[: cfg.num_pred_emotions].astype(np.float32)
    max_label = int(np.argmax(logits))
    out = {"max_label": np.int32(max_label)}
    if cfg.loss_type in ("hot-cross-ent", "euclidean", "huber"):
        out["logit_target"] = logits
    if cfg.loss_type in ("euclidean", "huber"):
        # emoVoxZoo.m:138-148: both regression stacks take instanceWeights
        # (the reference feeds all-ones, "no re-weighting required")
        out["instance_weights"] = np.ones_like(logits)
    return out


class EmoVoxBatcher:
    """Batched iterator over an EmoVoxImdb subset.

    ``train=True`` draws random crops/augmentation from a per-epoch seeded
    RNG (reproducible, the reference's rng-pinning discipline); val is
    fully deterministic.
    """

    def __init__(self, imdb: EmoVoxImdb, cfg: BatchConfig, train: bool = True,
                 seed: int = 0, time_offsets=None):
        """``time_offsets`` ([num_tracks] seconds, optional) enables the
        reference's fixedSegments mode (run_distillation.m:86,220 +
        getBatchEmoVoxCeleb.m:91-99,136-138): every crop starts at its
        track's pinned offset (no random draw) and the loss target
        aggregates over the track's WHOLE logit sequence."""
        self.imdb = imdb
        self.cfg = cfg
        self.train = train
        self.seed = seed
        self.time_offsets = (None if time_offsets is None
                             else np.asarray(time_offsets, np.float64))
        if self.time_offsets is not None:
            assert len(self.time_offsets) == imdb.num_tracks, (
                "time_offsets must give one offset per track")

    def epoch_indices(self, epoch: int, epoch_size: Optional[int] = None) -> np.ndarray:
        """Shuffled (train) or in-order (val) indices; epoch_size subsamples
        — the reference's mini-epoch mechanism (run_distillation.m:154)."""
        n = self.imdb.num_tracks
        if self.train:
            idx = _stream_rng(self.seed, epoch, "shuffle").permutation(n)
        else:
            idx = np.arange(n)
        if epoch_size is not None:
            idx = idx[:epoch_size]
        return idx

    def batches(self, epoch: int = 1, epoch_size: Optional[int] = None,
                drop_remainder: bool = False) -> Iterator[Dict[str, np.ndarray]]:
        cfg = self.cfg
        idx = self.epoch_indices(epoch, epoch_size)
        rng = _stream_rng(self.seed, epoch, "augment") if self.train else None
        wav_root = Path(self.imdb.wav_dir)
        use_native = False
        if not (self.train and (cfg.speed_aug or cfg.noise_enabled)):
            from mcncrossmodalemotions_tpu.data import native as native_ds

            use_native = native_ds.available()
        for i in range(0, len(idx), cfg.batch_size):
            chunk = idx[i:i + cfg.batch_size]
            if drop_remainder and len(chunk) < cfg.batch_size:
                break
            if use_native:
                yield self._native_batch(chunk, rng, wav_root)
            else:
                yield self._python_batch(chunk, rng, wav_root)

    def _python_batch(self, chunk, rng, wav_root: Path) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        waves, targets, starts_times = [], [], []
        for j in chunk:
            noise_path = None
            if rng is not None and cfg.noise_aug and cfg.noise is None:
                # corpus-free fallback: mix a random OTHER dataset clip
                k = int(rng.randint(0, self.imdb.num_tracks))
                noise_path = str(wav_root / self.imdb.wav_paths[k])
            offset = (None if self.time_offsets is None
                      else float(self.time_offsets[j]))
            samples, t0, _ = load_crop(
                str(wav_root / self.imdb.wav_paths[j]), cfg,
                rng=rng, noise_path=noise_path, start_seconds=offset,
            )
            if rng is not None and cfg.noise is not None:
                samples = mix_corpus_noise(samples, cfg.noise, rng,
                                           cfg.spec.sample_rate)
            window = target_logit_window(
                self.imdb.wav_logits[j],
                None if offset is not None else t0, cfg)
            waves.append(samples)
            starts_times.append(t0)
            targets.append(make_targets(window, cfg))
        batch = {"data": self._pack_waves(np.stack(waves))}
        for key in targets[0]:
            batch[key] = np.stack([t[key] for t in targets])
        if cfg.frames_per_crop > 0:
            batch["frames"] = self._crop_frames(chunk, starts_times)
        return batch

    def _pack_waves(self, waves: np.ndarray) -> np.ndarray:
        if self.cfg.emit_mulaw:
            from mcncrossmodalemotions_tpu.data.audio import pack_mulaw8

            return pack_mulaw8(waves)
        if not self.cfg.emit_int16:
            return waves
        from mcncrossmodalemotions_tpu.data.audio import pack_pcm16

        return pack_pcm16(waves)

    def _native_batch(self, chunk, rng, wav_root: Path) -> Dict[str, np.ndarray]:
        """Threaded C++ fast path: batched segment reads (no host resample
        needed when speed/noise augmentation are off).

        Files whose native rate differs from the target are read
        individually through the python path (host resample) while the
        rest of the batch stays on the fast path — one 44.1 kHz stray
        must not poison the whole batch. Both paths draw exactly one RNG
        value per sample (the crop start), so the train RNG stream stays
        aligned regardless of the mix.
        """
        from mcncrossmodalemotions_tpu.data import native as native_ds

        cfg = self.cfg
        fs = cfg.spec.sample_rate
        need = cfg.crop_samples
        rows: list = [None] * len(chunk)
        t0s = [0.0] * len(chunk)
        fast_paths, fast_starts, fast_positions = [], [], []
        targets = []
        for pos, j in enumerate(chunk):
            path = str(wav_root / self.imdb.wav_paths[j])
            num_samples, native_fs, _, _ = native_ds.wav_info(path)
            offset = (None if self.time_offsets is None
                      else float(self.time_offsets[j]))
            if native_fs == fs:
                if offset is not None:  # fixedSegments: pinned start
                    start = pinned_start(offset, fs, num_samples)
                else:
                    total = min(num_samples, int(MAX_CLIP_SECONDS * fs))
                    max_start = max(total - need, 0)
                    start = int(rng.randint(0, max_start + 1)) if (
                        rng is not None and max_start > 0) else 0
                fast_paths.append(path)
                fast_starts.append(start)
                fast_positions.append(pos)
                t0 = start / fs
            else:
                # off-rate file: per-file python fallback (resample)
                samples, t0, _ = load_crop(path, cfg, rng=rng,
                                           start_seconds=offset)
                rows[pos] = samples
            t0s[pos] = t0
            window = target_logit_window(
                self.imdb.wav_logits[j],
                None if offset is not None else t0, cfg)
            targets.append(make_targets(window, cfg))
        whole_batch_fast = len(fast_paths) == len(chunk)
        fmt = ("mulaw8" if cfg.emit_mulaw
               else "int16" if cfg.emit_int16 else None)
        if (whole_batch_fast and fmt is not None
                and native_ds.packed_reads_available()):
            # Fused read+quantise: the C++ threads emit device-ready
            # int16/uint8 rows (bit-identical to read->pack, tested), so
            # the producer skips the numpy pack pass entirely. Rows come
            # back in chunk order (every sample took the fast path).
            batch = {"data": native_ds.read_crops_packed(
                fast_paths, fast_starts, need, fmt)}
        else:
            if fast_paths:
                fast = native_ds.read_crops(fast_paths, fast_starts, need)
                for k, pos in enumerate(fast_positions):
                    rows[pos] = fast[k]
            batch = {"data": self._pack_waves(np.stack(rows))}
        for key in targets[0]:
            batch[key] = np.stack([t[key] for t in targets])
        if cfg.frames_per_crop > 0:
            batch["frames"] = self._crop_frames(chunk, t0s)
        return batch

    def _crop_frames(self, chunk, crop_starts) -> np.ndarray:
        """[B, K, S, S, 1] face frames sampled from each crop window, for
        online distillation (teacher forward in-graph). K frames are taken
        evenly spaced over the crop's logit-frame range; tracks with fewer
        frames repeat the last one."""
        from mcncrossmodalemotions_tpu.data.images import load_frame_batch

        cfg = self.cfg
        assert self.imdb.dense_frames is not None, (
            "frames_per_crop requires an imdb with dense_frames"
        )
        frame_root = Path(self.imdb.frame_dir)
        all_paths = []
        for j, t0 in zip(chunk, crop_starts):
            track_frames = self.imdb.dense_frames[j]
            f = len(track_frames)
            i0 = time_to_logit_idx(t0, f)
            i1 = max(time_to_logit_idx(t0 + cfg.num_seconds, f), i0)
            picks = np.linspace(i0, i1, cfg.frames_per_crop).round().astype(int)
            picks = np.clip(picks, 0, f - 1)
            all_paths.extend(str(frame_root / track_frames[p]) for p in picks)
        flat = load_frame_batch(all_paths, cfg.frame_size)
        k = cfg.frames_per_crop
        return flat.reshape(len(chunk), k, *flat.shape[1:])


def build_synthetic_imdb(root: str | Path, num_speakers: int = 4,
                         tracks_per_speaker: int = 6, seed: int = 0,
                         num_emotions: int = 8,
                         duration_range=(4.2, 8.0),
                         sample_rate: int = 16000,
                         with_frames: bool = False,
                         logit_gap: float = 8.0) -> EmoVoxImdb:
    """Synthetic mini EmoVoxCeleb: wav files + correlated fake teacher logits.

    The reference's dev/smoke pattern (opts.dev / opts.limit,
    SURVEY.md section 4.3) made first-class: each track's dominant
    "emotion" drives both its tone content and its teacher logits, so
    distillation on this imdb is learnable end-to-end in tests.

    ``logit_gap`` is the dominant-class bump on the fake teacher logits.
    The default 8.0 keeps the T=2 soft targets PEAKED (p_dom ~0.87,
    entropy ~0.6 nats): a 4.0 gap gives p_dom ~0.51 and an entropy floor
    of ~1.6 nats, leaving the hot-cross-ent loss only ~0.4 nats of
    observable range — too flat for convergence tests to distinguish
    learning from luck (measured in the round-3 recipe probes).
    """
    root = Path(root)
    rng = np.random.RandomState(seed)
    wav_paths, speakers, sets, all_logits = [], [], [], []
    dense_frames = [] if with_frames else None
    for s in range(num_speakers):
        for t in range(tracks_per_speaker):
            duration = float(rng.uniform(*duration_range))
            n = int(duration * sample_rate)
            emotion = int(rng.randint(0, num_emotions))
            # tone frequency encodes the emotion; noise keeps it
            # non-trivial. The tone is AMPLITUDE-MODULATED at an
            # emotion-keyed RATE: the frontend instance-normalises each
            # frequency bin over TIME (getBatchEmoVoxCeleb.m:164-169),
            # which ERASES a stationary tone (constant bin energy ->
            # zero mean, noise-level residual; measured same-emotion
            # feature correlation 0.005 = cross-emotion). The slow
            # envelope gives the tone bin temporal variance — and keying
            # its rate to the emotion adds a second class cue that
            # survives per-bin normalisation EXACTLY (the normalised bin
            # is a unit-variance sinusoid at the class rate), so
            # distillation on this imdb is genuinely learnable, not
            # noise-scraping.
            freq = 200.0 + 150.0 * emotion
            rate = 0.8 + 0.35 * emotion
            tt = np.arange(n) / sample_rate
            envelope = 0.3 + 0.7 * (0.5 + 0.5 * np.sin(2 * np.pi * rate * tt))
            wave = (0.5 * np.sin(2 * np.pi * freq * tt) * envelope
                    + 0.05 * rng.randn(n)).astype(np.float32)
            rel = f"spk{s:03d}/track{t:03d}.wav"
            from mcncrossmodalemotions_tpu.data.audio import write_wav

            write_wav(root / rel, wave, sample_rate)
            f = max(int(duration * LOGIT_FPS / LOGIT_STRIDE), 1)
            logits = rng.randn(f, num_emotions).astype(np.float32) * 0.3
            logits[:, emotion] += logit_gap
            if with_frames:
                from mcncrossmodalemotions_tpu.data.images import (
                    save_synthetic_frame,
                )

                track_rel = rel[:-4]  # strip .wav
                frame_rels = []
                for k in range(f):
                    frel = f"{track_rel}/{k:04d}.jpg"
                    save_synthetic_frame(root.parent / "frames" / frel,
                                         emotion, seed=seed + k)
                    frame_rels.append(frel)
                dense_frames.append(np.asarray(frame_rels, dtype=object))
            wav_paths.append(rel)
            speakers.append(f"spk{s:03d}")
            # speakers 0..n-2: train + heardVal; last speaker: unheardVal
            if s == num_speakers - 1:
                sets.append(2)
            else:
                sets.append(3 if t == tracks_per_speaker - 1 else 1)
            all_logits.append(logits)
    from mcncrossmodalemotions_tpu import EMOTIONS

    return EmoVoxImdb(
        wav_paths=np.asarray(wav_paths, dtype=object),
        speaker=np.asarray(speakers, dtype=object),
        set_id=np.asarray(sets, np.int32),
        wav_logits=all_logits,
        dense_frames=dense_frames,
        wav_dir=str(root),
        frame_dir=str(root.parent / "frames") if with_frames else "",
        classes=EMOTIONS[:num_emotions],
    )
