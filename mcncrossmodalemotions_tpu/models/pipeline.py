"""On-device audio pipeline: waveform -> spectrogram -> student logits.

The reference computed spectrograms on the host inside the batch loader
(getBatchEmoVoxCeleb.m:162) — its throughput bottleneck. Here the
frontend runs inside the jitted step, so the host ships raw 4 s waveform
crops (0.25 MB/utt) and the STFT + instance norm execute on the TPU
(MXU matmul DFT, optionally the fused Pallas kernel), fused by XLA into
the same program as the conv stack and backward pass.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mcncrossmodalemotions_tpu.models.vggm import VGGMStudent
from mcncrossmodalemotions_tpu.ops.spectrogram import (
    DEFAULT_SPEC,
    SpecConfig,
    waveform_to_input,
)


class AudioStudentPipeline(nn.Module):
    """Frontend + VGG-M student as one Flax module.

    Input ``x``: [B, N] float32 waveforms. The spectrogram gradient is
    stopped — the frontend has no parameters and the reference's input
    layer likewise receives no gradient.
    """

    spec: SpecConfig = DEFAULT_SPEC
    num_outputs: int = 8
    dropout_rate: float = 0.0
    use_pallas_frontend: bool = False
    fc6_features: int = 4096
    fc7_features: int = 1024
    head_init_scale: float = 1e-4  # emoVoxZoo.m:210-243 scratch init
    conv1_s2d: bool = True  # models/vggm.SpaceToDepthConv1 (same params)

    def setup(self):
        # Constructed here (never passed in) so the submodule is always
        # named 'net' — a passed bound module would be named after the
        # dataclass field instead, breaking checkpoint compatibility.
        self.net = VGGMStudent(
            num_outputs=self.num_outputs,
            dropout_rate=self.dropout_rate,
            fc6_features=self.fc6_features,
            fc7_features=self.fc7_features,
            head_init_scale=self.head_init_scale,
            conv1_s2d=self.conv1_s2d,
        )

    def frontend(self, x: jax.Array, valid_frames=None) -> jax.Array:
        # int16 PCM decode happens inside the spectrogram ops (shared by
        # every consumer of the batchers' compact feed format).
        feats = waveform_to_input(x, self.spec, valid_frames=valid_frames,
                                  use_pallas=self.use_pallas_frontend)
        return jax.lax.stop_gradient(feats)

    def __call__(self, x: jax.Array, train: bool = False,
                 valid_frames=None, return_embedding: bool = False,
                 pad_mask=None):
        feats = self.frontend(x, valid_frames=valid_frames)
        return self.net(feats, train=train, valid_frames=valid_frames,
                        return_embedding=return_embedding,
                        pad_mask=pad_mask)
