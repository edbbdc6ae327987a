"""VGG-M ("VGGVox"-style) speech student network, TPU-first Flax module.

Capability parity with the reference's ``emovoxceleb-student`` model
(emoVoxZoo.m:25-31; architecture lives in the released .mat, a VGGVox
VGG-M audio CNN over 512 x (100*seconds) x 1 spectrograms with a
duration-dependent temporal average pool `pool6` — emoVoxZoo.m:256-269,
compute_audio_feats.m:45-46,116-126).

TPU-native redesign decisions:

- **Masked temporal mean-pool replaces dynamic graph surgery.** The
  reference swaps ``pool6.poolSize=[1 p]`` per duration bucket (a dynamic
  per-sample graph mutation — compute_audio_feats.m:121-125). Here the
  module computes a mean over *valid* temporal positions derived from
  ``valid_frames`` (the unpadded spectrogram length), so one compiled
  graph serves every duration bucket with static shapes.
- NHWC layout ([B, F=512, T, 1]) so convolutions map directly onto the
  MXU; compute in bfloat16 with fp32 params and fp32 pooling/head.
- BatchNorm after every conv (VGGVox convention), fused by XLA.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

def _floor_out(size, kernel, stride):
    """VALID conv/pool output size; works on ints and traced arrays."""
    return (size - kernel) // stride + 1


def temporal_valid_frames(w, same_pad_convs: bool = True):
    """Map valid input spectrogram frames -> valid columns at fc6 output.

    Mirrors the conv-stack arithmetic of ``VGGMStudent`` below: conv1 s2,
    mpool1 3/2, conv2 s2, mpool2 3/2, (conv3-5 SAME), mpool5 3/2 in time.
    For the reference 4 s crop (400 frames) this yields 11 — the same
    temporal extent the reference pools with ``pool6=[1 11]``
    (emoVoxZoo.m:256-269 bucket table).
    """
    w = _floor_out(w, 7, 2)   # conv1
    w = _floor_out(w, 3, 2)   # mpool1
    w = _floor_out(w, 5, 2)   # conv2
    w = _floor_out(w, 3, 2)   # mpool2
    w = _floor_out(w, 3, 2)   # mpool5 (time stride 2)
    return w


class SpaceToDepthConv1(nn.Module):
    """conv1 in space-to-depth form: 7x7/s2 on Cin=1 == 4x4/s1 on Cin=4.

    A 1-input-channel 7x7 conv gives the MXU no contraction depth, and
    its INPUT-gradient (a stride-2 transposed conv back to the
    [B, 512, 400, 1] layout) is the single most layout-hostile op in the
    student's backward. Re-laying input (2x2 space-to-depth) and kernel
    (in-graph, from the CANONICAL [7, 7, Cin, F] param — zero-padded to
    8x8 then regrouped) turns it into a stride-1 Cin=4 conv: measured on
    v5e at the train shape, fwd 4.43 -> 4.10 ms and fwd+bwd
    18.77 -> 9.86 ms (1.9x; tools/probe_conv1_s2d.py, docs/PERF.md).

    Because the parameter stays [7, 7, Cin, F] with the same name/path,
    checkpoints, released-weight import (zoo/matconvnet.py) and surgery
    are untouched; gradients flow through the re-lay back to the
    canonical layout. Falls back to the caller's plain conv for odd
    spatial extents (the s2d grid needs even H and W).
    """

    features: int = 96
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from jax import lax

        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features), self.param_dtype)
        b, h, w, c = x.shape
        z = x.reshape(b, h // 2, 2, w // 2, 2, c)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        # w2[a, b, (2di+dj)*cin + c, f] = kernel[2a+di, 2b+dj, c, f]
        wp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        w2 = wp.reshape(4, 2, 4, 2, cin, self.features)
        w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin,
                                                    self.features)
        dn = lax.conv_dimension_numbers(z.shape, w2.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            z.astype(self.dtype), w2.astype(self.dtype),
            window_strides=(1, 1), padding="VALID", dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class VGGMStudent(nn.Module):
    """VGG-M audio emotion student.

    Input: spectrogram [B, 512, T, 1] (freq-major, instance-normalised).
    Output: logits [B, num_outputs] (plus the 1024-d embedding via
    ``capture_intermediates`` or ``return_embedding``).
    """

    num_outputs: int = 8
    fc6_features: int = 4096
    fc7_features: int = 1024
    dropout_rate: float = 0.0
    use_batchnorm: bool = True
    conv1_s2d: bool = True  # space-to-depth conv1 (SpaceToDepthConv1);
                            # identical params/geometry, 1.9x fwd+bwd
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    head_init_scale: float = 1e-4  # reference scratch head init (emoVoxZoo.m:210-243)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 valid_frames: Optional[jax.Array] = None,
                 return_embedding: bool = False,
                 pad_mask: Optional[jax.Array] = None):
        conv_kw = dict(
            use_bias=not self.use_batchnorm,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        x = x.astype(self.dtype)
        # [B] pad_mask (1 = real row, 0 = mesh-padding duplicate) makes
        # train-mode BN statistics EXACT over the valid rows of a ragged
        # padded batch — matching the reference engine, which simply ran
        # the smaller final batch (cnn_train_dag's getBatch loop).
        bn_mask = (None if pad_mask is None
                   else (pad_mask > 0).reshape((-1, 1, 1, 1)))

        def bn_relu(h, name):
            if self.use_batchnorm:
                h = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"bn{name}",
                )(h, mask=bn_mask)
            return nn.relu(h)

        # conv1 .. conv5 with interleaved max-pools (VGGVox VGG-M stack)
        if self.conv1_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = SpaceToDepthConv1(
                features=96, use_bias=not self.use_batchnorm,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="conv1")(x)
        else:  # odd extents: the s2d grid doesn't tile — plain conv
            x = nn.Conv(96, (7, 7), strides=(2, 2), padding="VALID",
                        name="conv1", **conv_kw)(x)
        x = checkpoint_name(x, "conv1_out")
        # checkpoint_name tags are identity ops unless the train step
        # wraps the loss in jax.checkpoint with a names-based policy
        # (train/state.py resolve_remat_policy); they let remat policies
        # target the big early activations (relu1 out is 1.17 GB bf16 at
        # the bs128 train shape) without restructuring the module.
        x = bn_relu(x, "1")
        x = checkpoint_name(x, "relu1_out")
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = checkpoint_name(x, "pool1_out")
        x = nn.Conv(256, (5, 5), strides=(2, 2), padding="VALID", name="conv2", **conv_kw)(x)
        x = bn_relu(x, "2")
        x = checkpoint_name(x, "relu2_out")
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = checkpoint_name(x, "pool2_out")
        x = nn.Conv(384, (3, 3), padding="SAME", name="conv3", **conv_kw)(x)
        x = bn_relu(x, "3")
        x = nn.Conv(256, (3, 3), padding="SAME", name="conv4", **conv_kw)(x)
        x = bn_relu(x, "4")
        x = nn.Conv(256, (3, 3), padding="SAME", name="conv5", **conv_kw)(x)
        x = bn_relu(x, "5")
        x = nn.max_pool(x, (5, 3), strides=(3, 2), padding="VALID")
        x = checkpoint_name(x, "pool5_out")

        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        # fc6: 9x1 conv collapses the frequency axis -> [B, 1, T', 4096]
        x = nn.Conv(self.fc6_features, (x.shape[1], 1), padding="VALID",
                    name="fc6", **conv_kw)(x)
        x = bn_relu(x, "6")
        x = checkpoint_name(x, "fc6_out")

        # pool6: masked temporal mean (replaces per-bucket poolSize surgery)
        x = x.astype(jnp.float32)
        t_out = x.shape[2]
        if valid_frames is None:
            x = jnp.mean(x, axis=(1, 2))  # [B, C]
        else:
            valid = temporal_valid_frames(jnp.asarray(valid_frames))
            valid = jnp.clip(valid, 1, t_out)
            mask = (jnp.arange(t_out)[None, :] < valid[:, None]).astype(x.dtype)
            x = jnp.sum(x[:, 0] * mask[:, :, None], axis=1) / valid[:, None].astype(x.dtype)

        x = nn.Dense(self.fc7_features, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc7")(x.astype(self.dtype))
        x = nn.relu(x)
        # embedding = post-fc7 features (class docstring), captured
        # BEFORE dropout so train-mode extraction isn't dropout-masked
        embedding = x.astype(jnp.float32)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        logits = nn.Dense(
            self.num_outputs,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(self.head_init_scale),
            name="prediction",
        )(x.astype(jnp.float32))
        if return_embedding:
            return logits, embedding
        return logits
