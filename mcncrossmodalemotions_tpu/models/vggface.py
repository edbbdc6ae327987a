"""Classic VGG face teachers (VGG-M and VGG-Very-Deep-16), TPU-first.

The reference's teacher zoo also registers the pre-ResNet face models
(ferPlusZoo.m:44-59 standardModels/ferModels/sfewModels): ``vgg_face`` /
``vgg-vd-face*`` are VGG-VD-16 stacks and ``vgg-m-face-bn*`` are VGG-M
stacks, selectable as FER+ fine-tuning starting points exactly like the
ResNet bases. The classics ship WITHOUT BatchNorm; the reference's
``useBnorm`` option (ferPlusZoo.m:123, insertBNLayers) retrofits BN
after every conv — here that is the ``use_batchnorm`` constructor flag
(the ``-bn`` model names default it on).

TPU-first choices mirror the other model files: NHWC, bfloat16 compute
with fp32 params, fc6/fc7 as full-spatial VALID convs (the MXU-friendly
form of MatConvNet's fully-connected-as-conv layers), fp32 head.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Per-block 3x3 conv widths of VGG-VD-16 (vgg_face, Parkhi et al.);
# 2x2/s2 max-pool after each block.
VD16_BLOCKS: Tuple[Tuple[int, ...], ...] = (
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))


class VGGFace(nn.Module):
    """VGG-M ('m') or VGG-VD-16 ('vd') face network.

    Input: [B, S, S, 3] mean-subtracted faces (224 for the released
    geometry). Output: [B, num_outputs] logits; ``return_embedding``
    also yields the fc7 features.
    """

    arch: str = "vd"               # 'vd' (16-layer) | 'm' (VGG-M)
    num_outputs: int = 8
    use_batchnorm: bool = False    # useBnorm insertion (ferPlusZoo.m:123)
    fc_features: int = 4096
    width_multiplier: float = 1.0  # tiny test configs
    dropout_rate: float = 0.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    head_init_scale: float = 0.01  # ferPlusZoo head re-init, scale 1/100

    def _w(self, channels: int) -> int:
        return max(8, int(round(channels * self.width_multiplier)))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 return_embedding: bool = False,
                 pad_mask: jax.Array | None = None):
        conv_kw = dict(use_bias=not self.use_batchnorm, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        # see models/vggm.py: exact BN stats over valid rows of a ragged
        # mesh-padded batch (pad_mask 1 = real sample, 0 = padding)
        bn_mask = (None if pad_mask is None
                   else (pad_mask > 0).reshape((-1, 1, 1, 1)))

        def bn_relu(h, name):
            if self.use_batchnorm:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"bn_{name}")(h, mask=bn_mask)
            return nn.relu(h)

        x = x.astype(self.dtype)
        if self.arch == "vd":
            for b, widths in enumerate(VD16_BLOCKS, start=1):
                for c, width in enumerate(widths, start=1):
                    x = nn.Conv(self._w(width), (3, 3), padding="SAME",
                                name=f"conv{b}_{c}", **conv_kw)(x)
                    x = bn_relu(x, f"conv{b}_{c}")
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        elif self.arch == "m":
            # VGG-M: 7x7/s2-96, pool3/2; 5x5/s2-256, pool3/2; 3x3x(512,
            # 512, 512); pool3/2 (Chatfield et al. geometry). Pools carry
            # MatConvNet's [0 1 0 1] pad (ceil semantics), which is what
            # makes the released 224 geometry come out 109 -> 54 -> 26 ->
            # 13 -> 6 and fc6 a 6x6 kernel — plain VALID pools would give
            # a 5x5 fc6 and released weights could not load.
            ceil_pad = ((0, 1), (0, 1))
            x = nn.Conv(self._w(96), (7, 7), strides=(2, 2), padding="VALID",
                        name="conv1", **conv_kw)(x)
            x = bn_relu(x, "conv1")
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=ceil_pad)
            x = nn.Conv(self._w(256), (5, 5), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], name="conv2", **conv_kw)(x)
            x = bn_relu(x, "conv2")
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=ceil_pad)
            for i in (3, 4, 5):
                x = nn.Conv(self._w(512), (3, 3), padding="SAME",
                            name=f"conv{i}", **conv_kw)(x)
                x = bn_relu(x, f"conv{i}")
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=ceil_pad)
        else:
            raise ValueError(f"unknown VGGFace arch {self.arch!r}")

        # fc6/fc7 as convs (MatConvNet convention): fc6 consumes the full
        # remaining spatial extent, fc7 is 1x1.
        x = nn.Conv(self._w(self.fc_features), (x.shape[1], x.shape[2]),
                    padding="VALID", name="fc6", **conv_kw)(x)
        x = bn_relu(x, "fc6")
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Conv(self._w(self.fc_features), (1, 1), padding="VALID",
                    name="fc7", **conv_kw)(x)
        x = bn_relu(x, "fc7")
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        embedding = x
        logits = nn.Dense(
            self.num_outputs, dtype=jnp.float32,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(self.head_init_scale),
            name="prediction")(x)
        if return_embedding:
            return logits, embedding
        return logits
