"""ResNet-50 / SE-ResNet-50 facial-emotion teacher networks (Flax).

Capability parity with the reference teachers ``resnet50-ferplus`` and
``senet50-ferplus`` (ResNet-50 / SE-ResNet-50, VGGFace2-pretrained,
224x224x3 grayscale-replicated mean-subtracted input, 8-way head —
README.md:38-41, ferPlusZoo.m:37-92, fetch_emovoxceleb_imdb.m:155-193).
The layer stacks live in the released .mat files, not reference code;
these are native Flax definitions of the same architectures.

TPU-first choices: NHWC layout, bfloat16 compute with fp32 params and
fp32 BatchNorm statistics, a single fused bn+relu epilogue per conv
(XLA fuses), SE squeeze-excite as two tiny MXU matmuls. The classifier
head follows the reference's fine-tune recipe: fresh init at scale 1/100
(ferPlusZoo.m:136-199).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_STAGE_SIZES = {50: (3, 4, 6, 3)}


class SEBlock(nn.Module):
    """Squeeze-and-excitation: global-pool -> FC/16 -> ReLU -> FC -> sigmoid."""

    features: int
    reduction: int = 16
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        squeezed = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        hidden = nn.Dense(self.features // self.reduction, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="fc1")(
            squeezed.astype(self.dtype))
        hidden = nn.relu(hidden)
        gate = nn.Dense(self.features, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(hidden)
        gate = nn.sigmoid(gate.astype(jnp.float32)).astype(x.dtype)
        return x * gate[:, None, None, :]


class Bottleneck(nn.Module):
    """ResNet-v1 bottleneck (1x1 -> 3x3 -> 1x1, expansion 4), optional SE."""

    features: int
    strides: int = 1
    use_se: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 bn_mask: jax.Array | None = None) -> jax.Array:
        conv_kw = dict(use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)

        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=name)(h, mask=bn_mask)

        residual = x
        # Downsampling stride sits on the FIRST 1x1 (the Caffe
        # convention of the released VGGFace2/SENet teachers — layer
        # naming conv{s}_{b}_1x1_reduce descends from the original
        # He/SENet Caffe prototxts, which stride the reduce conv), NOT
        # on the 3x3 as in torchvision's v1.5 variant. Imported released
        # weights must downsample at the same layer they were trained
        # with or every stage-entry activation shifts.
        y = nn.Conv(self.features, (1, 1),
                    strides=(self.strides, self.strides),
                    name="conv1", **conv_kw)(x)
        y = nn.relu(bn(y, "bn1"))
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    name="conv2", **conv_kw)(y)
        y = nn.relu(bn(y, "bn2"))
        y = nn.Conv(self.features * 4, (1, 1), name="conv3", **conv_kw)(y)
        y = bn(y, "bn3")
        if self.use_se:
            y = SEBlock(self.features * 4, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               name="downsample", **conv_kw)(x)
            residual = bn(residual, "bn_down")
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-v1 with optional SE blocks; 8-way emotion head by default.

    ``num_outputs=8`` mirrors the FERPlus 'CNTK' class set; pass 10 for the
    reference's 'full' dataType (ferplus_baselines.m:87-92).
    """

    num_outputs: int = 8
    depth: int = 50
    stage_sizes: Sequence[int] | None = None  # override for tiny test configs
    use_se: bool = False
    width: int = 64
    dropout_rate: float = 0.0  # ferPlusZoo insert_dropout (:213-233).
                               # DELIBERATE DEVIATION (PARITY.md): the
                               # reference inserts dropout after the
                               # last TWO conv layers
                               # (convLayers(end-2:end-1)); here a
                               # single dropout acts on the pooled
                               # embedding before the head — one mask
                               # instead of two spatial masks inside
                               # the final bottleneck
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    head_init_scale: float = 0.01  # ferPlusZoo.m head re-init, scale 1/100

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 return_embedding: bool = False,
                 pad_mask: jax.Array | None = None):
        x = x.astype(self.dtype)
        # see models/vggm.py: exact BN stats over valid rows of a ragged
        # mesh-padded batch (pad_mask 1 = real sample, 0 = padding)
        bn_mask = (None if pad_mask is None
                   else (pad_mask > 0).reshape((-1, 1, 1, 1)))
        x = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="bn1")(x, mask=bn_mask)
        x = nn.relu(x)
        # Caffe pad-0 CEIL-mode pool (the released teachers' geometry):
        # windows start at row/col 0 with a one-pixel bottom/right pad
        # for the final partial window — flax padding [(0,1),(0,1)].
        # Symmetric (1,1) padding would give the same 56x56 shape but
        # with every window shifted one pixel up-left of how the
        # released weights were trained.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1), (0, 1)])
        stage_sizes = self.stage_sizes or _STAGE_SIZES[self.depth]
        for stage, num_blocks in enumerate(stage_sizes):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = Bottleneck(
                    self.width * (2 ** stage),
                    strides=strides,
                    use_se=self.use_se,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train, bn_mask=bn_mask)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global average pool
        embedding = x
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(
            self.num_outputs,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(self.head_init_scale),
            name="prediction",
        )(x)
        if return_embedding:
            return logits, embedding
        return logits


def ResNet50(**kw) -> ResNet:
    """resnet50-ferplus equivalent."""
    return ResNet(depth=50, use_se=False, **kw)


def SENet50(**kw) -> ResNet:
    """senet50-ferplus equivalent (SE-ResNet-50)."""
    return ResNet(depth=50, use_se=True, **kw)
