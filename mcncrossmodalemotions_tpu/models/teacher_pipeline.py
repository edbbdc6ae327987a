"""On-device face-image pipeline: uint8 grayscale -> teacher logits.

Replicates the reference's preprocessing chain
(getBatchFerPlus, ferplus_baselines.m:181-213; getImageBatch,
fetch_emovoxceleb_imdb.m:152-193):

    uint8 grayscale [-> host affine augmentation, train only]
    -> random fliplr (device, train only)
    -> bilinear resize to the network input size (device)
    -> replicate to 3 channels -> subtract the training-mean image.

Split of responsibilities (changed from the reference's all-GPU path for
TPU reasons): the zoom/rotate/skew affine warp runs on the HOST at the
native 48x48 resolution inside the batch loader
(data/ferplus.ferplus_batches augment=True, ops/warp.warp_images_np) —
an arbitrary-affine bilinear sample is a scattered gather, which the TPU
runtime compiles/executes pathologically; at 48x48 on CPU it is
microseconds per image. The device keeps the regular work: fliplr is a
lane reversal, the 48->224 resize is a separable align-corners
bilinear (two HIGHEST-precision MXU matmuls, ops/warp.resize_separable), and replicate+mean-subtract fuse into the
teacher's first conv.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mcncrossmodalemotions_tpu.models.resnet import ResNet


class FaceTeacherPipeline(nn.Module):
    """Device preprocessing + ResNet/SENet teacher as one module.

    Input ``x``: [B, H, W, 1] uint8 (or float) grayscale faces,
    already host-augmented in train mode.
    ``mean_rgb``: the dataset mean subtracted after channel replication
    (the released models' ``normalization.averageImage``).
    """

    teacher: ResNet
    input_size: int = 224
    mean_rgb: Any = (131.0912, 103.8827, 91.4953)  # VGGFace2 convention
    augment: bool = True  # device part of augmentation: random fliplr
    flip_prob: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 return_embedding: bool = False,
                 pad_mask: jax.Array | None = None):
        b = x.shape[0]
        x = x.astype(jnp.float32)
        if train and self.augment:
            rng = self.make_rng("augment")
            flip = jax.random.bernoulli(rng, self.flip_prob, (b,))
            x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
        if x.shape[1] != self.input_size or x.shape[2] != self.input_size:
            from mcncrossmodalemotions_tpu.ops.warp import resize_separable

            x = resize_separable(x, self.input_size, self.input_size)
        x = jnp.repeat(x, 3, axis=-1)  # grayscale -> 3 channels
        x = x - jnp.asarray(self.mean_rgb, jnp.float32)[None, None, None, :]
        return self.teacher(x, train=train, return_embedding=return_embedding,
                            pad_mask=pad_mask)
