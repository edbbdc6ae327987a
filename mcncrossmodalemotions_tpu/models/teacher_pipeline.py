"""On-device face-image pipeline: uint8 grayscale -> teacher logits.

Replicates the reference's preprocessing chain inside the jitted step
(getBatchFerPlus, ferplus_baselines.m:181-213; getImageBatch,
fetch_emovoxceleb_imdb.m:152-193):

    uint8 grayscale -> float -> [augmentation affine warp | identity]
    -> bilinear resize to the network input size -> replicate to 3
    channels -> subtract the training-mean image.

The reference ran the warp+resize on GPU via vl_nnaffinegrid +
vl_nnbilinearsampler and did random fliplr on the host (:188); here
flip + warp + resize + normalisation all execute on device, so the host
ships 48x48 uint8 (2.3 kB/image) and XLA fuses the whole chain into the
teacher's first conv.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mcncrossmodalemotions_tpu.models.resnet import ResNet
from mcncrossmodalemotions_tpu.ops.warp import (
    identity_theta,
    random_augmentation_thetas,
    warp_images,
)


class FaceTeacherPipeline(nn.Module):
    """Preprocessing + ResNet/SENet teacher as one module.

    Input ``x``: [B, H, W, 1] uint8 (or float) grayscale faces.
    ``mean_rgb``: the dataset mean subtracted after channel replication
    (the released models' ``normalization.averageImage``).
    """

    teacher: ResNet
    input_size: int = 224
    mean_rgb: Any = (131.0912, 103.8827, 91.4953)  # VGGFace2 convention
    augment: bool = True
    flip_prob: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 return_embedding: bool = False):
        b = x.shape[0]
        x = x.astype(jnp.float32)
        if train and self.augment:
            rng = self.make_rng("augment")
            k_flip, k_warp = jax.random.split(rng)
            flip = jax.random.bernoulli(k_flip, self.flip_prob, (b,))
            x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
            theta = random_augmentation_thetas(k_warp, b)
        else:
            theta = identity_theta(b)
        x = warp_images(x, theta, self.input_size, self.input_size)
        x = jnp.repeat(x, 3, axis=-1)  # grayscale -> 3 channels
        x = x - jnp.asarray(self.mean_rgb, jnp.float32)[None, None, None, :]
        return self.teacher(x, train=train, return_embedding=return_embedding)
