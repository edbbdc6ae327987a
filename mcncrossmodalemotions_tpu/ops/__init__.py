"""L0 compute ops: spectrogram frontend (jnp + fused Pallas TPU kernel)
and the batched affine-warp augmentation engine."""

from mcncrossmodalemotions_tpu.ops.spectrogram import (
    DEFAULT_SPEC,
    SpecConfig,
    instance_norm,
    spectrogram,
    waveform_to_input,
)
from mcncrossmodalemotions_tpu.ops.warp import (
    affine_grid,
    bilinear_sample,
    random_augmentation_thetas,
    resize_bilinear,
    warp_images,
)

__all__ = [
    "DEFAULT_SPEC",
    "SpecConfig",
    "instance_norm",
    "spectrogram",
    "waveform_to_input",
    "affine_grid",
    "bilinear_sample",
    "random_augmentation_thetas",
    "resize_bilinear",
    "warp_images",
]
