"""Flax model definitions: VGG-M speech student, ResNet50/SENet50 teachers."""

from mcncrossmodalemotions_tpu.models.resnet import ResNet, ResNet50, SEBlock, SENet50
from mcncrossmodalemotions_tpu.models.vggm import VGGMStudent, temporal_valid_frames

__all__ = [
    "ResNet",
    "ResNet50",
    "SENet50",
    "SEBlock",
    "VGGMStudent",
    "temporal_valid_frames",
]
