"""Flax model definitions: VGG-M speech student, ResNet50/SENet50
teachers, classic VGG face teachers."""

from mcncrossmodalemotions_tpu.models.resnet import ResNet, ResNet50, SEBlock, SENet50
from mcncrossmodalemotions_tpu.models.vggface import VGGFace
from mcncrossmodalemotions_tpu.models.vggm import VGGMStudent, temporal_valid_frames

__all__ = [
    "ResNet",
    "ResNet50",
    "SENet50",
    "SEBlock",
    "VGGFace",
    "VGGMStudent",
    "temporal_valid_frames",
]
