"""Model zoo: build teacher/student models + loss stacks by name.

``emoVoxZoo`` / ``ferPlusZoo`` equivalents (emoVoxCeleb/emoVoxZoo.m,
teacher/ferPlusZoo.m). The reference loads pretrained .mat DAGs and
performs dynamic graph surgery (strip losses, resize head, swap pooling);
here surgery is static configuration: constructors take ``num_outputs``,
loss type and dropout, and return (model, loss_fn, class_names).
"""

from mcncrossmodalemotions_tpu.zoo.registry import (
    build_student,
    build_teacher,
    load_pretrained_student,
    load_pretrained_teacher,
    prepare_classic_from_base,
    prepare_teacher_from_base,
    student_loss_fn,
    teacher_loss_fn,
)

__all__ = [
    "build_student",
    "build_teacher",
    "load_pretrained_student",
    "load_pretrained_teacher",
    "prepare_classic_from_base",
    "prepare_teacher_from_base",
    "student_loss_fn",
    "teacher_loss_fn",
]
