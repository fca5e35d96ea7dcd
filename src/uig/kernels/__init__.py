from uig.kernels.augment import (
    augment,
    augment_batch,
    center_crop_normalize,
    denormalize_to_u8,
    resize_bilinear,
)

__all__ = [
    "augment",
    "augment_batch",
    "center_crop_normalize",
    "denormalize_to_u8",
    "resize_bilinear",
]
