from segmentation_tpu.nn.pallas.augment import (
    fused_augment,
    pallas_crop_normalize,
)

__all__ = ["fused_augment", "pallas_crop_normalize"]
