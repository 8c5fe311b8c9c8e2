from segmentation_tpu.data.augment import (
    device_augment,
    host_joint_random_crop,
    one_hot_mask,
)
from segmentation_tpu.data.datasets import (
    ImageDataSet,
    ImageMaskDataSet,
    MNISTDataSet,
    load_images,
)
from segmentation_tpu.data.decode import decode_image
from segmentation_tpu.data.pipeline import DevicePrefetcher, GeneratorDataSet
from segmentation_tpu.data.synthetic import (
    SyntheticImages,
    SyntheticSegmentation,
)

__all__ = [
    "device_augment",
    "host_joint_random_crop",
    "one_hot_mask",
    "ImageDataSet",
    "ImageMaskDataSet",
    "MNISTDataSet",
    "load_images",
    "decode_image",
    "DevicePrefetcher",
    "GeneratorDataSet",
    "SyntheticImages",
    "SyntheticSegmentation",
]
