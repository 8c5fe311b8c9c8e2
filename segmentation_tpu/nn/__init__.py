from segmentation_tpu.nn import initializers, module, shapes, upsampling
from segmentation_tpu.nn.layers import (
    batch_norm,
    bilinear_resize,
    conv2d,
    conv2d_transpose,
    conv_cond_concat,
    dense,
    dropout,
    fixed_conv2d_transpose,
    flatten,
    lrelu,
    max_pool,
    relu,
)
from segmentation_tpu.nn.shapes import (
    center_crop_like,
    center_crop_or_pad,
    conv_out,
    deconv_out,
    pool_out,
)
from segmentation_tpu.nn.upsampling import (
    bilinear_upsample_weights,
    get_kernel_size,
    upsample_filt,
)

__all__ = [
    "initializers",
    "module",
    "shapes",
    "upsampling",
    "batch_norm",
    "bilinear_resize",
    "conv2d",
    "conv2d_transpose",
    "conv_cond_concat",
    "dense",
    "dropout",
    "fixed_conv2d_transpose",
    "flatten",
    "lrelu",
    "max_pool",
    "relu",
    "center_crop_like",
    "center_crop_or_pad",
    "conv_out",
    "deconv_out",
    "pool_out",
    "bilinear_upsample_weights",
    "get_kernel_size",
    "upsample_filt",
]
