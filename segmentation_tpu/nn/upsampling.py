"""Bilinear upsampling kernel factory.

Numpy construction of per-class bilinear transposed-conv kernels, matching the
reference exactly (reference utils/upsampling.py:6-46): a [k, k, C, C] kernel,
diagonal over the class dim, each diagonal plane the separable triangle filter;
k = 2f - f % 2. Consumed by the FCN heads (segmentation_tpu.models.fcn).
"""

from __future__ import annotations

import numpy as np


def get_kernel_size(factor: int) -> int:
    """Kernel size for a desired upsampling factor (utils/upsampling.py:6-10)."""
    return 2 * factor - factor % 2


def upsample_filt(size: int) -> np.ndarray:
    """2D bilinear kernel of the given size (utils/upsampling.py:13-24)."""
    factor = (size + 1) // 2
    if size % 2 == 1:
        center = factor - 1.0
    else:
        center = factor - 0.5
    og = np.ogrid[:size, :size]
    return (1 - abs(og[0] - center) / factor) * (
        1 - abs(og[1] - center) / factor
    )


def bilinear_upsample_weights(factor: int, number_of_classes: int) -> np.ndarray:
    """[k, k, C, C] transposed-conv weights initialized to per-class bilinear
    interpolation (utils/upsampling.py:27-46). HWIO layout."""
    filter_size = get_kernel_size(factor)
    weights = np.zeros(
        (filter_size, filter_size, number_of_classes, number_of_classes),
        dtype=np.float32,
    )
    kernel = upsample_filt(filter_size)
    for i in range(number_of_classes):
        weights[:, :, i, i] = kernel
    return weights
