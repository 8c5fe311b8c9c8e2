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


def upsample_matrix(factor: int, in_size: int) -> np.ndarray:
    """[out_size, in_size] 1-D upsampling operator M such that M @ x equals
    the transposed convolution of x with the bilinear kernel of this factor
    (stride=factor, VALID → out_size = (in_size-1)*factor + 2f - f%2).

    The 2-D bilinear transposed conv is separable (k2d = k1d ⊗ k1d, and the
    class dim is diagonal — utils/upsampling.py semantics), so the whole FCN
    upsampling head is two banded matmuls: y = M_h X M_w^T per class. On TPU
    this runs on the MXU instead of XLA's input-dilated convolution path.
    """
    k = get_kernel_size(factor)
    # the 1-D triangle whose outer product is upsample_filt(k)
    f2 = (k + 1) // 2
    center = f2 - 1.0 if k % 2 == 1 else f2 - 0.5
    k1d = 1 - abs(np.arange(k) - center) / f2
    out_size = (in_size - 1) * factor + k
    m = np.zeros((out_size, in_size), np.float32)
    for q in range(in_size):
        m[q * factor : q * factor + k, q] += k1d
    return m


def upsample_separable(x, factor: int, crop_to=None):
    """Bilinear transposed-conv upsampling of NHWC ``x`` as two matmuls,
    numerically identical to ``fixed_conv2d_transpose(x,
    bilinear_upsample_weights(factor, C), factor, 'VALID')`` (and to the
    SAME-padded variant when ``crop_to`` trims the halo). Keeps dtype."""
    import jax.numpy as jnp

    n, h, w, c = x.shape
    mh = jnp.asarray(upsample_matrix(factor, h), x.dtype)
    mw = jnp.asarray(upsample_matrix(factor, w), x.dtype)
    # [N,H,W,C] -> H-upsample -> W-upsample, batching (N, C) dims
    y = jnp.einsum("ph,nhwc->npwc", mh, x)
    y = jnp.einsum("qw,npwc->npqc", mw, y)
    if crop_to is not None:
        th, tw = crop_to
        oh = (y.shape[1] - th) // 2
        ow = (y.shape[2] - tw) // 2
        y = y[:, oh : oh + th, ow : ow + tw, :]
    return y


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
