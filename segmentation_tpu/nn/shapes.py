"""Static shape algebra for VALID/SAME convolution and crop contracts.

The reference's U-Net depends on exact VALID-padding arithmetic with
center-crop-and-concat skips (reference models/unet.py:109-175) and on
``tf.image.resize_image_with_crop_or_pad`` semantics for aligning labels to
shrunken logits (reference models/basemodel.py:412-417, models/unet.py:171-174).
Off-by-ones here silently destroy mIoU parity (SURVEY §7 hard part 1), so the
algebra lives in one place with property tests against it.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def conv_out(size: int, kernel: int, stride: int, padding: str) -> int:
    """Output spatial size of a convolution (TF semantics).

    VALID: ceil((size - kernel + 1) / stride); SAME: ceil(size / stride).
    """
    if padding == "VALID":
        return -(-(size - kernel + 1) // stride)
    if padding == "SAME":
        return -(-size // stride)
    raise ValueError(padding)


def pool_out(size: int, window: int, stride: int, padding: str = "VALID") -> int:
    return conv_out(size, window, stride, padding)


def deconv_out(size: int, kernel: int, stride: int, padding: str) -> int:
    """Output size of conv2d_transpose (TF semantics)."""
    if padding == "VALID":
        return (size - 1) * stride + kernel
    if padding == "SAME":
        return size * stride
    raise ValueError(padding)


def center_crop_or_pad(x: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """``tf.image.resize_image_with_crop_or_pad`` for NHWC batches.

    Center-crops dims that are too large and zero-pads (centered, extra pixel
    on the bottom/right) dims that are too small — bit-matching TF's
    offset = (excess) // 2 convention. Shapes are static → pure slicing/pad,
    fuses into neighbors under XLA.
    """
    n, h, w, c = x.shape
    # Crop phase
    if h > th:
        off = (h - th) // 2
        x = x[:, off : off + th, :, :]
    if w > tw:
        off = (w - tw) // 2
        x = x[:, :, off : off + tw, :]
    # Pad phase
    h, w = x.shape[1], x.shape[2]
    if h < th or w < tw:
        ph, pw = th - h, tw - w
        x = jnp.pad(
            x,
            (
                (0, 0),
                (ph // 2, ph - ph // 2),
                (pw // 2, pw - pw // 2),
                (0, 0),
            ),
        )
    return x


def center_crop_like(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Crop/pad ``x`` spatially to match ``target`` (the U-Net skip-connection
    crop, reference models/unet.py:97-106, 140/147/154/161)."""
    return center_crop_or_pad(x, target.shape[1], target.shape[2])


def unet_output_hw(in_hw: Tuple[int, int], levels: int = 4) -> Tuple[int, int]:
    """Static output size of the VALID-padded U-Net
    (segmentation_tpu.models.unet) for a given input size."""

    def down(s):
        for _ in range(levels):
            s = conv_out(conv_out(s, 3, 1, "VALID"), 3, 1, "VALID")
            s = pool_out(s, 2, 2)
        return conv_out(conv_out(s, 3, 1, "VALID"), 3, 1, "VALID")

    def up(s):
        for _ in range(levels):
            s = deconv_out(s, 2, 2, "VALID")
            s = conv_out(conv_out(s, 3, 1, "VALID"), 3, 1, "VALID")
        return s

    return tuple(up(down(s)) for s in in_hw)  # type: ignore[return-value]
