"""Augmentation — host (numpy) and device (jit-fused) variants.

Semantics replicate the reference's preprocessing chain exactly
(reference utils/datasets.py:176-190): normalize /255, concatenate image+mask
so spatial transforms stay joint, random crop to [crop, crop], split back.
The device variant fuses normalize + joint random crop + random flip +
one-hot mask encode (the onehot_image.py semantics) into one XLA program —
per-sample crops are a gather, flips a select; everything static-shaped so
it fuses into the consuming train step.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- host
def host_joint_random_crop(
    rng: np.random.Generator,
    image: np.ndarray,
    mask: Optional[np.ndarray],
    crop: int,
    flip: bool = False,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Numpy joint crop used by the decode workers. image HWC uint8."""
    h, w = image.shape[:2]
    if h < crop or w < crop:
        ph, pw = max(0, crop - h), max(0, crop - w)
        image = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        if mask is not None:
            mask = np.pad(mask, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = image.shape[:2]
    y = int(rng.integers(0, h - crop + 1))
    x = int(rng.integers(0, w - crop + 1))
    image = image[y : y + crop, x : x + crop]
    if mask is not None:
        mask = mask[y : y + crop, x : x + crop]
    if flip and rng.random() < 0.5:
        image = image[:, ::-1]
        if mask is not None:
            mask = mask[:, ::-1]
    return image, mask


# ------------------------------------------------------------------- device
@functools.partial(jax.jit, static_argnames=("crop", "flip", "n_classes"))
def device_augment(
    key: jax.Array,
    images_u8: jax.Array,  # [N, H, W, C] uint8 staging batch
    masks_u8: Optional[jax.Array],  # [N, H, W, 1] uint8 or None
    crop: int,
    flip: bool = True,
    n_classes: int = 0,
):
    """Fused device-side pipeline tail: /255 normalize + joint random crop +
    joint random horizontal flip (+ optional one-hot mask encode when
    n_classes > 0). One program; XLA fuses the arithmetic into the gather.

    Returns (images f32 [N,crop,crop,C], masks uint8 [N,crop,crop,1] or
    one-hot f32 [N,crop,crop,n_classes] or None).
    """
    n, h, w, _ = images_u8.shape
    k_y, k_x, k_f = jax.random.split(key, 3)
    ys = jax.random.randint(k_y, (n,), 0, h - crop + 1)
    xs = jax.random.randint(k_x, (n,), 0, w - crop + 1)
    flips = (
        jax.random.bernoulli(k_f, 0.5, (n,))
        if flip
        else jnp.zeros((n,), bool)
    )

    def one(img, msk, y, x, fl):
        img = jax.lax.dynamic_slice(
            img, (y, x, 0), (crop, crop, img.shape[-1])
        )
        img = jnp.where(fl, img[:, ::-1], img)
        out_m = None
        if msk is not None:
            msk = jax.lax.dynamic_slice(
                msk, (y, x, 0), (crop, crop, msk.shape[-1])
            )
            msk = jnp.where(fl, msk[:, ::-1], msk)
            out_m = msk
        return img, out_m

    if masks_u8 is None:
        imgs, _ = jax.vmap(lambda i, y, x, f: one(i, None, y, x, f))(
            images_u8, ys, xs, flips
        )
        masks_out = None
    else:
        imgs, masks_out = jax.vmap(one)(images_u8, masks_u8, ys, xs, flips)

    imgs = imgs.astype(jnp.float32) / 255.0
    if masks_out is not None and n_classes > 0:
        masks_out = jax.nn.one_hot(
            masks_out[..., 0].astype(jnp.int32), n_classes
        )
    return imgs, masks_out


def one_hot_mask(mask: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """tf.one_hot mask encoding verified by reference examples/onehot_image.py."""
    if mask.ndim == 4:
        mask = mask[..., 0]
    return jax.nn.one_hot(mask.astype(jnp.int32), n_classes)
