"""Adversarial-training subsystem (Luc et al 2016) — reference §2 #15.

A small conv adversary scores ground-truth label maps vs. predicted softmax
maps; the segmentation loss gains λ·CE(adv(ŷ) → "real") and the adversary
trains with its own low-LR optimizer (reference models/basemodel.py:215-262,
278-303, 317-354; Readme.md:86).

Wiring note (intent vs. broken letter): the reference feeds the raw 1-channel
mask as "real" and the C-channel logits as "fake" (models/basemodel.py:283-285)
— which cannot share conv weights across differing channel counts and is one
of the §2.9 dead paths. Per Luc et al, both inputs must live in the same
space: here real = one_hot(y), fake = softmax(ŷ), both [N,H,W,C].
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from segmentation_tpu.nn import (
    batch_norm,
    bilinear_resize,
    conv2d,
    dense,
    flatten,
    max_pool,
)


@dataclasses.dataclass
class LucAdversary:
    """reference models/basemodel.py:215-262: 4× bilinear downsample →
    2 × [conv(3, stride 2, VALID) + BN + maxpool 2] → flatten + BN →
    FC 1024 + BN → FC 2 logits."""

    n_kernels: int = 36
    downsample: int = 4

    def __call__(self, label_map: jnp.ndarray) -> jnp.ndarray:
        k = self.n_kernels
        h, w = label_map.shape[1], label_map.shape[2]
        # Adaptive: don't downsample maps that are already small (the
        # reference's fixed //4 assumed 256x256+ masks and dies below 64px).
        ds = self.downsample if min(h, w) // self.downsample >= 16 else 1
        net = bilinear_resize(label_map, h // ds, w // ds)
        net = conv2d(net, k, 3, 2, "VALID", name="adv_conv1")
        net = batch_norm(net, name="adv_bn1")
        net = max_pool(net, 2, 2)
        net = conv2d(net, k * 2, 3, 2, "VALID", name="adv_conv2")
        net = batch_norm(net, name="adv_bn2")
        net = max_pool(net, 2, 2)
        net = flatten(net)
        net = batch_norm(net, name="adv_bn3")
        net = dense(net, 1024, name="adv_fc1")
        net = batch_norm(net, name="adv_bn4")
        return dense(net, 2, name="adv_output", activation=None)


@dataclasses.dataclass
class SmallAdversary:
    """MNIST-sized adversary override (reference models/autoencoder.py:
    169-185): conv(8,3,2,VALID) → pool → conv(16,3,2,VALID) → flatten →
    FC 128 → FC 2. (The reference's second dense reads from `flat` — a
    copy-paste slip at :178; we chain them as intended.)"""

    n_kernels: int = 8

    def __call__(self, tensor_in: jnp.ndarray) -> jnp.ndarray:
        k = self.n_kernels
        net = conv2d(tensor_in, k, 3, 2, "VALID", name="adv_conv1_0")
        net = max_pool(net, 2, 2)
        net = conv2d(net, k * 2, 3, 2, "VALID", name="adv_conv1_1")
        net = flatten(net)
        net = dense(net, 128, name="adv_decision_0")
        return dense(net, 2, name="adv_decision_1", activation=None)


def prep_adversary_inputs(logits: jnp.ndarray, masks: jnp.ndarray, n_classes: int):
    """real = one_hot(y) float, fake = softmax(ŷ) — both [N,H,W,C]."""
    if masks.ndim == 4:
        masks = masks[..., 0]
    real = jax.nn.one_hot(masks.astype(jnp.int32), n_classes, dtype=logits.dtype)
    fake = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    return real, fake
