"""FCN-{32,16,8}s (Long et al 2015).

Re-implementation of reference models/fcn.py:106-220: a SAME-padded VGG-ish
encoder to stride 32 with exposed pool3/pool4 taps and a 1×1 class reduction,
plus heads that upsample with FIXED bilinear-initialized transposed
convolutions (reference models/fcn.py:138-142) and fuse 1×1-scored skips by
crop-and-add (reference models/fcn.py:159-174, 192-216). Output is forced to
the input size (IN_OUT_EQUAL after the final crop).

Encoder channel plan (reference models/fcn.py:110-128): conv widths
k×{1,2,4,8,8} between pools, then 1×1 convs at k×32, k×32, n_classes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.nn import (
    center_crop_or_pad,
    conv2d,
    dropout,
    max_pool,
)
from segmentation_tpu.nn.upsampling import upsample_separable


@dataclasses.dataclass
class FCN:
    cfg: ModelConfig

    IN_OUT_EQUAL = True
    IN_OUT_CROP = False
    IN_OUT_RATIO = False
    model_name = "FCN"

    def output_hw(self, in_hw):
        return tuple(in_hw)

    def encode(self, x):
        """reference models/fcn.py:106-130; returns (score, pool3, pool4)."""
        k = self.cfg.n_kernels
        nc = self.cfg.n_classes
        net = conv2d(x, k, 3, 1, "SAME", name="conv1")
        net = max_pool(net, 2)
        net = conv2d(net, k * 2, 3, 1, "SAME", name="conv2")
        net = max_pool(net, 2)
        net = conv2d(net, k * 4, 3, 1, "SAME", name="conv3")
        pool3 = max_pool(net, 2)
        net = conv2d(pool3, k * 8, 3, 1, "SAME", name="conv4")
        pool4 = max_pool(net, 2)
        net = conv2d(pool4, k * 8, 3, 1, "SAME", name="conv5")
        pool5 = max_pool(net, 2)
        net = conv2d(pool5, k * 32, 1, 1, "SAME", name="conv6")
        if self.cfg.bayesian:
            net = dropout(net, self.cfg.dropout_rate, deterministic=False)
        net = conv2d(net, k * 32, 1, 1, "SAME", name="conv7")
        if self.cfg.bayesian:
            net = dropout(net, self.cfg.dropout_rate, deterministic=False)
        score = conv2d(net, nc, 1, 1, "SAME", name="conv_fr")
        return score, pool3, pool4

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = x.shape[1], x.shape[2]
        nc = self.cfg.n_classes
        score, pool3, pool4 = self.encode(x)
        t = self.cfg.fcn_type

        if t == "32s":
            # reference models/fcn.py:133-145; the fixed bilinear transposed
            # conv runs as two separable banded matmuls on the MXU
            # (nn.upsampling.upsample_separable — numerically identical)
            up = upsample_separable(
                score, 32, crop_to=(score.shape[1] * 32, score.shape[2] * 32)
            )
            return center_crop_or_pad(up, h, w)

        # Score taps (1×1 convs; reference models/fcn.py:159, 192-195)
        pool4_score = conv2d(
            pool4, nc, 1, 1, "SAME", name="pool4_score", activation=None
        )
        up = upsample_separable(
            score, 2, crop_to=(score.shape[1] * 2, score.shape[2] * 2)
        )
        up = center_crop_or_pad(up, pool4_score.shape[1], pool4_score.shape[2])
        fused = pool4_score + up

        if t == "16s":
            # reference models/fcn.py:148-176
            out = upsample_separable(
                fused, 16,
                crop_to=(fused.shape[1] * 16, fused.shape[2] * 16),
            )
            return center_crop_or_pad(out, h, w)

        if t == "8s":
            # reference models/fcn.py:179-220
            pool3_score = conv2d(
                pool3, nc, 1, 1, "SAME", name="pool3_score", activation=None
            )
            up2 = upsample_separable(
                fused, 2, crop_to=(fused.shape[1] * 2, fused.shape[2] * 2)
            )
            up2 = center_crop_or_pad(
                up2, pool3_score.shape[1], pool3_score.shape[2]
            )
            fused2 = pool3_score + up2
            out = upsample_separable(
                fused2, 8,
                crop_to=(fused2.shape[1] * 8, fused2.shape[2] * 8),
            )
            return center_crop_or_pad(out, h, w)

        raise ValueError(f"unknown fcn_type {t!r} (want '32s'|'16s'|'8s')")
