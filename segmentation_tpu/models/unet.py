"""U-Net (Ronneberger et al 2015).

Re-implementation of the reference architecture (reference models/unet.py:
109-175): 5-level VALID-padded double-conv encoder with channel widths
n_kernels × {1, 2, 4, 8, 16}, 4 up-stages of 2×2 stride-2 transposed
convolutions with center-crop-and-concat skip connections, 1×1 class head.
Output is smaller than input (IN_OUT_CROP contract, reference models/unet.py:
61, 171-174): training labels are center-cropped to the logits' size by the
trainer.

Deviation from the reference recorded: reference models/unet.py:120 pools the
*first* conv's output at level 1 (`net` instead of `net1_2`) — a transcription
slip versus the paper and versus every other level of the same file. We build
the documented intent (pool the double-conv output), per SURVEY §0.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.nn import (
    center_crop_like,
    conv2d,
    conv2d_transpose,
    dropout,
    max_pool,
)
from segmentation_tpu.nn.shapes import unet_output_hw


@dataclasses.dataclass
class UNet:
    cfg: ModelConfig
    levels: int = 4  # encoder/decoder depth (4 = reference architecture)

    # Shape contract (reference models/basemodel.py:42-47; unet.py:61)
    IN_OUT_EQUAL = False
    IN_OUT_CROP = True
    IN_OUT_RATIO = False
    model_name = "unet"

    def output_hw(self, in_hw):
        return unet_output_hw(in_hw, self.levels)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        oh, ow = self.output_hw(x.shape[1:3])
        if min(oh, ow) < 1:
            raise ValueError(
                f"input {x.shape[1]}x{x.shape[2]} collapses to {oh}x{ow} "
                f"through the {self.levels}-level VALID U-Net — use a larger "
                f"crop_size or fewer levels (UNet(cfg, levels=N))"
            )
        k = self.cfg.n_kernels
        nc = self.cfg.n_classes
        bayes = self.cfg.bayesian
        rate = self.cfg.dropout_rate

        def double_conv(h, width, idx):
            h = conv2d(h, width, 3, 1, "VALID", name=f"conv{idx}_1")
            h = conv2d(h, width, 3, 1, "VALID", name=f"conv{idx}_2")
            return h

        # Encoder
        skips = []
        h = x
        for lvl in range(self.levels):
            h = double_conv(h, k * (2**lvl), lvl + 1)
            skips.append(h)
            h = max_pool(h, 2)
        b = double_conv(h, k * (2**self.levels), self.levels + 1)
        if bayes:
            # Bayesian dropout at the bottleneck (MC-dropout site; the
            # reference exposes dropout sites on Deconv/AE — U-Net gets the
            # canonical Kendall&Gal placement)
            b = dropout(b, rate, deterministic=False)

        # Decoder: deconv 2x2/2 + center-crop-and-concat + double conv
        h = b
        for i, lvl in enumerate(reversed(range(self.levels))):
            width = k * (2**lvl)
            h = conv2d_transpose(h, width, 2, 2, "VALID", name=f"upconv{i + 1}")
            skip = center_crop_like(skips[lvl], h)
            h = jnp.concatenate([skip, h], axis=-1)
            h = conv2d(h, width, 3, 1, "VALID", name=f"conv{self.levels + 2 + i}_1")
            h = conv2d(h, width, 3, 1, "VALID", name=f"conv{self.levels + 2 + i}_2")
        if bayes:
            h = dropout(h, rate, deterministic=False)

        # 1x1 class head, no activation (reference models/unet.py:166-167)
        return conv2d(h, nc, 1, 1, "VALID", name="output", activation=None)
