"""Generic convolution / deconvolution segmenter.

Re-implementation of reference models/deconvolution.py:101-178: a 4-stage
conv+BN(+pool) encoder (5×5/2, then 3×3 VALID convs with 2- and 3-stride
pools), a 3-stage 5×5/2 transposed-conv+BN decoder, a bilinear resize to
half-input-size (reference :163), a final 2×2/2 deconv, a crop-to-input
(reference :171), and a SAME 3×3 class head. Bayesian dropout insert points
match reference :128-129, :143-144, :153-154.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.nn import (
    batch_norm,
    bilinear_resize,
    center_crop_or_pad,
    conv2d,
    conv2d_transpose,
    dropout,
    max_pool,
)


@dataclasses.dataclass
class DeconvModel:
    cfg: ModelConfig

    IN_OUT_EQUAL = True
    IN_OUT_CROP = False
    IN_OUT_RATIO = False
    model_name = "deconvolution"

    def output_hw(self, in_hw):
        return tuple(in_hw)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.cfg.n_kernels
        nc = self.cfg.n_classes
        bayes = self.cfg.bayesian
        rate = self.cfg.dropout_rate
        h, w = x.shape[1], x.shape[2]

        net = conv2d(x, k, 5, 2, "SAME", name="conv1_0")
        net = batch_norm(net, name="bn1")
        net = max_pool(net, 2, 2)

        net = conv2d(net, k * 2, 3, 1, "VALID", name="conv2_0")
        net = batch_norm(net, name="bn2")
        if bayes:
            net = dropout(net, rate, deterministic=False)
        net = max_pool(net, 3, 3)

        net = conv2d(net, k * 4, 3, 1, "VALID", name="conv3_0")
        net = batch_norm(net, name="bn3")
        net = max_pool(net, 3, 3)

        net = conv2d(net, k * 8, 3, 1, "VALID", name="conv4_0")
        net = batch_norm(net, name="bn4")
        if bayes:
            net = dropout(net, rate, deterministic=False)

        # Decoder
        net = conv2d_transpose(net, k * 2, 5, 2, "VALID", name="deconv1_0")
        net = batch_norm(net, name="bn5")
        if bayes:
            net = dropout(net, rate, deterministic=False)

        net = conv2d_transpose(net, k, 5, 2, "VALID", name="deconv2_0")
        net = batch_norm(net, name="bn6")
        net = conv2d_transpose(net, k, 5, 2, "VALID", name="deconv2_1")
        net = batch_norm(net, name="bn7")

        net = bilinear_resize(net, h // 2, w // 2)

        net = conv2d_transpose(net, nc, 2, 2, "VALID", name="deconv3_0")
        net = batch_norm(net, name="bn8")

        net = center_crop_or_pad(net, h, w)
        return conv2d(net, nc, 3, 1, "SAME", name="conv_out", activation=None)
