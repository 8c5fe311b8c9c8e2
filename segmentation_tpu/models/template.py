"""Template / plugin contract (reference models/template.py, Readme.md:83).

The extension recipe for a new segmentation model:

  1. Write a dataclass holding a ModelConfig, declaring the shape contract
     (exactly one of IN_OUT_EQUAL / IN_OUT_CROP / IN_OUT_RATIO — reference
     models/basemodel.py:42-47).
  2. Implement ``__call__(self, x)`` as a pure function over nn layers —
     parameters materialize through segmentation_tpu.nn.module; there is no
     reuse machinery because weight sharing is calling the same function
     with the same params (what reference models/basemodel.py:397's
     reuse=True dance achieved).
  3. Optionally implement ``output_hw(in_hw)`` for static output sizing.
  4. Hand an instance to SegmentationTrainer — train_step/test/infer/
     snapshot come for free.

This file is itself a working model: a 2-layer SAME-padded conv head.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.nn import conv2d


@dataclasses.dataclass
class Template:
    cfg: ModelConfig

    IN_OUT_EQUAL = True
    IN_OUT_CROP = False
    IN_OUT_RATIO = False
    model_name = "template"

    def output_hw(self, in_hw):
        return tuple(in_hw)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.cfg.n_kernels
        net = conv2d(x, k, 3, 1, "SAME", name="conv1")
        return conv2d(
            net, self.cfg.n_classes, 1, 1, "SAME", name="output",
            activation=None,
        )
