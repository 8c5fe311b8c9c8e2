"""segmentation_tpu — a TPU-native segmentation framework.

A ground-up JAX/XLA/Pallas re-imagining of the capabilities of
``nathanin/segmentation`` (TF1): streaming image/mask input pipelines, a zoo of
segmentation + generative models (U-Net, FCN-{32,16,8}s, conv/deconv,
autoencoder/VAE/AAE, GAN/CGAN, InfoGAN), adversarial training (Luc et al 2016),
Bayesian MC-dropout inference (Kendall & Gal 2017), checkpoint/resume, and
TensorBoard observability — rebuilt for TPU: jit-compiled functional train
steps, bfloat16 MXU compute, data-parallel + spatially-partitioned execution
over a ``jax.sharding.Mesh``, and a native C++ data-loading runtime.

Public API parity map (reference file:line → here):
  models/basemodel.py:10-531   → segmentation_tpu.models.base.Trainer
  models/unet.py               → segmentation_tpu.models.unet
  models/fcn.py                → segmentation_tpu.models.fcn
  models/deconvolution.py      → segmentation_tpu.models.deconvolution
  models/autoencoder.py        → segmentation_tpu.models.autoencoder
  models/gan.py, infogan.py    → segmentation_tpu.models.{gan,infogan}
  utils/datasets.py            → segmentation_tpu.data.datasets
  utils/upsampling.py          → segmentation_tpu.nn.upsampling
  utils/ops.py                 → segmentation_tpu.nn.layers
"""

__version__ = "0.1.0"

from segmentation_tpu.core.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainConfig,
)
