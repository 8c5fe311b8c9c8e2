"""Typed configuration dataclasses.

The reference framework had no config system: its public configuration surface
was constructor kwargs on ``BaseModel`` and each model class
(reference models/basemodel.py:10-25, models/unet.py:25-40, models/fcn.py:26-42,
models/autoencoder.py:33-53, models/gan.py:26-43) plus hand-edited module
constants in driver scripts (reference examples/example_fcn.py:33-50).

Here the same knob names become frozen dataclasses, consumable both from
Python and from the CLI (segmentation_tpu.cli). Knob-name parity matters:
``n_classes, input_dims, input_channel, batch_size, crop_size, learning_rate,
bayesian, autoencoder, adversarial_training, load_snapshot, load_snapshot_from,
save_dir, log_dir, zed_dim, n_kernels, fcn_type, encoder_type, variational,
label_dim`` are all preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


def _as_hw(dims) -> Tuple[int, int]:
    """Reference accepted either an int or a [h, w] pair for input_dims
    (models/unet.py:32 uses 512, models/autoencoder.py:40 uses [256, 256])."""
    if isinstance(dims, int):
        return (dims, dims)
    h, w = dims
    return (int(h), int(w))


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input-pipeline knobs (reference utils/datasets.py:94-110, 204-215).

    ``capacity``/``min_holding``/``threads`` are the shuffle-buffer knobs from
    ``tf.train.shuffle_batch`` (reference utils/datasets.py:166-171); here they
    size the host-side shuffle pool and decode worker count.
    """

    image_dir: str = ""
    mask_dir: str = ""
    image_ext: str = "jpg"
    mask_ext: str = "png"
    n_classes: int = 2
    batch_size: int = 96
    crop_size: int = 256
    ratio: float = 1.0
    capacity: int = 5000
    min_holding: int = 1250
    threads: int = 4
    seed: int = 5555
    augment_flip: bool = True
    # Device-side pipeline options (new; no reference analog)
    prefetch_depth: int = 2
    use_native_loader: bool = True  # C++ decode/crop workers when available

    @property
    def hw(self) -> Tuple[int, int]:
        return (self.crop_size, self.crop_size)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model-architecture knobs shared by the zoo (reference §1 L4 ctors)."""

    name: str = "unet"
    n_classes: int = 2
    input_dims: Sequence[int] = (512, 512)
    input_channel: int = 3
    n_kernels: int = 32
    # FCN
    fcn_type: str = "8s"  # '32s' | '16s' | '8s' (reference models/fcn.py:42)
    # Autoencoder
    zed_dim: int = 64
    encoder_type: str = "stacked"  # 'stacked' | 'multiscale' | 'small'
    variational: bool = False
    denoising: bool = False
    # GAN / CGAN / InfoGAN
    label_dim: Optional[int] = None
    generator_fc: int = 512
    discriminator_fc: int = 512
    c_discrete: int = 10  # InfoGAN discrete latent codes
    c_ctns: int = 2  # InfoGAN continuous latent codes
    # Cross-cutting modes
    bayesian: bool = False
    autoencoder: bool = False
    adversarial_training: bool = False
    dropout_rate: float = 0.5  # slim.dropout default (reference §2 #16)

    def __post_init__(self):
        object.__setattr__(self, "input_dims", _as_hw(self.input_dims))

    @property
    def hw(self) -> Tuple[int, int]:
        return _as_hw(self.input_dims)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer knobs (reference models/basemodel.py:10-25 + GAN extras)."""

    mode: str = "TRAINING"  # 'TRAINING' | 'INFERENCE'
    log_dir: Optional[str] = None
    save_dir: str = "./snapshot"
    learning_rate: float = 1e-4
    adversarial_lr: float = 1e-5  # low LR for the Luc adversary (Readme.md:86)
    gan_discriminator_lr: float = 2e-4  # reference models/gan.py:73
    adam_beta1: float = 0.9
    gan_adam_beta1: float = 0.5  # reference models/gan.py:182-183
    adv_lambda: float = 2.0  # reference models/basemodel.py:279
    # Update the Luc adversary only every k-th step (the reference keeps
    # adversarial_train_list separate from train_op_list exactly so the
    # driver can step the adversary less often — models/basemodel.py:353-355,
    # Readme.md:86 "low LR / lower update frequency"). 1 = every step.
    adversarial_update_every: int = 1
    gen_steps_per_disc: int = 2  # reference models/gan.py:229-230
    load_snapshot: bool = False
    load_snapshot_from: Optional[str] = None
    max_to_keep: int = 1  # reference models/basemodel.py:113
    summary_iter: int = 25  # reference models/basemodel.py:75
    seed: int = 0
    # Precision policy (new, TPU-first)
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Rematerialize the forward in the backward pass (jax.checkpoint):
    # trades ~30% step FLOPs for activation memory — enables much larger
    # batch×resolution products per chip.
    remat: bool = False
    # Gradient accumulation: split each batch into k microbatches inside
    # the jitted step (lax.scan), average the grads, apply ONE optimizer
    # update. Peak activation memory drops to one microbatch's — the
    # production path for batches past the per-chip memory wall (at 512²
    # the no-remat wall is B≈128; B=192 trains with grad_accum=2). Batch
    # size must be divisible by k. BN statistics update per microbatch
    # (same semantics as k sequential steps of B/k).
    grad_accum: int = 1
    # Parallelism (new)
    data_axis: Optional[str] = "data"
    spatial_axes: Tuple[str, str] = ("sph", "spw")

    @property
    def compute_jnp_dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def param_jnp_dtype(self):
        return jnp.dtype(self.param_dtype)
