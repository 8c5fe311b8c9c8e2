"""Autoencoder / VAE / adversarial autoencoder.

Re-implementation of reference models/autoencoder.py: conv encoder → FC
bottleneck ``zed_dim`` → FC inflate → deconv decoder, with three encoder
bodies ('stacked' :325-379, 'multiscale' :388-465, 'small' :245-286 for
MNIST), two decoders (:470-504, :290-313), a variational mode (μ/logvar
heads with softplus(logvar)+1e-9, reparameterized sampling, analytic KLD,
:207-218), and adversarial-autoencoder training via the shared adversary on
reconstructions (default adversarial_training=True, :49).

``dream()`` decodes ε ~ N(0,1) through the decoder (:156-165).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.nn import (
    batch_norm,
    bilinear_resize,
    center_crop_or_pad,
    conv2d,
    conv2d_transpose,
    dense,
    dropout,
    flatten,
    max_pool,
)
from segmentation_tpu.nn import module as hk


@dataclasses.dataclass
class Autoencoder:
    cfg: ModelConfig

    IN_OUT_EQUAL = True
    IN_OUT_CROP = False
    IN_OUT_RATIO = False
    model_name = "autoencoder"

    # Static shapes captured at init trace (the reference stored these on
    # self during graph build, models/autoencoder.py:269-272, 359-362).
    conv_shape: Optional[Tuple[int, ...]] = None
    pre_zed_dim: Optional[int] = None
    _out_channels: Optional[int] = None

    def output_hw(self, in_hw):
        return tuple(in_hw)

    # ----------------------------------------------------------- encoders
    def small_stacked_encoder(self, x):
        """MNIST-sized (reference models/autoencoder.py:245-286)."""
        cfg = self.cfg
        k = cfg.n_kernels
        net = conv2d(x, k, 5, 1, "SAME", name="conv1_0")
        net = batch_norm(net, name="bn1")
        net = max_pool(net, 2, 2)
        net = conv2d(net, k * 2, 5, 1, "VALID", name="conv2_0")
        net = batch_norm(net, name="bn2")
        if cfg.bayesian:
            net = dropout(net, cfg.dropout_rate, deterministic=False)
        net = max_pool(net, 2, 2)
        self.conv_shape = tuple(net.shape)
        flat = flatten(net)
        self.pre_zed_dim = flat.shape[-1]
        if cfg.variational:
            return dense(flat, cfg.zed_dim * 2, name="zed")
        return dense(flat, cfg.zed_dim, name="zed", activation=None, use_bias=False)

    def stacked_encoder(self, x):
        """reference models/autoencoder.py:325-379."""
        cfg = self.cfg
        k = cfg.n_kernels
        net = conv2d(x, k, 5, 2, "SAME", name="conv1_0")
        net = batch_norm(net, name="bn1")
        net = max_pool(net, 2, 2)
        net = conv2d(net, k * 2, 3, 1, "VALID", name="conv2_0")
        net = batch_norm(net, name="bn2")
        if cfg.bayesian:
            net = dropout(net, cfg.dropout_rate, deterministic=False)
        net = max_pool(net, 3, 3)
        net = conv2d(net, k * 4, 3, 1, "VALID", name="conv3_0")
        net = batch_norm(net, name="bn3")
        # (reference :352 feeds conv3_0 — not pool3 — to conv4_0; kept)
        net = conv2d(net, k * 8, 3, 1, "VALID", name="conv4_0")
        net = batch_norm(net, name="bn4")
        if cfg.bayesian:
            net = dropout(net, cfg.dropout_rate, deterministic=False)
        self.conv_shape = tuple(net.shape)
        flat = flatten(net)
        self.pre_zed_dim = flat.shape[-1]
        if cfg.variational:
            return dense(flat, cfg.zed_dim * 2, name="zed")
        return dense(flat, cfg.zed_dim, name="zed", activation=None, use_bias=False)

    def multiscale_encoder(self, x):
        """reference models/autoencoder.py:388-465: three scales, each
        projected to a zed_dim vector reshaped to an 8×8 plane, concatenated
        and fused by a 3×3 conv. Requires zed_dim == 64."""
        cfg = self.cfg
        k = cfg.n_kernels
        n = x.shape[0]
        side = int(cfg.zed_dim**0.5)
        if side * side != cfg.zed_dim:
            raise ValueError("multiscale encoder needs square zed_dim")

        def zed_plane(t, idx):
            z = flatten(t)
            z = dense(z, cfg.zed_dim, name=f"zed_{idx}", activation=jax.nn.sigmoid)
            return z.reshape(n, side, side, 1)

        c1 = conv2d(x, k, 3, 2, "SAME", name="conv1_0")
        c1 = conv2d(c1, k, 3, 2, "SAME", name="conv1_1")
        c1 = conv2d(c1, k, 3, 1, "SAME", name="conv1_2")
        c1 = batch_norm(c1, name="bn1")
        p1 = max_pool(c1, 3, 3)
        z1 = zed_plane(p1, 1)

        c2 = conv2d(p1, k * 2, 3, 2, "VALID", name="conv2_0")
        c2 = conv2d(c2, k * 2, 3, 1, "SAME", name="conv2_1")
        c2 = conv2d(c2, k * 2, 3, 1, "SAME", name="conv2_2")
        c2 = batch_norm(c2, name="bn2")
        z2 = zed_plane(c2, 2)

        c3 = conv2d(c2, k * 4, 3, 1, "VALID", name="conv3_0")
        c3 = conv2d(c3, k * 4, 3, 1, "SAME", name="conv3_1")
        c3 = conv2d(c3, k * 4, 3, 1, "SAME", name="conv3_2")
        c3 = batch_norm(c3, name="bn3")
        z3 = zed_plane(c3, 3)

        zc = jnp.concatenate([z1, z2, z3], axis=-1)
        z = conv2d(zc, 1, 3, 1, "SAME", name="zed_conv")
        self.conv_shape = tuple(z.shape)
        z = flatten(z)
        self.pre_zed_dim = z.shape[-1]
        if cfg.variational:
            return dense(z, cfg.zed_dim * 2, name="zed")
        return dense(z, cfg.zed_dim, name="zed", activation=None, use_bias=False)

    # ----------------------------------------------------------- decoders
    def decoder(self, zed):
        """reference models/autoencoder.py:470-504. Reconstructs to the
        configured input size with input_channel outputs (AE mode targets x;
        the reference's n_classes head at :487-492 conflicts with its MSE
        objective — intent is input reconstruction)."""
        cfg = self.cfg
        k = cfg.n_kernels
        h, w = cfg.hw
        cout = self._out_channels or cfg.input_channel
        net = dense(zed, self.pre_zed_dim, name="inflate")
        net = net.reshape((-1,) + self.conv_shape[1:])
        net = conv2d_transpose(net, k * 2, 5, 2, "VALID", name="deconv1_0")
        net = batch_norm(net, name="bn5")
        if cfg.bayesian:
            net = dropout(net, cfg.dropout_rate, deterministic=False)
        net = conv2d_transpose(net, k, 5, 2, "VALID", name="deconv2_0")
        net = batch_norm(net, name="bn6")
        net = conv2d_transpose(net, k, 5, 2, "VALID", name="deconv2_1")
        net = batch_norm(net, name="bn7")
        net = bilinear_resize(net, h // 2, w // 2)
        net = conv2d_transpose(net, cout, 2, 2, "VALID", name="deconv3_0")
        net = batch_norm(net, name="bn8")
        net = center_crop_or_pad(net, h, w)
        return conv2d(
            net, cout, 3, 1, "SAME", name="conv_out",
            activation=None, use_bias=False,
        )

    def small_decoder(self, zed):
        """reference models/autoencoder.py:290-313."""
        cfg = self.cfg
        k = cfg.n_kernels
        h, w = cfg.hw
        cout = self._out_channels or cfg.input_channel
        net = dense(zed, self.pre_zed_dim, name="inflate")
        net = net.reshape((-1,) + self.conv_shape[1:])
        net = conv2d_transpose(net, k * 2, 5, 2, "VALID", name="deconv1_0")
        net = conv2d_transpose(net, k * 2, 5, 2, "VALID", name="deconv1_1")
        net = batch_norm(net, name="bn_up1")
        if cfg.bayesian:
            net = dropout(net, cfg.dropout_rate, deterministic=False)
        net = center_crop_or_pad(net, h + 2, w + 2)
        return conv2d(
            net, cout, 3, 1, "VALID", name="conv_out",
            activation=None, use_bias=False,
        )

    # ----------------------------------------------------------- assembly
    def encode(self, x):
        t = self.cfg.encoder_type
        if t == "stacked":
            z = self.stacked_encoder(x)
        elif t == "multiscale":
            z = self.multiscale_encoder(x)
        elif t == "small":
            z = self.small_stacked_encoder(x)
        else:
            raise ValueError(f"unknown encoder_type {t!r}")
        if min(self.conv_shape[1:3]) < 1:
            raise ValueError(
                f"input {x.shape[1]}x{x.shape[2]} collapses to "
                f"{self.conv_shape[1]}x{self.conv_shape[2]} in the "
                f"{t!r} encoder — use a larger crop_size (stacked needs "
                f"~96+, small ~16+) or encoder_type='small'"
            )
        return z

    def decode(self, zed):
        if self.cfg.encoder_type == "small":
            return self.small_decoder(zed)
        return self.decoder(zed)

    def __call__(self, x: jnp.ndarray):
        """Returns (y_hat, aux); aux carries μ/logvar for the VAE loss."""
        cfg = self.cfg
        self._out_channels = x.shape[-1]
        enc_in = x
        if cfg.denoising and hk.is_training():
            # Denoising mode: corrupt the encoder input with multiplicative
            # Gaussian noise; the reconstruction target stays the clean x
            # (the reference declared the knob but deferred the mechanism —
            # models/autoencoder.py:193-196 'These are for later').
            noise = 1.0 + 0.3 * jax.random.normal(
                hk.next_rng_key(), x.shape
            ).astype(x.dtype)
            enc_in = x * noise
        zed = self.encode(enc_in)
        aux = {}
        if cfg.variational:
            mu = dense(zed, cfg.zed_dim, name="mu", activation=None)
            logvar = dense(zed, cfg.zed_dim, name="logvar", activation=None)
            # reference models/autoencoder.py:213: softplus + 1e-9
            logvar = jax.nn.softplus(logvar.astype(jnp.float32)) + 1e-9
            eps = jax.random.normal(hk.next_rng_key(), logvar.shape)
            zed = (mu.astype(jnp.float32) + jnp.exp(0.5 * logvar) * eps).astype(
                x.dtype
            )
            aux = {"mu": mu, "logvar": logvar}
        y_hat = self.decode(zed)
        return y_hat, aux


class AutoencoderTrainer:
    """Autoencoder-specialized trainer: SegmentationTrainer in autoencoder
    mode plus ``dream()`` — decode ε ~ N(0,1) through the shared decoder
    (reference models/autoencoder.py:125-131, 156-165)."""

    def __new__(cls, model, **kwargs):
        # Compose rather than subclass to avoid import cycles.
        from segmentation_tpu.models.base import SegmentationTrainer
        from segmentation_tpu.training.adversarial import (
            LucAdversary,
            SmallAdversary,
        )

        mcfg = kwargs.get("model_cfg") or ModelConfig()
        if mcfg.adversarial_training and kwargs.get("adversary") is None:
            kwargs["adversary"] = (
                SmallAdversary()
                if mcfg.encoder_type == "small"
                else LucAdversary()
            )

        trainer = SegmentationTrainer(model, **kwargs)
        trainer.model_name = "autoencoder"

        decode_t = hk.transform(lambda z: model.decode(z))

        def dream_fn(params, model_state, rng):
            z = jax.random.normal(
                rng, (trainer.batch_size or 1, mcfg.zed_dim)
            ).astype(trainer.policy.compute_dtype)
            y, _ = decode_t.apply(params, model_state, rng, z, train=False)
            return jax.nn.sigmoid(y.astype(jnp.float32))

        dream_jit = jax.jit(dream_fn)

        def dream(seed: int = 0):
            imgs = dream_jit(
                trainer.state.params,
                trainer.state.model_state,
                jax.random.PRNGKey(seed),
            )
            import numpy as np

            imgs = np.asarray(imgs)
            trainer.summary.images(trainer.global_step, "dream", imgs)
            return imgs

        trainer.dream = dream
        return trainer
