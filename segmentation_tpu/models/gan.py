"""GAN / CGAN (DCGAN-style, MNIST-sized nets from the InfoGAN paper).

Re-implementation of reference models/gan.py: FC-projected z (optionally
concatenated with a one-hot label at every stage for CGAN, :299-315) →
reshape to H/4×W/4 → two stride-2 5×5 deconvs → tanh (:316-320); discriminator
of two stride-2 5×5 convs + FC → sigmoid logit (:357-374). Losses are the
non-saturating sigmoid BCEs (:210-220). Param partitioning by the 'gen_'/
'dis_' name prefixes (:200-208) becomes explicit pytree partitioning.
Separate Adams with β1=0.5; D at fixed 2e-4 (:73, 182-183). Two G-steps per
D-step (the intent of :229-230). A fixed dream (z, label) batch is captured
at construction for comparable TensorBoard panels (:113-118).

Deviation recorded: the reference feeds [0,1] MNIST pixels against tanh
outputs in [-1,1] — its own README flags the resulting gray backgrounds
(reference Readme.md:92-93). We scale real images to [-1,1] inside the step
and dreams back to [0,1] for display, which fixes that wart.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.nn import (
    batch_norm,
    conv2d,
    conv_cond_concat,
    dense,
    flatten,
    lrelu,
)
from segmentation_tpu.nn import initializers as init
from segmentation_tpu.nn import module as hk
from segmentation_tpu.nn.layers import conv2d_transpose
from segmentation_tpu.models.base import Trainer, TrainState
from segmentation_tpu.training import losses


def _bn_gan(x, name):
    """GAN arg_scope batch norm: decay 0.9, eps 1e-5, scale=True
    (reference models/gan.py:292-296)."""
    return batch_norm(x, name=name, decay=0.9, epsilon=1e-5, scale=True)


@dataclasses.dataclass
class GANGenerator:
    """reference models/gan.py:281-332."""

    cfg: ModelConfig

    def __call__(self, zed, label_onehot=None):
        cfg = self.cfg
        k = cfg.n_kernels
        h4, w4 = cfg.hw[0] // 4, cfg.hw[1] // 4
        projection_dim = k * 2 * h4 * w4
        w_init = init.dcgan_dense_weight

        if label_onehot is not None:
            zed = jnp.concatenate(
                [zed, label_onehot.astype(zed.dtype)], axis=1
            )
            label_plane = label_onehot.reshape(
                label_onehot.shape[0], 1, 1, -1
            )

        net = dense(zed, 1024, name="gen_zed_project", activation=None,
                    use_bias=False, w_init=w_init)
        net = jax.nn.relu(_bn_gan(net, "gen_zed_project_bn"))
        if label_onehot is not None:
            net = jnp.concatenate(
                [net, label_onehot.astype(net.dtype)], axis=1
            )
        net = dense(net, projection_dim, name="gen_fc1", activation=None,
                    use_bias=False, w_init=w_init)
        net = jax.nn.relu(_bn_gan(net, "gen_fc1_bn"))
        g0 = net.reshape(-1, h4, w4, k * 2)
        if label_onehot is not None:
            g0 = conv_cond_concat(g0, label_plane)
        g1 = conv2d_transpose(g0, k, 5, 2, "SAME", name="gen_deconv1",
                              activation=None, use_bias=False, w_init=w_init)
        g1 = jax.nn.relu(_bn_gan(g1, "gen_deconv1_bn"))
        if label_onehot is not None:
            g1 = conv_cond_concat(g1, label_plane)
        out = conv2d_transpose(
            g1, self.cfg.input_channel, 5, 2, "SAME", name="gen_deconv_out",
            activation=None, use_bias=False, w_init=w_init,
        )
        out = _bn_gan(out, "gen_deconv_out_bn")
        return jnp.tanh(out)


@dataclasses.dataclass
class GANDiscriminator:
    """reference models/gan.py:337-384. Returns (sigmoid, logit)."""

    cfg: ModelConfig

    def __call__(self, image, label_onehot=None):
        w_init = init.dcgan_weight
        if label_onehot is not None:
            label_plane = label_onehot.reshape(
                label_onehot.shape[0], 1, 1, -1
            )
            image = conv_cond_concat(image, label_plane)
        net = conv2d(image, 16, 5, 2, "SAME", name="dis_conv0",
                     activation=None, use_bias=False, w_init=w_init)
        net = lrelu(_bn_gan(net, "dis_conv0_bn"))
        if label_onehot is not None:
            net = conv_cond_concat(net, label_plane)
        net = conv2d(net, 64, 5, 2, "SAME", name="dis_conv1",
                     activation=None, use_bias=False, w_init=w_init)
        net = lrelu(_bn_gan(net, "dis_conv1_bn"))
        net = flatten(net)
        if label_onehot is not None:
            net = jnp.concatenate(
                [net, label_onehot.astype(net.dtype)], axis=1
            )
        net = dense(net, 1024, name="dis_fc1", activation=None,
                    use_bias=False, w_init=w_init)
        net = lrelu(_bn_gan(net, "dis_fc1_bn"))
        logit = dense(net, 1, name="dis_out", activation=None, w_init=w_init)
        return jax.nn.sigmoid(logit.astype(jnp.float32)), logit


class GANTrainer(Trainer):
    """GAN training runtime (reference models/gan.py:122-136, 179-236).

    One jit-compiled step: D update then ``gen_steps_per_disc`` G updates,
    z drawn on-device from the state rng. Public API: ``train_step()``,
    ``dream()``, ``snapshot()``, ``infer`` (generates from given z).
    """

    model_name = "GAN"

    def __init__(self, *args, generator=None, discriminator=None, **kwargs):
        self._generator = generator
        self._discriminator = discriminator
        super().__init__(*args, **kwargs)

    def _build(self):
        mcfg, tcfg = self.mcfg, self.tcfg
        if self._generator is None:
            self._generator = GANGenerator(mcfg)
        if self._discriminator is None:
            self._discriminator = GANDiscriminator(mcfg)
        self.conditional = mcfg.label_dim is not None

        self._gen = hk.transform(
            lambda z, lab=None: self._generator(z, lab)
        )
        self._disc = hk.transform(
            lambda x, lab=None: self._discriminator(x, lab)
        )

        self.gen_optimizer = optax.adam(
            tcfg.learning_rate, b1=tcfg.gan_adam_beta1
        )
        self.disc_optimizer = optax.adam(
            tcfg.gan_discriminator_lr, b1=tcfg.gan_adam_beta1
        )

        cdt = self.policy.compute_dtype

        def _z_sharding(n):
            from jax.sharding import NamedSharding, PartitionSpec as P

            data = self.mesh.shape.get("data", 1)
            spec = P("data", None) if n % max(1, data) == 0 else P()
            return NamedSharding(self.mesh, spec)

        self._z_sharding = _z_sharding

        def sample_z(rng, n):
            # z ~ U(-1, 1) (reference models/gan.py:125), drawn on-device and
            # resharded to follow the batch's 'data' partitioning so each
            # chip generates only its shard.
            z = jax.random.uniform(
                rng, (n, mcfg.zed_dim), jnp.float32, -1.0, 1.0
            ).astype(cdt)
            return jax.lax.with_sharding_constraint(z, self._z_sharding(n))

        self._sample_z = sample_z

        def onehot(labels):
            return jax.nn.one_hot(
                labels.astype(jnp.int32), mcfg.label_dim, dtype=cdt
            )

        def d_loss_fn(dis_params, gen_params, dis_ms, gen_ms, rng, x, labels):
            lab = onehot(labels) if self.conditional else None
            k_z, k_g, k_d = jax.random.split(rng, 3)
            z = sample_z(k_z, x.shape[0])
            fake_out, _ = self._gen.apply(
                gen_params, gen_ms, k_g, z, lab, train=True
            )
            fake = jax.lax.stop_gradient(fake_out)
            (_, real_logit), dis_ms1 = self._disc.apply(
                dis_params, dis_ms, k_d, x, lab, train=True
            )
            (_, fake_logit), dis_ms2 = self._disc.apply(
                dis_params, dis_ms1, k_d, fake, lab, train=True
            )
            loss_real, loss_fake, _ = losses.gan_losses(real_logit, fake_logit)
            return loss_real + loss_fake, (dis_ms2, loss_real, loss_fake)

        def g_loss_fn(gen_params, dis_params, gen_ms, dis_ms, rng, labels, n):
            lab = onehot(labels) if self.conditional else None
            k_z, k_g, k_d = jax.random.split(rng, 3)
            z = sample_z(k_z, n)
            fake, gen_ms1 = self._gen.apply(
                gen_params, gen_ms, k_g, z, lab, train=True
            )
            (_, fake_logit), _ = self._disc.apply(
                dis_params, dis_ms, k_d, fake, lab, train=True
            )
            _, _, g_loss = losses.gan_losses(
                jnp.zeros_like(fake_logit), fake_logit
            )
            return g_loss, gen_ms1

        def train_step(state: TrainState, batch, with_grads: bool = False):
            # Real images → [-1, 1] to match tanh outputs (see module doc).
            x = batch["image"]
            if x.dtype == jnp.uint8:  # uint8 staging batches: /255 first
                x = x.astype(cdt) * (1.0 / 255.0)
            else:
                x = x.astype(cdt)
            x = x * 2.0 - 1.0
            labels = batch.get("label", jnp.zeros((x.shape[0],), jnp.int32))
            rng, k_d, *k_gs = jax.random.split(
                state.rng, 2 + tcfg.gen_steps_per_disc
            )

            gen_params, dis_params = state.params, state.adv_params
            gen_ms, dis_ms = state.model_state, state.adv_model_state

            # --- D step
            (d_loss, (dis_ms, loss_real, loss_fake)), g_d = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(
                    dis_params, gen_params, dis_ms, gen_ms, k_d, x, labels
                )
            )
            d_updates, adv_opt_state = self.disc_optimizer.update(
                g_d, state.adv_opt_state, dis_params
            )
            dis_params = optax.apply_updates(dis_params, d_updates)

            # --- G steps (2 per D step; reference models/gan.py:229-230)
            opt_state = state.opt_state
            g_loss = jnp.zeros((), jnp.float32)
            for k_g in k_gs:
                (g_loss, gen_ms), g_g = jax.value_and_grad(
                    g_loss_fn, has_aux=True
                )(
                    gen_params, dis_params, gen_ms, dis_ms, k_g, labels,
                    x.shape[0],
                )
                g_updates, opt_state = self.gen_optimizer.update(
                    g_g, opt_state, gen_params
                )
                gen_params = optax.apply_updates(gen_params, g_updates)

            metrics = {
                "adv_loss": d_loss,
                "gen_loss": g_loss,
                "loss_real": loss_real,
                "loss_fake": loss_fake,
                # in-step scalar gradient norms (always cheap to log)
                "disc_grad_norm": optax.global_norm(g_d),
                "gen_grad_norm": optax.global_norm(g_g),
            }
            new_state = TrainState(
                step=state.step + 1,
                rng=rng,
                params=gen_params,
                model_state=gen_ms,
                opt_state=opt_state,
                adv_params=dis_params,
                adv_model_state=dis_ms,
                adv_opt_state=adv_opt_state,
                extra_opt_state=state.extra_opt_state,
            )
            if with_grads:
                # Per-variable gradients shipped to host ONLY on summary
                # steps (reference models/gan.py:148-156 histograms every
                # var AND its grad); the hot-path jit never materializes
                # these outputs.
                return new_state, metrics, {"dis": g_d, "gen": g_g}
            return new_state, metrics

        import functools as _ft

        self._train_step = jax.jit(
            _ft.partial(train_step, with_grads=False), donate_argnums=0
        )
        # Summary-cadence variant: same step, also returns the grads.
        self._train_step_grads = jax.jit(
            _ft.partial(train_step, with_grads=True), donate_argnums=0
        )

        def dream_fn(gen_params, gen_ms, z, labels):
            lab = onehot(labels) if self.conditional else None
            fake, _ = self._gen.apply(
                gen_params, gen_ms, jax.random.PRNGKey(0), z, lab, train=False
            )
            # tanh [-1,1] → [0,1] for display
            return (fake.astype(jnp.float32) + 1.0) * 0.5

        self._dream = jax.jit(dream_fn)

    def _init_state(self):
        mcfg = self.mcfg
        rng = jax.random.PRNGKey(self.tcfg.seed)
        g_rng, d_rng, state_rng, z_rng = jax.random.split(rng, 4)
        bs = self.batch_size or 1
        cdt = self.policy.compute_dtype
        z0 = jnp.zeros((bs, mcfg.zed_dim), cdt)
        lab0 = (
            jnp.zeros((bs, mcfg.label_dim), cdt) if self.conditional else None
        )
        gen_params, gen_ms = self._gen.init(g_rng, z0, lab0, train=True)
        x0, _ = self._gen.apply(
            gen_params, gen_ms, g_rng, z0, lab0, train=False
        )
        dis_params, dis_ms = self._disc.init(d_rng, x0, lab0, train=True)

        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
            params=gen_params,
            model_state=gen_ms,
            opt_state=self.gen_optimizer.init(gen_params),
            adv_params=dis_params,
            adv_model_state=dis_ms,
            adv_opt_state=self.disc_optimizer.init(dis_params),
            extra_opt_state=(),
        )
        self.state = self._replicate(state)

        # Fixed dream batch (reference models/gan.py:113-118)
        host_rng = np.random.default_rng(self.tcfg.seed)
        self.dream_z_sample = host_rng.uniform(
            -1, 1, (bs, mcfg.zed_dim)
        ).astype(np.float32)
        self.dream_label_sample = host_rng.integers(
            0, mcfg.label_dim or 1, (bs,)
        ).astype(np.int32)

    def train_step(self) -> Dict[str, float]:
        t0 = time.perf_counter()
        batch = self._next_batch_gan()
        # Grad histograms ride the summary cadence: the with-grads program
        # materializes per-variable gradients as extra outputs; the normal
        # step never ships them off device.
        want_grads = self.summary.should_write(self.global_step + 1)
        if want_grads:
            self.state, metrics, grads = self._train_step_grads(
                self.state, batch
            )
        else:
            self.state, metrics = self._train_step(self.state, batch)
        step = self.global_step
        metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
        self.summary.scalars(
            step, {**metrics, "step_time_s": time.perf_counter() - t0}
        )
        if want_grads:
            for name, g in grads["gen"].items():
                if "_bn" not in name:
                    self.summary.histogram(
                        step, f"gen/{name}/grad", np.asarray(g)
                    )
            for name, g in grads["dis"].items():
                if "_bn" not in name:
                    self.summary.histogram(
                        step, f"dis/{name}/grad", np.asarray(g)
                    )
        return metrics

    def _next_batch_gan(self):
        batch = self.dataset.get_batch()
        if isinstance(batch, tuple):
            batch = {"image": batch[0], "label": batch[1]}
        elif not isinstance(batch, dict):
            batch = {"image": batch}
        return self._place_batch(batch)

    def dream(self, z: Optional[np.ndarray] = None,
              labels: Optional[np.ndarray] = None) -> np.ndarray:
        """x ~ G(z); uses the fixed construction-time sample by default
        (reference models/gan.py:266-273)."""
        z = self.dream_z_sample if z is None else z
        labels = self.dream_label_sample if labels is None else labels
        imgs = self._dream(
            self.state.params,
            self.state.model_state,
            jnp.asarray(z, self.policy.compute_dtype),
            jnp.asarray(labels),
        )
        imgs = np.asarray(imgs)
        self.summary.images(self.global_step, "y_dream", imgs, max_outputs=8)
        return imgs

    def infer(self, z: np.ndarray,
              labels: Optional[np.ndarray] = None) -> np.ndarray:
        """Generate images from caller-supplied latents — the `inference_ops`
        contract every reference model exposes (reference
        models/basemodel.py:527-531). Unlike dream(), no summary is written
        and z is required: this is the serving path."""
        z = np.asarray(z)
        if labels is None and self.conditional:
            labels = np.zeros((len(z),), np.int32)
        imgs = self._dream(
            self.state.params,
            self.state.model_state,
            jnp.asarray(z, self.policy.compute_dtype),
            jnp.asarray(labels if labels is not None
                        else np.zeros((len(z),), np.int32)),
        )
        return np.asarray(imgs)

    def test(self):
        """GANs 'dream' instead of test (reference models/gan.py:98-100)."""
        self.dream()
        return {}

    def write_histograms(self):
        """Var histograms for non-BN params (reference models/gan.py:148-156)."""
        step = self.global_step
        for name, p in self.state.params.items():
            if "_bn" not in name:
                self.summary.histogram(step, f"gen/{name}", np.asarray(p))
        for name, p in self.state.adv_params.items():
            if "_bn" not in name:
                self.summary.histogram(step, f"dis/{name}", np.asarray(p))
