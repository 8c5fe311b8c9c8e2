"""InfoGAN (Chen et al 2016) — with a real mutual-information head.

The reference's InfoGAN (reference models/infogan.py) is structurally a GAN
with InfoGAN-paper layer sizes (gen: 512-FC → 7·7·64 → two 4×4/2 deconvs,
:306-322; disc: 11/24-kernel 5×5/2 convs + 128-FC, :358-372) whose
``c_discrete``/``c_ctns`` ctor args are accepted but unused (:46-47) — there
is no Q-network at that snapshot (SURVEY §2 #14). Per the survey's direction
we implement the honest version: the latent is [z, c_cat one-hot, c_cont],
a Q head shares the discriminator trunk and predicts (softmax c_cat,
Gaussian c_cont), and the training losses gain the variational MI bound
  L_I = CE(q_cat(G(z,c)) , c_cat) + GaussianNLL(c_cont | q_mu, q_logvar)
applied to both players (λ = 1).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import optax

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.models.base import TrainState
from segmentation_tpu.models.gan import GANTrainer, _bn_gan
from segmentation_tpu.nn import conv2d, dense, flatten, lrelu
from segmentation_tpu.nn import initializers as init
from segmentation_tpu.nn import module as hk
from segmentation_tpu.nn.layers import conv2d_transpose
from segmentation_tpu.training import losses


@dataclasses.dataclass
class InfoGANGenerator:
    """reference models/infogan.py:287-334 layer plan; input is the
    concatenated [z, c_cat, c_cont] latent."""

    cfg: ModelConfig

    def __call__(self, latent, label_onehot=None):
        cfg = self.cfg
        h4, w4 = cfg.hw[0] // 4, cfg.hw[1] // 4
        fcw = init.dcgan_dense_weight
        xav = init.xavier_normal
        net = dense(latent, cfg.generator_fc, name="gen_zed_project",
                    activation=None, use_bias=False, w_init=fcw)
        net = jax.nn.relu(_bn_gan(net, "gen_zed_project_bn"))
        net = dense(net, 64 * h4 * w4, name="gen_fc1", activation=None,
                    use_bias=False, w_init=fcw)
        net = jax.nn.relu(_bn_gan(net, "gen_fc1_bn"))
        g0 = net.reshape(-1, h4, w4, 64)
        g1 = conv2d_transpose(g0, 64, 4, 2, "SAME", name="gen_deconv1",
                              activation=None, use_bias=False, w_init=xav)
        g1 = jax.nn.relu(_bn_gan(g1, "gen_deconv1_bn"))
        out = conv2d_transpose(
            g1, cfg.input_channel, 4, 2, "SAME", name="gen_deconv_out",
            activation=None, use_bias=False, w_init=xav,
        )
        out = _bn_gan(out, "gen_deconv_out_bn")
        return jnp.tanh(out)


@dataclasses.dataclass
class InfoGANDiscriminator:
    """reference models/infogan.py:339-383 trunk + the Q head. Returns
    (sigmoid, logit, q_cat_logits, q_mu, q_logvar)."""

    cfg: ModelConfig

    def __call__(self, image, label_onehot=None):
        cfg = self.cfg
        xav = init.xavier_normal
        # conv0 has no BN (reference models/infogan.py:358-360)
        net = lrelu(conv2d(image, 11, 5, 2, "SAME", name="dis_conv0",
                           activation=None, w_init=xav))
        net = conv2d(net, 24, 5, 2, "SAME", name="dis_conv1",
                     activation=None, use_bias=False, w_init=xav)
        net = lrelu(_bn_gan(net, "dis_conv1_bn"))
        net = flatten(net)
        net = dense(net, cfg.discriminator_fc // 4, name="dis_fc1",
                    activation=None, use_bias=False,
                    w_init=init.dcgan_dense_weight)
        trunk = lrelu(_bn_gan(net, "dis_fc1_bn"))
        logit = dense(trunk, 1, name="dis_out", activation=None,
                      w_init=init.dcgan_dense_weight)

        # Q head (shares the trunk): 128-FC → categorical + Gaussian params
        q = dense(trunk, 128, name="dis_q_fc", activation=None,
                  use_bias=False, w_init=init.dcgan_dense_weight)
        q = lrelu(_bn_gan(q, "dis_q_fc_bn"))
        q_cat = dense(q, cfg.c_discrete, name="dis_q_cat", activation=None)
        q_mu = dense(q, cfg.c_ctns, name="dis_q_mu", activation=None)
        q_logvar = dense(q, cfg.c_ctns, name="dis_q_logvar", activation=None)
        return (
            jax.nn.sigmoid(logit.astype(jnp.float32)),
            logit,
            q_cat,
            q_mu,
            q_logvar,
        )


def mutual_info_loss(q_cat_logits, q_mu, q_logvar, c_cat_onehot, c_cont):
    """Variational MI lower bound terms (InfoGAN eq. 5): categorical CE +
    Gaussian negative log-likelihood, batch-meaned."""
    cat_ce = jnp.mean(
        losses.softmax_xentropy(q_cat_logits, c_cat_onehot)
    )
    q_mu = q_mu.astype(jnp.float32)
    q_logvar = q_logvar.astype(jnp.float32)
    c = c_cont.astype(jnp.float32)
    nll = 0.5 * jnp.mean(
        jnp.sum(
            q_logvar + jnp.square(c - q_mu) * jnp.exp(-q_logvar), axis=1
        )
    )
    return cat_ce + nll


class InfoGANTrainer(GANTrainer):
    """GANTrainer with the InfoGAN latent structure and MI objective."""

    model_name = "InfoGAN"

    def _build(self):
        mcfg, tcfg = self.mcfg, self.tcfg
        if self._generator is None:
            self._generator = InfoGANGenerator(mcfg)
        if self._discriminator is None:
            self._discriminator = InfoGANDiscriminator(mcfg)
        self.conditional = False

        self._gen = hk.transform(lambda z, lab=None: self._generator(z))
        self._disc = hk.transform(lambda x, lab=None: self._discriminator(x))

        self.gen_optimizer = optax.adam(
            tcfg.learning_rate, b1=tcfg.gan_adam_beta1
        )
        self.disc_optimizer = optax.adam(
            tcfg.gan_discriminator_lr, b1=tcfg.gan_adam_beta1
        )

        cdt = self.policy.compute_dtype
        self.latent_dim = mcfg.zed_dim + mcfg.c_discrete + mcfg.c_ctns

        def _z_sharding(n):
            from jax.sharding import NamedSharding, PartitionSpec as P

            data = self.mesh.shape.get("data", 1)
            spec = P("data", None) if n % max(1, data) == 0 else P()
            return NamedSharding(self.mesh, spec)

        self._z_sharding = _z_sharding

        def sample_latent(rng, n):
            kz, kc, ku = jax.random.split(rng, 3)
            z = jax.random.uniform(kz, (n, mcfg.zed_dim), jnp.float32, -1, 1)
            cat = jax.random.randint(kc, (n,), 0, mcfg.c_discrete)
            cat_onehot = jax.nn.one_hot(cat, mcfg.c_discrete)
            cont = jax.random.uniform(ku, (n, mcfg.c_ctns), jnp.float32, -1, 1)
            latent = jnp.concatenate([z, cat_onehot, cont], axis=1).astype(cdt)
            # Follow the batch's data partitioning (see gan.py sample_z).
            sh = _z_sharding(n)
            place = lambda t: jax.lax.with_sharding_constraint(t, sh)  # noqa: E731
            return place(latent), place(cat_onehot), place(cont)

        self._sample_latent = sample_latent

        def d_loss_fn(dis_params, gen_params, dis_ms, gen_ms, rng, x):
            k_l, k_g, k_d = jax.random.split(rng, 3)
            latent, cat_onehot, cont = sample_latent(k_l, x.shape[0])
            fake_out, _ = self._gen.apply(
                gen_params, gen_ms, k_g, latent, train=True
            )
            fake = jax.lax.stop_gradient(fake_out)
            (_, real_logit, *_), dis_ms1 = self._disc.apply(
                dis_params, dis_ms, k_d, x, train=True
            )
            (_, fake_logit, q_cat, q_mu, q_logvar), dis_ms2 = self._disc.apply(
                dis_params, dis_ms1, k_d, fake, train=True
            )
            loss_real, loss_fake, _ = losses.gan_losses(real_logit, fake_logit)
            mi = mutual_info_loss(q_cat, q_mu, q_logvar, cat_onehot, cont)
            return loss_real + loss_fake + mi, (
                dis_ms2, loss_real, loss_fake, mi,
            )

        def g_loss_fn(gen_params, dis_params, gen_ms, dis_ms, rng, n):
            k_l, k_g, k_d = jax.random.split(rng, 3)
            latent, cat_onehot, cont = sample_latent(k_l, n)
            fake, gen_ms1 = self._gen.apply(
                gen_params, gen_ms, k_g, latent, train=True
            )
            (_, fake_logit, q_cat, q_mu, q_logvar), _ = self._disc.apply(
                dis_params, dis_ms, k_d, fake, train=True
            )
            _, _, g_gan = losses.gan_losses(
                jnp.zeros_like(fake_logit), fake_logit
            )
            mi = mutual_info_loss(q_cat, q_mu, q_logvar, cat_onehot, cont)
            return g_gan + mi, (gen_ms1, g_gan, mi)

        def train_step(state: TrainState, batch):
            x = batch["image"]
            if x.dtype == jnp.uint8:  # uint8 staging batches: /255 first
                x = x.astype(cdt) * (1.0 / 255.0)
            else:
                x = x.astype(cdt)
            x = x * 2.0 - 1.0
            rng, k_d, *k_gs = jax.random.split(
                state.rng, 2 + tcfg.gen_steps_per_disc
            )
            gen_params, dis_params = state.params, state.adv_params
            gen_ms, dis_ms = state.model_state, state.adv_model_state

            (d_loss, (dis_ms, loss_real, loss_fake, d_mi)), g_d = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(
                    dis_params, gen_params, dis_ms, gen_ms, k_d, x
                )
            )
            d_updates, adv_opt_state = self.disc_optimizer.update(
                g_d, state.adv_opt_state, dis_params
            )
            dis_params = optax.apply_updates(dis_params, d_updates)

            opt_state = state.opt_state
            g_loss = mi = jnp.zeros((), jnp.float32)
            for k_g in k_gs:
                (g_total, (gen_ms, g_loss, mi)), g_g = jax.value_and_grad(
                    g_loss_fn, has_aux=True
                )(gen_params, dis_params, gen_ms, dis_ms, k_g, x.shape[0])
                g_updates, opt_state = self.gen_optimizer.update(
                    g_g, opt_state, gen_params
                )
                gen_params = optax.apply_updates(gen_params, g_updates)

            metrics = {
                "adv_loss": d_loss,
                "gen_loss": g_loss,
                "loss_real": loss_real,
                "loss_fake": loss_fake,
                "mi_loss": mi,
            }
            return (
                TrainState(
                    step=state.step + 1,
                    rng=rng,
                    params=gen_params,
                    model_state=gen_ms,
                    opt_state=opt_state,
                    adv_params=dis_params,
                    adv_model_state=dis_ms,
                    adv_opt_state=adv_opt_state,
                    extra_opt_state=state.extra_opt_state,
                ),
                metrics,
            )

        self._train_step = jax.jit(train_step, donate_argnums=0)

        def dream_fn(gen_params, gen_ms, latent, labels):
            fake, _ = self._gen.apply(
                gen_params, gen_ms, jax.random.PRNGKey(0), latent, train=False
            )
            return (fake.astype(jnp.float32) + 1.0) * 0.5

        self._dream = jax.jit(dream_fn)

    def _init_state(self):
        mcfg = self.mcfg
        rng = jax.random.PRNGKey(self.tcfg.seed)
        g_rng, d_rng, state_rng = jax.random.split(rng, 3)
        bs = self.batch_size or 1
        cdt = self.policy.compute_dtype
        z0 = jnp.zeros((bs, self.latent_dim), cdt)
        gen_params, gen_ms = self._gen.init(g_rng, z0, train=True)
        x0, _ = self._gen.apply(gen_params, gen_ms, g_rng, z0, train=False)
        dis_params, dis_ms = self._disc.init(d_rng, x0, train=True)

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

        host_rng = np.random.default_rng(self.tcfg.seed)
        z = host_rng.uniform(-1, 1, (bs, mcfg.zed_dim))
        # dream sweeps the discrete code across the batch (the InfoGAN
        # manifold visualization the reference stubbed at :405-406)
        cat = np.eye(mcfg.c_discrete)[np.arange(bs) % mcfg.c_discrete]
        cont = np.zeros((bs, mcfg.c_ctns))
        self.dream_z_sample = np.concatenate([z, cat, cont], axis=1).astype(
            np.float32
        )
        self.dream_label_sample = np.zeros((bs,), np.int32)

    def dream_manifold(self, c_index: int = 0, steps: int = 8) -> np.ndarray:
        """Vary one continuous code over [-1, 1] with everything else fixed
        (implements the reference's empty dream_manifold stub,
        models/infogan.py:405-406)."""
        mcfg = self.mcfg
        host = np.random.default_rng(0)
        z = np.repeat(host.uniform(-1, 1, (1, mcfg.zed_dim)), steps, 0)
        cat = np.repeat(np.eye(mcfg.c_discrete)[[0]], steps, 0)
        cont = np.zeros((steps, mcfg.c_ctns))
        cont[:, c_index] = np.linspace(-1, 1, steps)
        latent = np.concatenate([z, cat, cont], 1).astype(np.float32)
        imgs = self._dream(
            self.state.params,
            self.state.model_state,
            jnp.asarray(latent, self.policy.compute_dtype),
            jnp.zeros((steps,), jnp.int32),
        )
        imgs = np.asarray(imgs)
        self.summary.images(
            self.global_step, f"manifold_c{c_index}", imgs, max_outputs=steps
        )
        return imgs
