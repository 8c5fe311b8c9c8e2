"""Loss-math unit tests vs torch/scipy oracles (SURVEY §4(c))."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from segmentation_tpu.training import losses
from segmentation_tpu.training.bayesian import (
    mutual_information,
    predictive_entropy,
    predictive_moments,
)


def test_softmax_xentropy_vs_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 8)
    onehot = np.eye(5, dtype=np.float32)[labels]
    ours = np.asarray(losses.softmax_xentropy(jnp.asarray(logits), jnp.asarray(onehot)))
    theirs = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_sigmoid_xentropy_vs_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(scale=4, size=(16,)).astype(np.float32)
    labels = rng.integers(0, 2, 16).astype(np.float32)
    ours = np.asarray(losses.sigmoid_xentropy(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(labels), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_vae_kld_analytic():
    # KLD(N(mu, sigma^2) || N(0,1)) closed form
    mu = np.array([[0.5, -1.0]], np.float32)
    logvar = np.array([[0.2, 0.8]], np.float32)
    expected = 0.5 * np.sum(np.exp(logvar) + mu**2 - 1 - logvar)
    ours = float(losses.vae_kld(jnp.asarray(mu), jnp.asarray(logvar))[0])
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_gan_losses_nonsaturating():
    real = jnp.asarray([[2.0]])
    fake = jnp.asarray([[-3.0]])
    lr, lf, g = losses.gan_losses(real, fake)
    # BCE(2 → 1) = softplus(-2); BCE(-3 → 0) = softplus(-3); G: softplus(3)
    np.testing.assert_allclose(float(lr), np.log1p(np.exp(-2.0)), rtol=1e-5)
    np.testing.assert_allclose(float(lf), np.log1p(np.exp(-3.0)), rtol=1e-5)
    np.testing.assert_allclose(float(g), np.log1p(np.exp(3.0)), rtol=1e-5)


def test_luc_adversarial_combination():
    """The three Luc terms on hand-computable logits
    (reference models/basemodel.py:288-297)."""
    real_logits = jnp.asarray([[0.0, 10.0]])  # adversary says 'real'
    fake_logits = jnp.asarray([[10.0, 0.0]])  # adversary says 'fake'
    l_real, l_fake, l_fake_one = losses.luc_adversarial_losses(
        real_logits, fake_logits
    )
    assert float(l_real[0]) < 1e-3      # correctly called real
    assert float(l_fake[0]) < 1e-3      # correctly called fake
    assert float(l_fake_one[0]) > 5.0   # seg net pays for being caught


def test_miou_and_accuracy():
    pred = jnp.asarray([[0, 0], [1, 1]])
    target = jnp.asarray([[0, 1], [1, 1]])
    # class0: inter 1, union 2 → 0.5; class1: inter 2, union 3 → 2/3
    np.testing.assert_allclose(
        float(losses.miou(pred, target, 2)), (0.5 + 2 / 3) / 2, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(losses.pixel_accuracy(pred, target)), 0.75
    )


def test_uncertainty_decomposition():
    rng = jax.random.PRNGKey(0)
    # confident, identical samples → epistemic MI ~ 0
    p = jax.nn.softmax(jnp.ones((1, 2, 2, 3)) * 10, axis=-1)
    samples = jnp.repeat(p[None], 5, axis=0)
    mi = mutual_information(samples)
    assert float(jnp.abs(mi).max()) < 1e-3
    # disagreeing samples → MI > 0
    s1 = jax.nn.one_hot(jnp.zeros((1, 2, 2), jnp.int32), 3)
    s2 = jax.nn.one_hot(jnp.ones((1, 2, 2), jnp.int32), 3)
    samples = jnp.stack([s1, s2])
    assert float(mutual_information(samples).min()) > 0.5
    mean, var = predictive_moments(samples)
    assert float(var.max()) > 0.2
    assert float(predictive_entropy(samples).min()) > 0.5
