"""Loss math — the reference's objective functions, exactly.

Citations:
  softmax xentropy objective  reference models/basemodel.py:59-70 (commented
                              spec) + :185-196
  Luc adversarial combination reference models/basemodel.py:278-303, 334-347
  GAN non-saturating BCE      reference models/gan.py:210-220
  VAE KLD                     reference models/autoencoder.py:207-218
All reductions in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_xentropy(logits: jnp.ndarray, labels_onehot: jnp.ndarray):
    """tf.nn.softmax_cross_entropy_with_logits: per-example CE over last dim."""
    logits = logits.astype(jnp.float32)
    labels_onehot = labels_onehot.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(labels_onehot * logp, axis=-1)


def sigmoid_xentropy(logits: jnp.ndarray, labels: jnp.ndarray):
    """tf.nn.sigmoid_cross_entropy_with_logits (stable form)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def segmentation_xentropy(
    logits: jnp.ndarray, masks: jnp.ndarray, n_classes: int
) -> jnp.ndarray:
    """Mean softmax CE of [N,H,W,C] logits against integer [N,H,W,1]/[N,H,W]
    masks (the reference's nested one-hot prep, models/basemodel.py:68-70)."""
    if masks.ndim == 4:
        masks = masks[..., 0]
    onehot = jax.nn.one_hot(masks.astype(jnp.int32), n_classes)
    return jnp.mean(softmax_xentropy(logits, onehot))


def mse(y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Autoencoder objective (reference models/basemodel.py:63-64)."""
    return jnp.mean(
        jnp.square(y_hat.astype(jnp.float32) - y.astype(jnp.float32))
    )


def luc_adversarial_losses(real_logits: jnp.ndarray, fake_logits: jnp.ndarray):
    """Luc et al 2016 'basic' strategy, 2-way softmax form
    (reference models/basemodel.py:288-297):

      real_ex = class 1, fake_ex = class 0
      l_bce_real     = CE(adv(y)    → 1)
      l_bce_fake     = CE(adv(ŷ)    → 0)
      l_bce_fake_one = CE(adv(ŷ)    → 1)   (feeds the segmentation loss)

    Returns per-example vectors; callers combine with adv_lambda
    (reference models/basemodel.py:334-347).
    """
    n = real_logits.shape[0]
    ones = jax.nn.one_hot(jnp.ones((n,), jnp.int32), 2)
    zeros = jax.nn.one_hot(jnp.zeros((n,), jnp.int32), 2)
    l_real = softmax_xentropy(real_logits, ones)
    l_fake = softmax_xentropy(fake_logits, zeros)
    l_fake_one = softmax_xentropy(fake_logits, ones)
    return l_real, l_fake, l_fake_one


def gan_losses(real_logit: jnp.ndarray, fake_logit: jnp.ndarray):
    """DCGAN non-saturating losses (reference models/gan.py:210-220):
      loss_real = BCE(D(x) → 1); loss_fake = BCE(D(G(z)) → 0)
      d_loss = loss_real + loss_fake; g_loss = BCE(D(G(z)) → 1)
    """
    loss_real = jnp.mean(sigmoid_xentropy(real_logit, jnp.ones_like(real_logit)))
    loss_fake = jnp.mean(sigmoid_xentropy(fake_logit, jnp.zeros_like(fake_logit)))
    g_loss = jnp.mean(sigmoid_xentropy(fake_logit, jnp.ones_like(fake_logit)))
    return loss_real, loss_fake, g_loss


def vae_kld(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Analytic KL(q(z|x) || N(0,1)) per example, summed over latent dim
    (reference models/autoencoder.py:218). Note the reference applies
    softplus(logvar)+1e-9 *before* this (models/autoencoder.py:213); callers
    must do the same for parity."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return -0.5 * jnp.sum(
        1.0 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=1
    )


def miou(pred: jnp.ndarray, target: jnp.ndarray, n_classes: int):
    """Mean intersection-over-union of integer class maps (new: the reference
    never computed mIoU; BASELINE.md requires it)."""
    pred = pred.astype(jnp.int32)
    target = target.astype(jnp.int32)
    ious = []
    for c in range(n_classes):
        p = pred == c
        t = target == c
        inter = jnp.sum(p & t)
        union = jnp.sum(p | t)
        ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1), 1.0))
    return jnp.mean(jnp.stack(ious))


def pixel_accuracy(pred: jnp.ndarray, target: jnp.ndarray):
    return jnp.mean((pred == target).astype(jnp.float32))
