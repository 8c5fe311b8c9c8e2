"""Bayesian / MC-dropout subsystem (Kendall & Gal 2017) — reference §2 #16.

The reference's mechanism: ``bayesian=True`` inserts dropout at fixed points
in every model and slim's default training-mode behavior keeps it live at
inference, so repeated ``infer()`` calls sample the posterior
(reference examples/inference.py:31-38). Here the mechanism is explicit:
layers pass ``deterministic=False`` when cfg.bayesian, and these helpers
turn N stochastic forwards into calibrated uncertainty summaries — as one
compiled program (SegmentationTrainer.infer_bayesian) or over spatially
partitioned giant tiles (parallel.spatial.spatial_infer_bayesian).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def mc_sample(
    apply_fn: Callable,
    params,
    model_state,
    rng: jax.Array,
    x: jnp.ndarray,
    n_samples: int,
    samples_per_pass: int = 1,
) -> jnp.ndarray:
    """[S, N, H, W, C] sigmoid probabilities from S stochastic forwards.

    ``samples_per_pass`` batches that many MC samples into ONE forward by
    tiling x along the batch axis — legal because dropout masks are drawn
    per batch element (nn.layers.dropout masks the full activation shape),
    so batch-tiled samples are iid exactly like sequential keyed passes.
    Small batches of big tiles underutilize the chip (measured: 8×
    lax.map of B=2 1024² tiles → 14.5 tiles/s; one B=16 pass → the MXU
    sees a real batch). Serial ``lax.map`` over the remaining chunks
    keeps peak memory at one chunk's activation set."""
    sp = max(1, min(samples_per_pass, n_samples))
    if n_samples % sp:
        raise ValueError(f"n_samples={n_samples} not divisible by "
                         f"samples_per_pass={sp}")
    keys = jax.random.split(rng, n_samples // sp)
    n = x.shape[0]
    xt = jnp.tile(x, (sp,) + (1,) * (x.ndim - 1)) if sp > 1 else x

    def one(k):
        out, _ = apply_fn(params, model_state, k, xt, train=False)
        logits = out[0] if isinstance(out, tuple) else out
        p = jax.nn.sigmoid(logits.astype(jnp.float32))
        return p.reshape(sp, n, *p.shape[1:])

    chunks = jax.lax.map(one, keys)  # [S/sp, sp, N, H, W, C]
    return chunks.reshape(len(keys) * sp, n, *chunks.shape[3:])


def mc_sample_fast(
    fast,
    prepared,
    rng: jax.Array,
    x: jnp.ndarray,
    n_samples: int,
    samples_per_pass: int = 1,
) -> jnp.ndarray:
    """mc_sample over the FAST serving layout (models.unet_fast
    UNetS2DInference / models.unet_int8 UNetS2DInt8): S stochastic
    forwards with explicit per-pass dropout keys through
    ``fast.apply(prepared, x, mc_keys=(k_bottleneck, k_decoder))``.
    Same batch-axis tiling estimator and serial lax.map chunking as
    mc_sample (dropout masks are iid per batch element)."""
    sp = max(1, min(samples_per_pass, n_samples))
    if n_samples % sp:
        raise ValueError(f"n_samples={n_samples} not divisible by "
                         f"samples_per_pass={sp}")
    keys = jax.random.split(rng, n_samples // sp)
    n = x.shape[0]
    xt = jnp.tile(x, (sp,) + (1,) * (x.ndim - 1)) if sp > 1 else x

    def one(k):
        k1, k2 = jax.random.split(k)
        logits = fast.apply(prepared, xt, mc_keys=(k1, k2))
        p = jax.nn.sigmoid(logits.astype(jnp.float32))
        return p.reshape(sp, n, *p.shape[1:])

    chunks = jax.lax.map(one, keys)  # [S/sp, sp, N, H, W, C]
    return chunks.reshape(len(keys) * sp, n, *chunks.shape[3:])


def predictive_moments(samples: jnp.ndarray):
    """Per-pixel predictive mean / variance over the sample axis."""
    return jnp.mean(samples, axis=0), jnp.var(samples, axis=0)


def predictive_entropy(samples: jnp.ndarray) -> jnp.ndarray:
    """H[E p] — total predictive uncertainty, [N, H, W]."""
    p = jnp.mean(samples, axis=0)
    p = p / jnp.clip(jnp.sum(p, axis=-1, keepdims=True), 1e-8)
    return -jnp.sum(p * jnp.log(jnp.clip(p, 1e-8)), axis=-1)


def mutual_information(samples: jnp.ndarray) -> jnp.ndarray:
    """BALD decomposition: H[E p] − E H[p] — the epistemic component of the
    uncertainty (what MC-dropout is for), [N, H, W]."""
    p = samples / jnp.clip(jnp.sum(samples, axis=-1, keepdims=True), 1e-8)
    per_sample_h = -jnp.sum(p * jnp.log(jnp.clip(p, 1e-8)), axis=-1)
    return predictive_entropy(samples) - jnp.mean(per_sample_h, axis=0)


def uncertainty_report(
    samples: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(mean, variance, predictive entropy, epistemic MI) in one pass."""
    mean, var = predictive_moments(samples)
    return mean, var, predictive_entropy(samples), mutual_information(samples)
