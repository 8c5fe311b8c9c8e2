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


# --------------------------------------------------------------------------
# VALID-padded (IN_OUT_CROP) models — exact overlap-tile partitioning
# --------------------------------------------------------------------------
#
# The U-Net's VALID stack shrinks the output (input H → H - shrink) and uses
# stride-2 pooling, so a shard can reproduce the monolithic values only when
# its extended window is aligned to the global pooling grid. The exactness
# conditions (the overlap-tile strategy of the original U-Net paper, realized
# with ICI halo exchange instead of host tiling):
#
#   align  = 2^levels              (the pooling-grid period)
#   shard  = H / n_shards          must be a multiple of `align`
#   halo   — a multiple of `align` with 2·halo ≥ shrink
#
# Then each extended shard (size shard + 2·halo, also ≡ 0 mod align) computes
# outputs whose window starts line up with the monolithic run's pooling
# phase, so every produced value is IDENTICAL to the monolithic one. Each
# shard's output has a fixed surplus of (2·halo − shrink) rows/cols shared
# with its neighbors; cropping surplus/2 from each side tiles the plane
# disjointly, and the assembled [N, H, W, C] grid's center crop to the
# monolithic output size (H − shrink) equals the monolithic logits exactly —
# the same center-crop contract (IN_OUT_CROP) the trainer already applies to
# labels (reference models/basemodel.py:412-417, models/unet.py:171-174).
# Boundary reflection never leaks in: retained outputs' receptive fields are
# exactly the monolithic ones, which by construction stay inside the image.


def valid_halo(shrink: int, levels: int) -> int:
    """Smallest exact halo for a VALID net with the given total shrinkage:
    the least multiple of 2^levels ≥ shrink/2 (U-Net levels=4: 188 → 96)."""
    align = 1 << levels
    need = -(-shrink // 2)
    return -(-need // align) * align


def model_shrink(out_hw_fn, levels: int) -> int:
    """Total VALID shrinkage (input size − output size) of a model, probed at
    an aligned size. Constant across all sizes ≡ 0 mod 2^levels."""
    align = 1 << levels
    n0 = 64 * align
    return n0 - out_hw_fn((n0, n0))[0]


def _valid_geometry(hw, n_hw, shrink, levels, halo):
    align = 1 << levels
    for d, (size, n) in enumerate(zip(hw, n_hw)):
        ax = "HW"[d]
        if size % n:
            raise ValueError(f"{ax}={size} not divisible by {n} shards")
        shard = size // n
        if shard % align:
            raise ValueError(
                f"{ax} shard {shard} not a multiple of 2^levels={align} — "
                f"pick a tile size/shard count with {align}-aligned shards"
            )
        if halo > shard:
            raise ValueError(
                f"halo {halo} exceeds the {shard}-px shard along {ax}"
            )
    if halo % align:
        raise ValueError(f"halo {halo} must be a multiple of {align}")
    surplus = 2 * halo - shrink
    if surplus < 0:
        raise ValueError(
            f"halo {halo} too small: need 2*halo ≥ shrink={shrink}"
        )
    if surplus % 2:
        raise ValueError(f"odd surplus {surplus} (shrink={shrink})")
    return surplus


def spatial_apply_valid(
    apply_fn: Callable,
    params,
    model_state,
    mesh: Mesh,
    out_hw_fn: Callable[[Tuple[int, int]], Tuple[int, int]],
    levels: int = 4,
    halo: Optional[int] = None,
    axis_names: Tuple[str, str] = ("sph", "spw"),
    batch_axis: Optional[str] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Exact spatially-partitioned inference for VALID-padded (IN_OUT_CROP)
    models — the U-Net giant-tile path (SURVEY §2.10, §5 long-context analog;
    the reference's workaround was host-side crops, reference
    utils/datasets.py:27-34).

    ``apply_fn(params, model_state, x)`` → logits, VALID semantics
    (out = in − shrink); ``out_hw_fn`` is the model's static shape map
    (e.g. ``UNet.output_hw``). Returns a jitted callable [N, H, W, C] →
    [N, H−shrink, W−shrink, n_classes] equal to the monolithic model
    everywhere (up to float reassociation).
    """
    from segmentation_tpu.nn.shapes import center_crop_or_pad

    shrink = model_shrink(out_hw_fn, levels)
    if halo is None:
        halo = valid_halo(shrink, levels)
    n_h = mesh.shape[axis_names[0]]
    n_w = mesh.shape[axis_names[1]]
    surplus = None  # resolved per input shape at trace time

    in_spec = P(batch_axis, *axis_names, None)
    rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)  # noqa: E731

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(in_spec, rep(params), rep(model_state)),
        out_specs=in_spec,
        check_vma=False,
    )
    def run(x, params_, state_):
        x_ext = halo_exchange_2d(x, halo, axis_names)
        y = apply_fn(params_, state_, x_ext)
        c = surplus // 2
        return y[:, c : c + x.shape[1], c : c + x.shape[2], :]

    @jax.jit
    def full(x, params_, state_):
        grid = run(x, params_, state_)  # [N, H, W, C'] assembled
        oh, ow = out_hw_fn((x.shape[1], x.shape[2]))
        return center_crop_or_pad(grid, oh, ow)

    def call(x):
        nonlocal surplus
        surplus = _valid_geometry(
            x.shape[1:3], (n_h, n_w), shrink, levels, halo
        )
        x = jax.device_put(x, NamedSharding(mesh, in_spec))
        return full(x, params, model_state)

    return call


def spatial_infer_bayesian_valid(
    apply_fn: Callable,
    params,
    model_state,
    mesh: Mesh,
    out_hw_fn: Callable[[Tuple[int, int]], Tuple[int, int]],
    levels: int = 4,
    halo: Optional[int] = None,
    n_samples: int = 8,
    axis_names: Tuple[str, str] = ("sph", "spw"),
    batch_axis: Optional[str] = None,
):
    """MC-dropout over a spatially-partitioned VALID model: n stochastic
    forwards → per-pixel (mean, variance) of sigmoid probabilities at the
    model's output grid (H−shrink). ``apply_fn(params, state, rng, x)`` →
    logits with live dropout. Dropout masks are decorrelated per shard (each
    shard folds its mesh coordinates into the key), so seam pixels mix masks
    from both neighbors — still unbiased MC samples; use
    ``spatial_apply_valid`` for the deterministic-exactness contract.

    This is BASELINE.md config #5 (Bayesian 1024² U-Net) scaled past one
    chip's HBM: tiles shard over ('sph','spw'), halos ride ICI.
    """
    from segmentation_tpu.nn.shapes import center_crop_or_pad

    shrink = model_shrink(out_hw_fn, levels)
    if halo is None:
        halo = valid_halo(shrink, levels)
    n_h = mesh.shape[axis_names[0]]
    n_w = mesh.shape[axis_names[1]]
    surplus = None

    in_spec = P(batch_axis, *axis_names, None)
    rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)  # noqa: E731

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), in_spec, rep(params), rep(model_state)),
        out_specs=in_spec,
        check_vma=False,
    )
    def one_sample(rng, x, params_, state_):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_names[0]))
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_names[1]))
        x_ext = halo_exchange_2d(x, halo, axis_names)
        logits = apply_fn(params_, state_, rng, x_ext)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        c = surplus // 2
        return probs[:, c : c + x.shape[1], c : c + x.shape[2], :]

    @jax.jit
    def full(rng, x, params_, state_):
        keys = jax.random.split(rng, n_samples)
        samples = jax.lax.map(
            lambda k: one_sample(k, x, params_, state_), keys
        )
        mean = jnp.mean(samples, axis=0)
        var = jnp.var(samples, axis=0)
        oh, ow = out_hw_fn((x.shape[1], x.shape[2]))
        return (
            center_crop_or_pad(mean, oh, ow),
            center_crop_or_pad(var, oh, ow),
        )

    def call(rng, x):
        nonlocal surplus
        surplus = _valid_geometry(
            x.shape[1:3], (n_h, n_w), shrink, levels, halo
        )
        x = jax.device_put(x, NamedSharding(mesh, in_spec))
        return full(rng, x, params, model_state)

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
