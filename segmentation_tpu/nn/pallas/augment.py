"""Pallas TPU kernel: fused random-crop + flip + normalize.

The device tail of the input pipeline (SURVEY §7 data layer): a uint8
staging batch sits in HBM; per-sample crop offsets arrive as scalar-prefetch
operands, so each grid step DMAs exactly its (crop × crop) window from HBM
into VMEM — no materialized gather, no full-image normalize — then applies
the /255 normalization (and optional horizontal flip) on the VPU and writes
the float block. Saves (H·W − crop²)/H·W of the HBM read traffic vs the XLA
dynamic-slice formulation and fuses three pipeline stages into one kernel.

Mosaic limitation (current libtpu): HBM memref slices must tile-align the
minor dims — W offsets to 8 (handled: 8-px crop granularity) and the C
extent to 128, which 3-channel images cannot satisfy. On such inputs the
compiled path raises; use data.augment.device_augment (XLA) for small-C
batches, or this kernel for lane-aligned feature maps. Interpret-mode tests
lock the semantics either way.

STATUS (round-2 decision, recorded per VERDICT item 9): FOLDED — kept as a
documented experiment for lane-aligned (C ≥ 128) feature-map cropping only.
Every staging scheme examined for C=3 images fails the Mosaic minor-dim
alignment arithmetic: flattening W·C makes crop offsets x·3 ≡ 0 (mod 128)
→ 128-px crop granularity; channel-first layouts move W into the minor dim
with the same constraint; padding C to 128 wastes 42× HBM. Production
augmentation is data.augment.device_augment (XLA) — on this pipeline the
host JPEG decode (see BENCH_DETAILS pipeline_native_scaling) is orders of
magnitude below chip throughput, so a device-side crop kernel cannot move
the end-to-end number regardless.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _crop_kernel(ys_ref, xs_ref, flips_ref, img_hbm, out_ref, scratch, sem,
                 *, crop: int, out_dtype):
    i = pl.program_id(0)
    y = ys_ref[i]
    # Mosaic requires the W-dim HBM slice offset to be 8-aligned; crops are
    # therefore taken at 8-pixel W granularity (H stays pixel-granular) —
    # immaterial for random-crop augmentation, documented in fused_augment.
    x = (xs_ref[i] // 8) * 8
    cp = pltpu.make_async_copy(
        img_hbm.at[i, pl.ds(y, crop), pl.ds(x, crop), :],
        scratch,
        sem,
    )
    cp.start()
    cp.wait()
    # Mosaic has no direct uint8→float32 cast; hop through int32. (The flip
    # happens outside the kernel — Mosaic lacks `rev` — on the already-
    # cropped block, where it is a cheap fused op.)
    data = scratch[...].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    out_ref[0] = data.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("crop", "out_dtype", "interpret")
)
def pallas_crop_normalize(
    images_u8: jax.Array,  # [N, H, W, C] uint8 (HBM staging)
    ys: jax.Array,  # [N] int32 crop row offsets
    xs: jax.Array,  # [N] int32 crop col offsets
    flips: jax.Array,  # [N] int32 (0/1) horizontal flip flags
    crop: int,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    n, h, w, c = images_u8.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, crop, crop, c),
            lambda i, ys, xs, fl: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((crop, crop, c), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_crop_kernel, crop=crop, out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, crop, crop, c), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ys.astype(jnp.int32), xs.astype(jnp.int32), flips.astype(jnp.int32),
      images_u8)
    # horizontal flip on the cropped result (cheap; fused by XLA)
    fl = (flips != 0).reshape(n, 1, 1, 1)
    return jnp.where(fl, out[:, :, ::-1, :], out)


def fused_augment(
    key: jax.Array,
    images_u8: jax.Array,
    masks_u8,
    crop: int,
    flip: bool = True,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """Drop-in for data.augment.device_augment's crop/flip/normalize stage
    using the Pallas kernel for both image and mask (mask stays uint8-coded
    via a 0/1 scale — normalized path × 255 gives back the class index)."""
    n, h, w, _ = images_u8.shape
    k_y, k_x, k_f = jax.random.split(key, 3)
    ys = jax.random.randint(k_y, (n,), 0, h - crop + 1)
    # W offsets in 8px steps (see _crop_kernel alignment note)
    xs = jax.random.randint(k_x, (n,), 0, (w - crop) // 8 + 1) * 8
    flips = (
        jax.random.bernoulli(k_f, 0.5, (n,)).astype(jnp.int32)
        if flip else jnp.zeros((n,), jnp.int32)
    )
    imgs = pallas_crop_normalize(
        images_u8, ys, xs, flips, crop, out_dtype, interpret
    )
    masks = None
    if masks_u8 is not None:
        m = pallas_crop_normalize(
            masks_u8, ys, xs, flips, crop, jnp.float32, interpret
        )
        masks = jnp.round(m * 255.0).astype(jnp.uint8)
    return imgs, masks
