"""Pallas/Mosaic conv kernels for the space-to-depth U-Net hot path.

Why these exist: the packed-layout convs (models/unet_fast.py) are the
FLOP majority of the flagship U-Net, and XLA runs them at 33-74% MFU in
context — not because the MXU work is hard, but because XLA's layout
assignment compromises between producers/consumers ({3,0,2,1} vs
{0,3,2,1} batch-position choices) and inserts pure relayout ``copy`` ops
around them (~12 ms of an 84 ms step at 512²/B=128, measured by
benchmarks/profile_s2d_attr.py). These kernels pin the layout to plain
row-major NHWC, fuse bias+ReLU into the matmul epilogue, and stream rows
through VMEM with Mosaic's block pipeline, so chaining them leaves XLA
nothing to re-lay-out.

Kernel shape story (all flat packed tensors, channels minor):

  conv2x2_flat:  [N, H, W, C] * [2, 2, C, O] -> [N, H-1, W-1, O]
      out[n,r,j,:] = Σ_{u,v} x[n,r+u,j+v,:] @ w[u,v]
      Per output row: 4 MXU matmuls [W, C] @ [C, O] (the v=1 tap uses a
      sublane roll of the row, the extra last row of the product is
      sliced off). C and O are multiples of 128 at every call site
      (flat packed = 4×{32,64} channels), so lanes and the MXU K dim are
      exactly full — the entire reason the s2d layout exists.

  conv2x2_dual_flat: conv(skip, wa) + conv(up, wb), the concat-free
      decoder conv — 8 matmuls per row, one epilogue.

  conv4x4s2_flat: [N, H, W, C] * [4, 4, C, 4O] -> [N, (H-2)/2, (W-2)/2, 4O]
      The strided space-to-depth entry conv (unpacked input, packed
      output). The stride-2 column taps are handled by viewing rows as
      column PAIRS [W/2, 2C] — output column j reads pairs j, j+1 — so
      the four v-taps collapse to two K=2C matmuls per row-tap u.

Grid/BlockSpec scheme (shared): grid = (N, row_blocks). Input rows
arrive as R+1 (or 2R+2 strided) separate one-row BlockSpecs — block
shape 1 along H makes arbitrary, overlapping row offsets expressible as
index maps, which Mosaic double-buffers automatically (overlapping
blocks of one ref are not expressible). The output block is R rows;
Mosaic masks the ragged last block. Accumulation is f32 via
preferred_element_type regardless of input dtype.

Parity: tests/test_pallas_conv.py pins every kernel against
lax.conv_general_dilated in float32 (interpret mode on CPU, compiled on
TPU). Used by models/unet_fast.py when shapes qualify.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qualifies(c: int, o: int) -> bool:
    """Lane-exact channel dims — the only shapes these kernels accept."""
    return c % 128 == 0 and o % 128 == 0


def _row_specs(n_rows: int, r_block: int, h_in: int, w: int, c: int):
    """R+1 one-row input BlockSpecs: ref u holds input row i*R + u
    (clamped; rows past the edge feed masked output rows)."""

    def mk(u):
        return pl.BlockSpec(
            (1, 1, w, c),
            lambda n, i, u=u: (n, jnp.minimum(i * r_block + u, h_in - 1),
                               0, 0),
            memory_space=pltpu.VMEM,
        )

    return [mk(u) for u in range(n_rows)]


def _epilogue(acc, bias_ref, relu, out_dtype):
    y = acc + bias_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)


# --------------------------------------------------------------- conv2x2
def _conv2x2_kernel(r_block, w_out, relu, out_dtype, *refs):
    # The v=1 column tap needs x[j+1]; Mosaic has no sub-32-bit sublane
    # rotate, so the shift is applied to the f32 PRODUCT: group the dots
    # into a keep term and a shift term, one 32-bit roll per output row.
    w00, w01, w10, w11, bias = refs[:5]
    rows = refs[5 : 5 + r_block + 1]
    out = refs[5 + r_block + 1]
    loaded = [r[0, 0] for r in rows]                     # [W, C]
    for r in range(r_block):
        keep = jnp.dot(loaded[r], w00[:],
                       preferred_element_type=jnp.float32)
        keep += jnp.dot(loaded[r + 1], w10[:],
                        preferred_element_type=jnp.float32)
        shift = jnp.dot(loaded[r], w01[:],
                        preferred_element_type=jnp.float32)
        shift += jnp.dot(loaded[r + 1], w11[:],
                         preferred_element_type=jnp.float32)
        acc = keep + pltpu.roll(shift, shift.shape[0] - 1, 0)
        out[0, r] = _epilogue(acc[:w_out], bias, relu, out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "r_block", "interpret"),
)
def conv2x2_flat(x, w, b, *, relu: bool = True, r_block: int = 8,
                 interpret: bool = False):
    """2×2 VALID conv, flat packed layout (bias+ReLU fused).

    x: [N, H, W, C]; w: [2, 2, C, O]; b: [O] (tiled flat bias).
    Returns [N, H-1, W-1, O] in x.dtype. C, O must be 128-multiples.
    """
    n, h, w_in, c = x.shape
    o = w.shape[-1]
    assert _qualifies(c, o), (c, o)
    h_out, w_out = h - 1, w_in - 1
    r_block = max(1, min(r_block, h_out))
    grid = (n, pl.cdiv(h_out, r_block))
    wt = w.astype(x.dtype)
    parts = [wt[0, 0], wt[0, 1], wt[1, 0], wt[1, 1], b.astype(jnp.float32)]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
    kernel = functools.partial(
        _conv2x2_kernel, r_block, w_out, relu, x.dtype
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, o), x.dtype),
        grid=grid,
        in_specs=w_specs + _row_specs(r_block + 1, r_block, h, w_in, c),
        out_specs=pl.BlockSpec(
            (1, r_block, w_out, o),
            lambda n_, i: (n_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(*parts, *([x] * (r_block + 1)))


# ---------------------------------------------------------- conv2x2 dual
def _conv2x2_dual_kernel(r_block, w_out, relu, out_dtype, *refs):
    wa = refs[:4]
    wb = refs[4:8]
    bias = refs[8]
    rows_a = refs[9 : 9 + r_block + 1]
    rows_b = refs[9 + r_block + 1 : 9 + 2 * (r_block + 1)]
    out = refs[9 + 2 * (r_block + 1)]
    la = [r[0, 0] for r in rows_a]
    lb = [r[0, 0] for r in rows_b]
    for r in range(r_block):
        keep = jnp.dot(la[r], wa[0][:], preferred_element_type=jnp.float32)
        keep += jnp.dot(la[r + 1], wa[2][:],
                        preferred_element_type=jnp.float32)
        keep += jnp.dot(lb[r], wb[0][:],
                        preferred_element_type=jnp.float32)
        keep += jnp.dot(lb[r + 1], wb[2][:],
                        preferred_element_type=jnp.float32)
        shift = jnp.dot(la[r], wa[1][:],
                        preferred_element_type=jnp.float32)
        shift += jnp.dot(la[r + 1], wa[3][:],
                         preferred_element_type=jnp.float32)
        shift += jnp.dot(lb[r], wb[1][:],
                         preferred_element_type=jnp.float32)
        shift += jnp.dot(lb[r + 1], wb[3][:],
                         preferred_element_type=jnp.float32)
        acc = keep + pltpu.roll(shift, shift.shape[0] - 1, 0)
        out[0, r] = _epilogue(acc[:w_out], bias, relu, out_dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "r_block", "interpret")
)
def conv2x2_dual_flat(xa, xb, wa, wb, b, *, relu: bool = True,
                      r_block: int = 8, interpret: bool = False):
    """conv2x2(xa, wa) + conv2x2(xb, wb) + b — the concat-free decoder
    conv (skip/up split). Shapes as conv2x2_flat; xa/xb same shape."""
    assert xa.shape == xb.shape, (xa.shape, xb.shape)
    n, h, w_in, c = xa.shape
    o = wa.shape[-1]
    assert _qualifies(c, o), (c, o)
    h_out, w_out = h - 1, w_in - 1
    r_block = max(1, min(r_block, h_out))
    grid = (n, pl.cdiv(h_out, r_block))
    wta, wtb = wa.astype(xa.dtype), wb.astype(xa.dtype)
    parts = [wta[0, 0], wta[0, 1], wta[1, 0], wta[1, 1],
             wtb[0, 0], wtb[0, 1], wtb[1, 0], wtb[1, 1],
             b.astype(jnp.float32)]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
    row_specs = _row_specs(r_block + 1, r_block, h, w_in, c)
    kernel = functools.partial(
        _conv2x2_dual_kernel, r_block, w_out, relu, xa.dtype
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, o), xa.dtype),
        grid=grid,
        in_specs=w_specs + row_specs + row_specs,
        out_specs=pl.BlockSpec(
            (1, r_block, w_out, o),
            lambda n_, i: (n_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(*parts, *([xa] * (r_block + 1)), *([xb] * (r_block + 1)))


# ------------------------------------------------------------ conv4x4s2
def _conv4x4s2_kernel(r_block, w_out, relu, out_dtype, *refs):
    # weights: per row-tap u, two K=2C mats (pair j and pair j+1)
    wp = refs[:8]          # [u0p0, u0p1, u1p0, u1p1, ... u3p1]
    bias = refs[8]
    rows = refs[9 : 9 + 2 * r_block + 2]
    out = refs[9 + 2 * r_block + 2]
    loaded = [r[0, 0] for r in rows]                     # [W/2, 2C]
    for r in range(r_block):
        keep = None
        shift = None
        for u in range(4):
            a = jnp.dot(loaded[2 * r + u], wp[2 * u][:],
                        preferred_element_type=jnp.float32)
            keep = a if keep is None else keep + a
            sh = jnp.dot(loaded[2 * r + u], wp[2 * u + 1][:],
                         preferred_element_type=jnp.float32)
            shift = sh if shift is None else shift + sh
        acc = keep + pltpu.roll(shift, shift.shape[0] - 1, 0)
        out[0, r] = _epilogue(acc[:w_out], bias, relu, out_dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "r_block", "interpret")
)
def conv4x4s2_flat(x, w4, b, *, relu: bool = True, r_block: int = 8,
                   interpret: bool = False):
    """4×4 stride-2 VALID conv (the strided s2d entry conv): unpacked
    input [N, H, W, C] (W even), packed flat output
    [N, (H-2)//2, (W-2)//2, O4]. Requires 2C and O4 to be 128-multiples
    (C=32 entry: 2C=64 -> handled by the pair view ONLY when 2C%128==0;
    callers fall back to XLA otherwise)."""
    n, h, w_in, c = x.shape
    o4 = w4.shape[-1]
    assert w_in % 2 == 0, w_in
    # 2C=64 (the C=32 entry site) is allowed: K=64 matmuls half-fill the
    # MXU contraction dim, but the site is small and the XLA alternative
    # pads lanes 4x. Lane dim O4 stays 128-strict.
    assert (2 * c) % 64 == 0 and o4 % 128 == 0, (c, o4)
    h_out, w_out = (h - 2) // 2, (w_in - 2) // 2
    r_block = max(1, min(r_block, h_out))
    grid = (n, pl.cdiv(h_out, r_block))
    # pair view: [N, H, W/2, 2C]
    xp = x.reshape(n, h, w_in // 2, 2 * c)
    wt = w4.astype(x.dtype)  # [4, 4, C, O4]
    # pair j covers cols (2j, 2j+1) = taps (v=0, v=1); pair j+1 covers
    # taps (v=2, v=3). Stack the two column taps into K=2C.
    parts = []
    for u in range(4):
        parts.append(jnp.concatenate([wt[u, 0], wt[u, 1]], axis=0))
        parts.append(jnp.concatenate([wt[u, 2], wt[u, 3]], axis=0))
    parts.append(b.astype(jnp.float32))
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9

    def mk(u):
        return pl.BlockSpec(
            (1, 1, w_in // 2, 2 * c),
            lambda n_, i, u=u: (
                n_, jnp.minimum(2 * i * r_block + u, h - 1), 0, 0
            ),
            memory_space=pltpu.VMEM,
        )

    row_specs = [mk(u) for u in range(2 * r_block + 2)]
    kernel = functools.partial(
        _conv4x4s2_kernel, r_block, w_out, relu, x.dtype
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, o4), x.dtype),
        grid=grid,
        in_specs=w_specs + row_specs,
        out_specs=pl.BlockSpec(
            (1, r_block, w_out, o4),
            lambda n_, i: (n_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(*parts, *([xp] * (2 * r_block + 2)))
