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


def _epilogue_parts(acc, bias_ref, relu, out_dtype, chan_scale=None,
                    out_inv=None):
    """acc (f32 or i32) -> (y_pre f32, finish) with
    finish(y_pre) == the stored value.

    y_pre is the PRE-cast f32 epilogue value (in requant units when
    out_inv is set) and finish is monotone (round/clip/cast), so
    slot-max pooling may run on y_pre with finish applied to the pooled
    O/4 lanes after — max∘finish == finish∘max, and the pool skips the
    s8→s32 vector unpack/repack it would otherwise pay (measured
    ~2.2 ms at the 512²/B=128 level-1 site, benchmarks/kernel_anatomy).

    chan_scale: per-out-channel [O] f32 ref (int8 dequant: wscale*ascale);
    out_inv: (1,1) f32 SMEM ref holding 1/out_scale — requantize the
    result to int8 (the int8-resident activation path)."""
    y = acc.astype(jnp.float32)
    if out_inv is not None:
        # requantizing path: fold 1/out_scale into the multiplier and
        # bias. The relu runs as an explicit max BEFORE finish so the
        # clip keeps SYMMETRIC ±127 bounds: Mosaic lowers
        # clip(round(v), -127, 127) -> s8 to a single saturating
        # convert, while an asymmetric 0.0 lower bound defeats the
        # pattern and costs a measured +3.7 ms at the c1_2 site
        # (benchmarks/pipeline_probe.py; shipped conv2x2_pf2 7.96 ->
        # 6.31 ms, bit-identical: clip(round(v),0,127) ==
        # clip(round(max(v,0)),-127,127) since round is monotone).
        oi = out_inv[0, 0]
        if chan_scale is not None:
            y = y * (chan_scale[:] * oi)
        else:
            y = y * oi
        y = y + bias_ref[:].astype(jnp.float32) * oi
        if relu:
            y = jnp.maximum(y, 0.0)

        def finish(v):
            return jnp.clip(jnp.round(v), -127.0, 127.0).astype(jnp.int8)

        return y, finish
    if chan_scale is not None:
        y = y * chan_scale[:]
    y = y + bias_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)

    def finish(v):
        return v.astype(out_dtype)

    return y, finish


def _epilogue(acc, bias_ref, relu, out_dtype, chan_scale=None,
              out_inv=None):
    """acc (f32 or i32) -> y = acc*chan_scale + bias; relu; cast."""
    y, finish = _epilogue_parts(acc, bias_ref, relu, out_dtype,
                                chan_scale, out_inv)
    return finish(y)


def _quant_rows(v, act_inv):
    """bf16/f32 row -> int8 with the (1,1) SMEM inverse-scale ref; None
    passes through (input already int8)."""
    if act_inv is None:
        return v
    q = jnp.round(v.astype(jnp.float32) * act_inv[0, 0])
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def _smem_scalar(x):
    """Host/f32 scalar -> (1,1) f32 array + SMEM BlockSpec."""
    arr = jnp.asarray(x, jnp.float32).reshape(1, 1)
    spec = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)
    return arr, spec


_INT8_PREF = jnp.int32


def _interp(flag: bool) -> bool:
    """interpret-mode override: SEG_PALLAS_INTERPRET=1 forces the kernels
    into interpret mode (CPU model-level parity tests)."""
    import os

    return flag or os.environ.get("SEG_PALLAS_INTERPRET") == "1"


def _round8(n: int) -> int:
    return (n + 7) // 8 * 8


def _auto_r(h_out: int, cap: int = 16) -> int:
    """Row-block size minimizing ragged-block waste: the smallest r <= cap
    whose block count equals cdiv(h_out, cap). (82 rows: r=16 wastes 17%
    of compute in the masked tail; r=14 wastes 2.4% — measured 70% -> 84%
    MFU swings on the c8_2 site.)"""
    nb = -(-h_out // cap)
    return -(-h_out // nb)


def _fit_r(r: int, s_io: int, io_bytes: int, acc_bytes: int = 0,
           aux_bytes: int = 0, budget: int = 15 << 20) -> int:
    """Clamp a row-block choice to the 16 MB scoped-VMEM ceiling.

    Scoped VMEM for one grid step ≈ double-buffered io blocks
    (2·r·s_io·io_bytes) + accumulator intermediates (r·s_io·acc_bytes)
    + per-r aux (A-side row blocks / scratch, r·aux_bytes); the 1 MB
    headroom under the hardware's 16 MB covers next-row blocks and
    weight operands. Calibrated on the measured pass/fail frontier
    (benchmarks/pf2_rblock.py: conv+pool r=32 passes, r=64 OOMs, at
    512² in both int8 and bf16; the same kernel at 1024² OOMs at r=32
    with 20.25M observed vs the 16M limit). Halving keeps tuned pins
    exact at their tuned geometry and degrades gracefully at larger
    images instead of failing to compile.
    """
    while r > 1 and r * (2 * s_io * io_bytes + s_io * acc_bytes
                         + aux_bytes) > budget:
        r //= 2
    return r


# --------------------------------------------------------------- conv2x2
def _stride_for(w_in, quant):
    # int8 tiles are (32, 128): row spacing in the stacked scratch must be
    # 32-aligned or every matmul operand slice relayouts.
    return (w_in + 31) // 32 * 32 if quant else _round8(w_in)


def _conv2x2_kernel(r_block, w_in, w_out, relu, out_dtype, quant, in_int8,
                    out_int8, has_head, *refs, pool_out=None,
                    pool_pairs=False, sel_e=None, sel_o=None):
    """Row-stacked formulation: the R+1 input rows are copied into a
    VMEM scratch at a sublane-aligned stride S = round8(W), so each of
    the four kernel taps becomes ONE [R*S, C] @ [C, O] matmul (M in the
    thousands instead of M=W per-row dots — MXU pipeline stays full).

    The v=1 column tap needs x[j+1]; Mosaic has no sub-32-bit sublane
    rotate, so the shift applies to the f32 PRODUCT: one 32-bit roll of
    the whole stacked block. Row padding (S-W positions) only ever feeds
    padding positions, never a real output column.

    int8 path: the two ROW taps stack into the LANE dim instead — scratch
    [(R+1)*S, 2C] holds [x[r] | x[r+1]] per row, so keep/shift are TWO
    K=2C matmuls (not four K=C). The int8 MXU only reaches its 2× rate
    with K ≥ 256; at K=C=128 int8 dots run at the bf16 rate, which is why
    the first int8 port measured only ~1.1× in context. Each row is
    quantized once and stored to its two lane slots."""
    wk_or_w00, ws_or_w01 = refs[0], refs[1]
    if quant:
        bias = refs[2]
        k = 3
    else:
        w10, w11, bias = refs[2], refs[3], refs[4]
        k = 5
    chan_scale = act_inv = out_inv = None
    if quant:
        chan_scale = refs[k]; k += 1
        if not in_int8:
            act_inv = refs[k]; k += 1
        if out_int8:
            out_inv = refs[k]; k += 1
    wd = bd = head_out = None
    if has_head:
        wd = refs[k]; bd = refs[k + 1]; k += 2
    rows = refs[k : k + r_block + 1]
    if has_head:
        out = refs[k + r_block + 1]
        head_out = refs[k + r_block + 2]
        xs = refs[k + r_block + 3]
    else:
        out = refs[k + r_block + 1]
        xs = refs[k + r_block + 2]        # [(R+1)*S, C] / [(R+1)*S, 2C]
    stride = _stride_for(w_in, quant)
    pref = _INT8_PREF if quant else jnp.float32
    if quant:
        c = rows[0].shape[-1]
        for j in range(r_block + 1):
            v = _quant_rows(rows[j][0, 0], act_inv)
            if j < r_block:
                xs[j * stride : j * stride + w_in, :c] = v
            if j >= 1:
                xs[(j - 1) * stride : (j - 1) * stride + w_in, c:] = v
        lo = xs[0 : r_block * stride, :]
        keep = jnp.dot(lo, wk_or_w00[:], preferred_element_type=pref)
        shift = jnp.dot(lo, ws_or_w01[:], preferred_element_type=pref)
    else:
        for j in range(r_block + 1):
            xs[j * stride : j * stride + w_in, :] = rows[j][0, 0]
        lo = xs[0 : r_block * stride, :]
        hi = xs[stride : (r_block + 1) * stride, :]
        keep = jnp.dot(lo, wk_or_w00[:], preferred_element_type=pref)
        keep += jnp.dot(hi, w10[:], preferred_element_type=pref)
        shift = jnp.dot(lo, ws_or_w01[:], preferred_element_type=pref)
        shift += jnp.dot(hi, w11[:], preferred_element_type=pref)
    acc = keep + pltpu.roll(shift, shift.shape[0] - 1, 0)
    for r in range(r_block):
        y = _epilogue(acc[r * stride : r * stride + w_out], bias, relu,
                      jnp.float32, chan_scale, out_inv)
        out[0, r] = y if out_inv is not None else y.astype(out_dtype)
        if has_head:
            # fused binary-segmentation head: for n_classes=2 the 1×1
            # head + argmax is sign(y @ (w₁-w₀) + (b₁-b₀)) per slot —
            # computed here on the f32 epilogue value, so the consumer
            # reads a uint8 mask instead of relayouting the full bf16
            # activation for an XLA einsum+argmax (~4.8 ms at 512²/B=128)
            hd = jnp.dot(y.astype(jnp.bfloat16), wd[:],
                         preferred_element_type=jnp.float32)
            head_out[0, r] = (hd + bd[:] > 0).astype(jnp.uint8)
        if pool_out is not None:
            # fused 2x2/2 max-pool = slot-max over the 4 packed channel
            # groups: two lane rotations + maxima, then the first C/4
            # lanes hold max over all 4 slots. Runs on the f32 epilogue
            # (relu is monotone, so pool-of-relu == relu-of-pool).
            o = y.shape[-1]
            yp = (
                y.astype(jnp.int32) if out_inv is not None
                else y.astype(jnp.float32)
            )  # lane rolls are 32-bit only
            m = jnp.maximum(yp, pltpu.roll(yp, o // 2, 1))
            m = jnp.maximum(m, pltpu.roll(m, o - o // 4, 1))
            pooled = m[:, : o // 4]
            if pool_pairs:
                # column-paired pool output [w/2, 2*(O/4)] — exactly the
                # pair view the next level's strided kernel reads, so the
                # level boundary needs NO XLA reshape (which costs two
                # relayout passes on a [.., 32]-minor tensor).
                # Mosaic supports neither sublane->lane shape casts nor
                # stride-2 sublane slices, but even/odd row selection is a
                # plain matmul with a constant 0/1 matrix (sel_even/odd
                # [W/2, W] passed as operands).
                pdt = jnp.int8 if out_inv is not None else out_dtype
                pb = pooled.astype(pdt)
                pe = jnp.dot(sel_e[:], pb, preferred_element_type=pref)
                po = jnp.dot(sel_o[:], pb, preferred_element_type=pref)
                pool_out[0, r, :, : o // 4] = pe.astype(pdt)
                pool_out[0, r, :, o // 4 :] = po.astype(pdt)
            else:
                pdt = jnp.int8 if out_inv is not None else out_dtype
                pool_out[0, r] = pooled.astype(pdt)


def _conv2x2_kernel_pool(r_block, w_in, w_out, relu, out_dtype,
                         pool_pairs, quant, in_int8, out_int8, *refs):
    n_sel = 2 if pool_pairs else 0
    sel = refs[:n_sel]
    refs = refs[n_sel:]
    n_in = ((4 if quant else 5) + (1 if quant and not in_int8 else 0)
            + (1 if quant and out_int8 else 0) + r_block + 1)
    ins, out_y, out_pool, xs = (
        refs[:n_in], refs[n_in], refs[n_in + 1], refs[n_in + 2]
    )
    _conv2x2_kernel(r_block, w_in, w_out, relu, out_dtype, quant, in_int8,
                    out_int8, False, *ins, out_y, xs,
                    pool_out=out_pool, pool_pairs=pool_pairs,
                    sel_e=sel[0] if pool_pairs else None,
                    sel_o=sel[1] if pool_pairs else None)


def _quant_parts(w, b, quant, x_dtype):
    """Shared wrapper plumbing for the int8 path.

    quant: None (float path) or a dict with
      chan_scale: [O] f32 per-out-channel dequant scale (wscale*ascale)
      act_scale:  float input scale (quantize bf16 rows in-kernel) or
                  None when x is already int8
      out_scale:  float output scale (emit int8) or None (emit x_dtype)
    Returns (parts, specs, quant_flags, compute_dtype, out_dtype).
    """
    if quant is None:
        wt = w if w.dtype == jnp.int8 else w.astype(x_dtype)
        return ([wt, b.astype(jnp.float32)], [None, None],
                (False, False, False), wt.dtype, x_dtype)
    in_int8 = quant.get("act_scale") is None
    out_int8 = quant.get("out_scale") is not None
    parts = [w, b.astype(jnp.float32),
             jnp.asarray(quant["chan_scale"], jnp.float32)]
    specs = [None, None, pl.BlockSpec(memory_space=pltpu.VMEM)]
    if not in_int8:
        arr, spec = _smem_scalar(1.0 / quant["act_scale"])
        parts.append(arr); specs.append(spec)
    if out_int8:
        arr, spec = _smem_scalar(1.0 / quant["out_scale"])
        parts.append(arr); specs.append(spec)
    # float output of an int8-resident input is bf16, never int8
    out_dtype = (
        jnp.int8 if out_int8
        else (jnp.bfloat16 if x_dtype == jnp.int8 else x_dtype)
    )
    return parts, specs, (True, in_int8, out_int8), jnp.int8, out_dtype


@functools.partial(
    jax.jit,
    static_argnames=("relu", "r_block", "interpret"),
)
def conv2x2_flat(x, w, b, *, relu: bool = True,
                 r_block: Optional[int] = None,
                 quant=None,
                 head=None,
                 interpret: bool = False):
    """2×2 VALID conv, flat packed layout (bias+ReLU fused).

    x: [N, H, W, C]; w: [2, 2, C, O]; b: [O] (tiled flat bias).
    Returns [N, H-1, W-1, O] in x.dtype. C, O must be 128-multiples.
    ``quant``: int8 path — see _quant_parts (w must then be int8; MXU
    runs at the 2x int8 rate, i32 accumulate, f32 dequant epilogue).
    ``head``: (wd [O, S], bd [S]) — fused binary-segmentation head:
    also returns a uint8 mask [N, H-1, W-1, S] = (y @ wd + bd > 0),
    the per-slot argmax for n_classes=2. Requires a float output
    (no out_scale)."""
    n, h, w_in, c = x.shape
    o = w.shape[-1]
    assert _qualifies(c, o), (c, o)
    h_out, w_out = h - 1, w_in - 1
    if r_block is None:
        r_block = _auto_r(h_out)
    r_block = max(1, min(r_block, h_out))
    grid = (n, pl.cdiv(h_out, r_block))
    qparts, qspecs, qflags, cdt, out_dtype = _quant_parts(
        w, b, quant, x.dtype
    )
    assert head is None or not qflags[2], "head needs a float output"
    wt = qparts[0]
    if qflags[0]:
        # wide-K int8: row taps stacked in lanes → 2 dots of K=2C
        parts = [
            jnp.concatenate([wt[0, 0], wt[1, 0]], axis=0),
            jnp.concatenate([wt[0, 1], wt[1, 1]], axis=0),
        ] + qparts[1:]
        n_w = 2
    else:
        parts = [wt[0, 0], wt[0, 1], wt[1, 0], wt[1, 1]] + qparts[1:]
        n_w = 4
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w + [
        sp or pl.BlockSpec(memory_space=pltpu.VMEM) for sp in qspecs[1:]
    ]
    if head is not None:
        wd, bd = head
        parts += [wd.astype(jnp.bfloat16), bd.astype(jnp.float32)]
        w_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    kernel = functools.partial(
        _conv2x2_kernel, r_block, w_in, w_out, relu, out_dtype, *qflags,
        head is not None,
    )
    stride = _stride_for(w_in, qflags[0])
    scratch = (
        pltpu.VMEM((r_block * stride, 2 * c), cdt) if qflags[0]
        else pltpu.VMEM(((r_block + 1) * stride, c), cdt)
    )
    out_spec = pl.BlockSpec(
        (1, r_block, w_out, o),
        lambda n_, i: (n_, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n, h_out, w_out, o), out_dtype)
    if head is not None:
        s_head = head[0].shape[-1]
        head_spec = pl.BlockSpec(
            (1, r_block, w_out, s_head),
            lambda n_, i: (n_, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            out_shape=(
                out_shape,
                jax.ShapeDtypeStruct((n, h_out, w_out, s_head),
                                     jnp.uint8),
            ),
            grid=grid,
            in_specs=w_specs + _row_specs(r_block + 1, r_block, h, w_in,
                                          c),
            out_specs=(out_spec, head_spec),
            scratch_shapes=[scratch],
            interpret=_interp(interpret),
        )(*parts, *([x] * (r_block + 1)))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=w_specs + _row_specs(r_block + 1, r_block, h, w_in, c),
        out_specs=out_spec,
        scratch_shapes=[scratch],
        interpret=_interp(interpret),
    )(*parts, *([x] * (r_block + 1)))


@functools.partial(
    jax.jit, static_argnames=("relu", "r_block", "pool_pairs", "interpret")
)
def conv2x2_pool_flat(x, w, b, *, relu: bool = True,
                      r_block: Optional[int] = None,
                      pool_pairs: bool = False,
                      quant=None,
                      interpret: bool = False):
    """conv2x2_flat plus the fused 2x2/2 slot-max pool: returns
    (y [N,H-1,W-1,O], pooled [N,H-1,W-1,O//4]). The standalone XLA pool
    on the packed conv output costs a full extra HBM pass (measured
    14.9 ms on the 254² level at B=128); here it rides the epilogue.
    ``pool_pairs=True`` (even W-1 only) emits the pooled tensor
    column-paired as [N, H-1, (W-1)//2, O//2] — the next strided level's
    input layout."""
    n, h, w_in, c = x.shape
    o = w.shape[-1]
    assert _qualifies(c, o), (c, o)
    assert o % 4 == 0
    h_out, w_out = h - 1, w_in - 1
    assert not (pool_pairs and w_out % 2), (w_out, "pairs need even W-1")
    if r_block is None:
        r_block = _auto_r(h_out)
    r_block = max(1, min(r_block, h_out))
    grid = (n, pl.cdiv(h_out, r_block))
    qparts, qspecs, qflags, cdt, out_dtype = _quant_parts(
        w, b, quant, x.dtype
    )
    wt = qparts[0]
    if qflags[0]:
        parts = [
            jnp.concatenate([wt[0, 0], wt[1, 0]], axis=0),
            jnp.concatenate([wt[0, 1], wt[1, 1]], axis=0),
        ] + qparts[1:]
        n_w = 2
    else:
        parts = [wt[0, 0], wt[0, 1], wt[1, 0], wt[1, 1]] + qparts[1:]
        n_w = 4
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w + [
        sp or pl.BlockSpec(memory_space=pltpu.VMEM) for sp in qspecs[1:]
    ]
    if pool_pairs:
        sel_dt = jnp.int8 if qflags[2] else x.dtype
        eye = np.zeros((w_out // 2, w_out), np.float32)
        eye[np.arange(w_out // 2), 2 * np.arange(w_out // 2)] = 1.0
        sel_e_m = jnp.asarray(eye, sel_dt)
        eye_o = np.zeros((w_out // 2, w_out), np.float32)
        eye_o[np.arange(w_out // 2), 2 * np.arange(w_out // 2) + 1] = 1.0
        sel_o_m = jnp.asarray(eye_o, sel_dt)
        parts = [sel_e_m, sel_o_m] + parts
        w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + w_specs
    kernel = functools.partial(
        _conv2x2_kernel_pool, r_block, w_in, w_out, relu, out_dtype,
        pool_pairs, *qflags,
    )
    stride = _stride_for(w_in, qflags[0])
    out_spec = pl.BlockSpec(
        (1, r_block, w_out, o),
        lambda n_, i: (n_, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    pool_shape = (
        (n, h_out, w_out // 2, o // 2) if pool_pairs
        else (n, h_out, w_out, o // 4)
    )
    pool_spec = pl.BlockSpec(
        (1, r_block) + pool_shape[2:],
        lambda n_, i: (n_, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    scratch = (
        pltpu.VMEM((r_block * stride, 2 * c), cdt) if qflags[0]
        else pltpu.VMEM(((r_block + 1) * stride, c), cdt)
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, h_out, w_out, o), out_dtype),
            jax.ShapeDtypeStruct(pool_shape, out_dtype),
        ),
        grid=grid,
        in_specs=w_specs + _row_specs(r_block + 1, r_block, h, w_in, c),
        out_specs=(out_spec, pool_spec),
        scratch_shapes=[scratch],
        interpret=_interp(interpret),
    )(*parts, *([x] * (r_block + 1)))


# ---------------------------------------------------------- conv2x2 dual
def _conv2x2_dual_kernel(r_block, w_in, w_out, relu, out_dtype,
                         a_col_off, slot_phase, n_a, quant, in_int8,
                         out_int8, *refs):
    if quant:
        # wide-K int8 (see _conv2x2_kernel): per side, 2 dots of K=2C
        wa = refs[:2]
        wb = refs[2:4]
        bias = refs[4]
        k = 5
    else:
        wa = refs[:4]
        wb = refs[4:8]
        bias = refs[8]
        k = 9
    sc_a = sc_b = ai_a = ai_b = out_inv = None
    if quant:
        a_inline, b_inline = in_int8  # (inline_a, inline_b) flags
        sc_a = refs[k]; sc_b = refs[k + 1]; k += 2
        if a_inline:
            ai_a = refs[k]; k += 1
        if b_inline:
            ai_b = refs[k]; k += 1
        if out_int8:
            out_inv = refs[k]; k += 1
    rows_a = refs[k : k + n_a]
    rows_b = refs[k + n_a : k + n_a + r_block + 1]
    out = refs[k + n_a + r_block + 1]
    xa = refs[k + n_a + r_block + 2]
    xb = refs[k + n_a + r_block + 3]
    stride = _stride_for(w_in, quant)
    pref = _INT8_PREF if quant else jnp.float32
    c_lane = rows_b[0].shape[-1]

    def put(xs, j, v):
        """Store row j's value: plain slot, or (int8 wide-K) both lane
        slots — lo of row j and hi of row j-1."""
        if not quant:
            xs[j * stride : j * stride + w_in, :] = v
            return
        if j < r_block:
            xs[j * stride : j * stride + w_in, :c_lane] = v
        if j >= 1:
            xs[(j - 1) * stride : (j - 1) * stride + w_in, c_lane:] = v

    for j in range(r_block + 1):
        if slot_phase is None:
            # xa rows come from the (wider) skip tensor: the center-crop's
            # column offset applies here, its row offset in the index map
            # — the crop never materializes.
            put(xa, j, _quant_rows(
                rows_a[j][0, 0, a_col_off : a_col_off + w_in, :], ai_a
            ) if quant else (
                rows_a[j][0, 0, a_col_off : a_col_off + w_in, :]
            ))
        else:
            # ODD-offset center-crop = slot-phase shift (unet_fast.
            # packed_center_crop_flat): output slot (d, e) reads input
            # slot ((oh+d)%2, (ow+e)%2) at packed offset
            # ((oh+d)//2, (ow+e)//2). Four lane-group copies per row
            # replace an XLA slice+stack that cost a ~4.5 ms relayout.
            oh, ow = slot_phase
            cg = c_lane // 4
            for s_out in range(4):
                d, e = s_out // 2, s_out % 2
                src = 2 * ((oh + d) % 2) + ((ow + e) % 2)
                ro_d = (oh + d) // 2 - oh // 2
                co = (ow + e) // 2
                grp = rows_a[j + ro_d][0, 0, co : co + w_in,
                                       src * cg : (src + 1) * cg]
                grp = _quant_rows(grp, ai_a) if quant else grp
                if not quant:
                    xa[j * stride : j * stride + w_in,
                       s_out * cg : (s_out + 1) * cg] = grp
                else:
                    if j < r_block:
                        xa[j * stride : j * stride + w_in,
                           s_out * cg : (s_out + 1) * cg] = grp
                    if j >= 1:
                        xa[(j - 1) * stride : (j - 1) * stride + w_in,
                           c_lane + s_out * cg
                           : c_lane + (s_out + 1) * cg] = grp
        put(xb, j, _quant_rows(rows_b[j][0, 0], ai_b) if quant
            else rows_b[j][0, 0])
    if quant:
        lo_a = xa[0 : r_block * stride, :]
        lo_b = xb[0 : r_block * stride, :]
        keep_a = jnp.dot(lo_a, wa[0][:], preferred_element_type=pref)
        shift_a = jnp.dot(lo_a, wa[1][:], preferred_element_type=pref)
        keep_b = jnp.dot(lo_b, wb[0][:], preferred_element_type=pref)
        shift_b = jnp.dot(lo_b, wb[1][:], preferred_element_type=pref)
    else:
        lo_a = xa[0 : r_block * stride, :]
        hi_a = xa[stride : (r_block + 1) * stride, :]
        lo_b = xb[0 : r_block * stride, :]
        hi_b = xb[stride : (r_block + 1) * stride, :]
        keep_a = jnp.dot(lo_a, wa[0][:], preferred_element_type=pref)
        keep_a += jnp.dot(hi_a, wa[2][:], preferred_element_type=pref)
        shift_a = jnp.dot(lo_a, wa[1][:], preferred_element_type=pref)
        shift_a += jnp.dot(hi_a, wa[3][:], preferred_element_type=pref)
        keep_b = jnp.dot(lo_b, wb[0][:], preferred_element_type=pref)
        keep_b += jnp.dot(hi_b, wb[2][:], preferred_element_type=pref)
        shift_b = jnp.dot(lo_b, wb[1][:], preferred_element_type=pref)
        shift_b += jnp.dot(hi_b, wb[3][:], preferred_element_type=pref)
    acc_a = keep_a + pltpu.roll(shift_a, shift_a.shape[0] - 1, 0)
    acc_b = keep_b + pltpu.roll(shift_b, shift_b.shape[0] - 1, 0)
    if quant:
        # the two operands carry independent dequant scales, so they sum
        # AFTER per-channel rescale
        acc = (acc_a.astype(jnp.float32) * sc_a[:]
               + acc_b.astype(jnp.float32) * sc_b[:])
    else:
        acc = acc_a + acc_b
    for r in range(r_block):
        out[0, r] = _epilogue(
            acc[r * stride : r * stride + w_out], bias, relu, out_dtype,
            None, out_inv,
        )


@functools.partial(
    jax.jit,
    static_argnames=("relu", "r_block", "a_offset", "a_slot_phase",
                     "interpret"),
)
def conv2x2_dual_flat(xa, xb, wa, wb, b, *, relu: bool = True,
                      r_block: Optional[int] = None,
                      a_offset=(0, 0),
                      a_slot_phase=None,
                      quant=None,
                      interpret: bool = False):
    """conv2x2(xa, wa) + conv2x2(xb, wb) + b — the concat-free decoder
    conv (skip/up split). xb sets the output geometry; xa may be LARGER
    with ``a_offset=(row, col)`` selecting the aligned window (the skip
    center-crop, folded into the kernel's reads — no sliced copy)."""
    if a_slot_phase is not None:
        # UNPACKED odd center-crop offsets (oh, ow); subsumes row/col
        # offsets. Needs one extra skip row ref (the d=1 phase).
        ro, co = a_slot_phase[0] // 2, None
        extra_row = 1
    else:
        ro, co = a_offset
        extra_row = 0
    n, h, w_in, c = xb.shape
    assert xa.shape[0] == n and xa.shape[3] == c, (xa.shape, xb.shape)
    assert (
        xa.shape[1] >= h + ro + extra_row
        and xa.shape[2] * 2 >= 2 * w_in + (a_slot_phase or a_offset)[1]
    ), (xa.shape, xb.shape, a_offset, a_slot_phase)
    o = wa.shape[-1]
    assert _qualifies(c, o), (c, o)
    h_out, w_out = h - 1, w_in - 1
    if r_block is None:
        r_block = _auto_r(h_out)
    r_block = max(1, min(r_block, h_out))
    grid = (n, pl.cdiv(h_out, r_block))
    if quant is None:
        wta, wtb = wa.astype(xb.dtype), wb.astype(xb.dtype)
        qflags = (False, False, False)
        cdt, out_dtype = xb.dtype, xb.dtype
        extra_parts, extra_specs = [], []
    else:
        wta, wtb = wa, wb  # already int8
        # each side independently int8-resident (no act_scale_X) or bf16
        # (inline-quantized with act_scale_X) — the skip arrives int8
        # while the (bf16) deconv output quantizes in-kernel
        a_inline = quant.get("act_scale_a") is not None
        b_inline = quant.get("act_scale_b") is not None
        out_int8 = quant.get("out_scale") is not None
        qflags = (True, (a_inline, b_inline), out_int8)
        cdt = jnp.int8
        out_dtype = jnp.int8 if out_int8 else (
            jnp.bfloat16 if xb.dtype == jnp.int8 else xb.dtype
        )
        extra_parts = [
            jnp.asarray(quant["chan_scale_a"], jnp.float32),
            jnp.asarray(quant["chan_scale_b"], jnp.float32),
        ]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        for key, on in (("act_scale_a", a_inline),
                        ("act_scale_b", b_inline)):
            if on:
                arr, spec = _smem_scalar(1.0 / quant[key])
                extra_parts.append(arr); extra_specs.append(spec)
        if out_int8:
            arr, spec = _smem_scalar(1.0 / quant["out_scale"])
            extra_parts.append(arr); extra_specs.append(spec)
    if quant is not None:
        parts = [
            jnp.concatenate([wta[0, 0], wta[1, 0]], axis=0),
            jnp.concatenate([wta[0, 1], wta[1, 1]], axis=0),
            jnp.concatenate([wtb[0, 0], wtb[1, 0]], axis=0),
            jnp.concatenate([wtb[0, 1], wtb[1, 1]], axis=0),
            b.astype(jnp.float32),
        ] + extra_parts
        n_w = 5
    else:
        parts = [wta[0, 0], wta[0, 1], wta[1, 0], wta[1, 1],
                 wtb[0, 0], wtb[0, 1], wtb[1, 0], wtb[1, 1],
                 b.astype(jnp.float32)] + extra_parts
        n_w = 9
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w + extra_specs

    def mk_a(u):
        return pl.BlockSpec(
            (1, 1, xa.shape[2], c),
            lambda n_, i, u=u: (
                n_,
                jnp.minimum(i * r_block + u + ro, xa.shape[1] - 1),
                0, 0,
            ),
            memory_space=pltpu.VMEM,
        )

    n_a = r_block + 1 + extra_row
    row_specs_a = [mk_a(u) for u in range(n_a)]
    row_specs = _row_specs(r_block + 1, r_block, h, w_in, c)
    kernel = functools.partial(
        _conv2x2_dual_kernel, r_block, w_in, w_out, relu, out_dtype, co,
        a_slot_phase, n_a, *qflags,
    )
    stride = _stride_for(w_in, qflags[0])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, o), out_dtype),
        grid=grid,
        in_specs=w_specs + row_specs_a + row_specs,
        out_specs=pl.BlockSpec(
            (1, r_block, w_out, o),
            lambda n_, i: (n_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(
            [
                pltpu.VMEM((r_block * stride, 2 * c), cdt),
                pltpu.VMEM((r_block * stride, 2 * c), cdt),
            ]
            if quant is not None
            else [
                pltpu.VMEM(((r_block + 1) * stride, c), cdt),
                pltpu.VMEM(((r_block + 1) * stride, c), cdt),
            ]
        ),
        interpret=_interp(interpret),
    )(*parts, *([xa] * n_a), *([xb] * (r_block + 1)))


# ------------------------------------------------------------ conv4x4s2
def _conv4x4s2_kernel(r_block, w2_in, w_out, relu, out_dtype, quant,
                      in_int8, out_int8, *refs):
    """Row-stacked strided kernel: out row r consumes input rows 2r..2r+3
    (pair view [W/2, 2C]); the 4 row-taps stack into the LANE dim of one
    scratch (K = 8C), so the whole block is TWO [R*S, 8C] @ [8C, O4]
    matmuls — keep (pair j) and shift (pair j+1, applied by one f32 roll
    of the product)."""
    wk = refs[0]           # [8C, O4] pair-j taps, u-stacked
    ws = refs[1]           # [8C, O4] pair-(j+1) taps
    bias = refs[2]
    k = 3
    chan_scale = act_inv = out_inv = None
    if quant:
        chan_scale = refs[k]; k += 1
        if not in_int8:
            act_inv = refs[k]; k += 1
        if out_int8:
            out_inv = refs[k]; k += 1
    rows = refs[k : k + 2 * r_block + 2]
    out = refs[k + 2 * r_block + 2]
    x4 = refs[k + 2 * r_block + 3]                       # [R*S, 8C]
    c2 = rows[0].shape[-1]
    stride = _stride_for(w2_in, quant)
    pref = _INT8_PREF if quant else jnp.float32
    for r in range(r_block):
        for u in range(4):
            x4[r * stride : r * stride + w2_in,
               u * c2 : (u + 1) * c2] = (
                _quant_rows(rows[2 * r + u][0, 0], act_inv) if quant
                else rows[2 * r + u][0, 0]
            )
    keep = jnp.dot(x4[:], wk[:], preferred_element_type=pref)
    shift = jnp.dot(x4[:], ws[:], preferred_element_type=pref)
    acc = keep + pltpu.roll(shift, shift.shape[0] - 1, 0)
    for r in range(r_block):
        out[0, r] = _epilogue(
            acc[r * stride : r * stride + w_out], bias, relu, out_dtype,
            chan_scale, out_inv,
        )


@functools.partial(
    jax.jit, static_argnames=("relu", "r_block", "paired", "interpret")
)
def conv4x4s2_flat(x, w4, b, *, relu: bool = True, r_block: int = 8,
                   paired: bool = False, quant=None,
                   interpret: bool = False):
    """4×4 stride-2 VALID conv (the strided s2d entry conv): unpacked
    input [N, H, W, C] (W even), packed flat output
    [N, (H-2)//2, (W-2)//2, O4]. Requires 2C and O4 to be 128-multiples
    (C=32 entry: 2C=64 -> handled by the pair view ONLY when 2C%128==0;
    callers fall back to XLA otherwise)."""
    if paired:
        # x is ALREADY the pair view [N, H, W/2, 2C] (e.g. the fused
        # conv+pool kernel's pool_pairs output) — no reshape anywhere.
        n, h, w2_in, c2 = x.shape
        c = c2 // 2
        w_in = 2 * w2_in
        xp = x
    else:
        n, h, w_in, c = x.shape
        assert w_in % 2 == 0, w_in
        w2_in = w_in // 2
        # pair view [N, H, W/2, 2C]: produced by the (XLA) upstream
        # region, so the relayout to Pallas row-major fuses with whatever
        # copy the XLA->Pallas boundary needs anyway. (Mosaic cannot
        # shape-cast sublanes into lanes in-kernel.)
        xp = x.reshape(n, h, w2_in, 2 * c)
    o4 = w4.shape[-1]
    # 2C=64 (the C=32 entry site) is allowed: K=64 matmuls half-fill the
    # MXU contraction dim, but the site is small and the XLA alternative
    # pads lanes 4x. Lane dim O4 stays 128-strict.
    assert (2 * c) % 64 == 0 and o4 % 128 == 0, (c, o4)
    h_out, w_out = (h - 2) // 2, (w_in - 2) // 2
    r_block = max(1, min(r_block, h_out))
    grid = (n, pl.cdiv(h_out, r_block))
    wt = w4 if w4.dtype == jnp.int8 else w4.astype(x.dtype)
    # pair j covers cols (2j, 2j+1) = taps (v=0, v=1); pair j+1 covers
    # taps (v=2, v=3). Column taps stack into K=2C per row-tap u; the 4
    # row-taps stack into K=8C (matching the kernel's lane-stacked
    # scratch).
    wk = jnp.concatenate(
        [jnp.concatenate([wt[u, 0], wt[u, 1]], axis=0) for u in range(4)],
        axis=0,
    )
    ws = jnp.concatenate(
        [jnp.concatenate([wt[u, 2], wt[u, 3]], axis=0) for u in range(4)],
        axis=0,
    )
    parts = [wk, ws, b.astype(jnp.float32)]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    if quant is None:
        qflags = (False, False, False)
        cdt, out_dtype = x.dtype, x.dtype
    else:
        in_int8 = quant.get("act_scale") is None
        out_int8 = quant.get("out_scale") is not None
        qflags = (True, in_int8, out_int8)
        cdt = jnp.int8
        out_dtype = jnp.int8 if out_int8 else (
            jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype
        )
        parts.append(jnp.asarray(quant["chan_scale"], jnp.float32))
        w_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if not in_int8:
            arr, spec = _smem_scalar(1.0 / quant["act_scale"])
            parts.append(arr); w_specs.append(spec)
        if out_int8:
            arr, spec = _smem_scalar(1.0 / quant["out_scale"])
            parts.append(arr); w_specs.append(spec)

    def mk(u):
        return pl.BlockSpec(
            (1, 1, w2_in, 2 * c),
            lambda n_, i, u=u: (
                n_, jnp.minimum(2 * i * r_block + u, h - 1), 0, 0
            ),
            memory_space=pltpu.VMEM,
        )

    row_specs = [mk(u) for u in range(2 * r_block + 2)]
    kernel = functools.partial(
        _conv4x4s2_kernel, r_block, w2_in, w_out, relu, out_dtype, *qflags
    )
    stride = _stride_for(w2_in, qflags[0])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, o4), out_dtype),
        grid=grid,
        in_specs=w_specs + row_specs,
        out_specs=pl.BlockSpec(
            (1, r_block, w_out, o4),
            lambda n_, i: (n_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((r_block * stride, 8 * c), cdt),
        ],
        interpret=_interp(interpret),
    )(*parts, *([xp] * (2 * r_block + 2)))


# ------------------------------------------------------- rowwise matmul
def _matmul_rows_kernel(r_block, w_in, relu, out_dtype, quant, in_int8,
                        out_int8, *refs):
    wm, bias = refs[0], refs[1]
    k = 2
    chan_scale = act_inv = out_inv = None
    if quant:
        chan_scale = refs[k]; k += 1
        if not in_int8:
            act_inv = refs[k]; k += 1
        if out_int8:
            out_inv = refs[k]; k += 1
    rows = refs[k : k + r_block]
    out = refs[k + r_block]
    xs = refs[k + r_block + 1]
    stride = _stride_for(w_in, quant)
    pref = _INT8_PREF if quant else jnp.float32
    for j in range(r_block):
        xs[j * stride : j * stride + w_in, :] = (
            _quant_rows(rows[j][0, 0], act_inv) if quant else rows[j][0, 0]
        )
    acc = jnp.dot(xs[:], wm[:], preferred_element_type=pref)
    for r in range(r_block):
        out[0, r] = _epilogue(
            acc[r * stride : r * stride + w_in], bias, relu, out_dtype,
            chan_scale, out_inv,
        )


@functools.partial(
    jax.jit, static_argnames=("relu", "r_block", "interpret")
)
def matmul_rows_flat(x, wm, b, *, relu: bool = True,
                     r_block: Optional[int] = None,
                     quant=None,
                     interpret: bool = False):
    """Per-pixel channel matmul [N,H,W,C] @ [C,K] -> [N,H,W,K] with fused
    bias+relu (the 2×2/2 transposed conv with unpacked input IS this —
    the output lands pre-packed). Pallas so the packed decoder chain stays
    row-major end to end."""
    n, h, w_in, c = x.shape
    k = wm.shape[-1]
    assert c % 128 == 0 and k % 128 == 0, (c, k)
    if r_block is None:
        r_block = _auto_r(h)
    r_block = max(1, min(r_block, h))
    grid = (n, pl.cdiv(h, r_block))
    wmt = wm if wm.dtype == jnp.int8 else wm.astype(x.dtype)
    parts = [wmt, b.astype(jnp.float32)]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    if quant is None:
        qflags = (False, False, False)
        cdt, out_dtype = x.dtype, x.dtype
    else:
        in_int8 = quant.get("act_scale") is None
        out_int8 = quant.get("out_scale") is not None
        qflags = (True, in_int8, out_int8)
        cdt = jnp.int8
        out_dtype = jnp.int8 if out_int8 else (
            jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype
        )
        parts.append(jnp.asarray(quant["chan_scale"], jnp.float32))
        w_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if not in_int8:
            arr, spec = _smem_scalar(1.0 / quant["act_scale"])
            parts.append(arr); w_specs.append(spec)
        if out_int8:
            arr, spec = _smem_scalar(1.0 / quant["out_scale"])
            parts.append(arr); w_specs.append(spec)
    kernel = functools.partial(
        _matmul_rows_kernel, r_block, w_in, relu, out_dtype, *qflags
    )
    stride = _stride_for(w_in, qflags[0])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w_in, k), out_dtype),
        grid=grid,
        in_specs=w_specs + _row_specs(r_block, r_block, h, w_in, c),
        out_specs=pl.BlockSpec(
            (1, r_block, w_in, k),
            lambda n_, i: (n_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((r_block * stride, c), cdt)],
        interpret=_interp(interpret),
    )(*parts, *([x] * r_block))


# ---------------------------------------------------- deconv (packed in)
def _deconv_packed_kernel(r_half, w_in, relu, out_dtype, quant, in_int8,
                          out_int8, *refs):
    # wsel[a][b]: [4C, 4O] = wm rows placed at slot block (2a+b)
    il_e, il_o = refs[:2]        # [2J, J] interleave selectors
    wsel = refs[2:6]
    bias = refs[6]
    k = 7
    chan_scale = act_inv = out_inv = None
    if quant:
        chan_scale = refs[k]; k += 1
        if not in_int8:
            act_inv = refs[k]; k += 1
        if out_int8:
            out_inv = refs[k]; k += 1
    rows = refs[k : k + r_half]
    out = refs[k + r_half]
    xs = refs[k + r_half + 1]
    stride = _stride_for(w_in, quant)
    pref = _INT8_PREF if quant else jnp.float32
    il_dt = jnp.bfloat16 if quant else out_dtype
    for j in range(r_half):
        xs[j * stride : j * stride + w_in, :] = (
            _quant_rows(rows[j][0, 0], act_inv) if quant else rows[j][0, 0]
        )
    prods = [
        jnp.dot(xs[:], wsel[si][:], preferred_element_type=pref)
        for si in range(4)
    ]
    for r in range(2 * r_half):
        a, i_loc = r % 2, r // 2
        p0 = prods[2 * a][i_loc * stride : i_loc * stride + w_in]
        p1 = prods[2 * a + 1][i_loc * stride : i_loc * stride + w_in]
        if quant:  # dequant before the (bf16) interleave matmuls
            p0 = p0.astype(jnp.float32) * chan_scale[:]
            p1 = p1.astype(jnp.float32) * chan_scale[:]
        # column interleave out[2j+b] = p_b[j] as two selection matmuls
        # (stack+reshape lowers to sublane relayout copies in Mosaic)
        y = jnp.dot(il_e[:], p0.astype(il_dt),
                    preferred_element_type=jnp.float32)
        y += jnp.dot(il_o[:], p1.astype(il_dt),
                     preferred_element_type=jnp.float32)
        out[0, r] = _epilogue(y, bias, relu, out_dtype, None, out_inv)


@functools.partial(
    jax.jit, static_argnames=("relu", "r_block", "interpret")
)
def deconv_packed_flat(x4, wm, b, *, relu: bool = True,
                       r_block: Optional[int] = None,
                       quant=None,
                       interpret: bool = False):
    """2×2/2 transposed conv, FLAT packed input → FLAT packed output:
    [N, I, J, 4C] @ wm [C, 4O] -> [N, 2I, 2J, 4O]. Input slot (a,b) of
    packed pixel (i,j) contributes output packed pixel (2i+a, 2j+b); the
    slot scatter is done by 4 masked-weight matmuls (zeros outside the
    source slot block) + a free row-major column interleave — replacing
    an 8-D XLA transpose chain (~5 ms of relayout copies at 512²/B=128).
    """
    n, i_in, j_in, c4 = x4.shape
    c = c4 // 4
    o4 = wm.shape[-1]
    assert c4 % 128 == 0 and o4 % 128 == 0, (c4, o4)
    if r_block is None:
        r_block = _auto_r(2 * i_in)
    r_block = max(2, min(r_block + r_block % 2, 2 * i_in))  # even
    r_half = r_block // 2
    grid = (n, pl.cdiv(2 * i_in, r_block))
    if quant is None:
        qflags = (False, False, False)
        cdt, out_dtype, il_dt = x4.dtype, x4.dtype, x4.dtype
        extra_parts, extra_specs = [], []
    else:
        in_int8 = quant.get("act_scale") is None
        out_int8 = quant.get("out_scale") is not None
        qflags = (True, in_int8, out_int8)
        cdt = jnp.int8
        out_dtype = jnp.int8 if out_int8 else (
            jnp.bfloat16 if x4.dtype == jnp.int8 else x4.dtype
        )
        il_dt = jnp.bfloat16
        extra_parts = [jnp.asarray(quant["chan_scale"], jnp.float32)]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
        if not in_int8:
            arr, spec = _smem_scalar(1.0 / quant["act_scale"])
            extra_parts.append(arr); extra_specs.append(spec)
        if out_int8:
            arr, spec = _smem_scalar(1.0 / quant["out_scale"])
            extra_parts.append(arr); extra_specs.append(spec)
    wmt = wm if wm.dtype == jnp.int8 else wm.astype(x4.dtype)
    zeros = jnp.zeros((c4, o4), wmt.dtype)
    wsel = []
    for s in range(4):
        ws = zeros.at[s * c : (s + 1) * c].set(wmt)
        wsel.append(ws)
    il_e = np.zeros((2 * j_in, j_in), np.float32)
    il_e[2 * np.arange(j_in), np.arange(j_in)] = 1.0
    il_o = np.zeros((2 * j_in, j_in), np.float32)
    il_o[2 * np.arange(j_in) + 1, np.arange(j_in)] = 1.0
    parts = [jnp.asarray(il_e, il_dt), jnp.asarray(il_o, il_dt)]
    parts += wsel + [b.astype(jnp.float32)] + extra_parts
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7 + extra_specs

    def mk(u):
        return pl.BlockSpec(
            (1, 1, j_in, c4),
            lambda n_, i, u=u: (
                n_, jnp.minimum(i * r_half + u, i_in - 1), 0, 0
            ),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _deconv_packed_kernel, r_half, j_in, relu, out_dtype, *qflags
    )
    stride = _stride_for(j_in, qflags[0])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 2 * i_in, 2 * j_in, o4),
                                       out_dtype),
        grid=grid,
        in_specs=w_specs + [mk(u) for u in range(r_half)],
        out_specs=pl.BlockSpec(
            (1, r_block, 2 * j_in, o4),
            lambda n_, i: (n_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((r_half * stride, c4), cdt)],
        interpret=_interp(interpret),
    )(*parts, *([x4] * r_half))
