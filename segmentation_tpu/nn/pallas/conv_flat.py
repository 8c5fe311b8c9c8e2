"""Padded-flat Pallas conv kernels: the zero-fill formulation.

The conv.py kernels stream H-rows through VMEM but pay a per-row tax
twice per grid step: R+1 input rows are copied into a sublane-aligned
scratch (so the taps become big matmuls), and R output rows are stored
one slice at a time (the output block's W dim is not sublane-aligned).
At the big U-Net sites that tax is comparable to the matmul time itself
(measured ~3 µs of a 4.6 µs grid step on the 254²/C=128 site).

This module moves the alignment into the HBM layout instead: activations
live as 3-D flat tensors ``[N, HP·S, C]`` where row r occupies flat rows
``r·S .. r·S+W-1`` and S = W rounded up to the sublane tile (8 for
bf16/f32, 32 for int8 — the (32, 128) int8 VMEM tile). Columns W..S-1
are junk (finite garbage); rows past the real H are junk. Then:

  - a grid step's R input rows are ONE contiguous Blocked block
    ``[R·S, C]`` — no gather, no scratch, no copies;
  - all four 2×2 taps are matmuls of the SAME block: the column tap is a
    sublane roll of the f32/i32 product by 1, the ROW tap a roll by S
    (row stride is exactly S, so "next row" is "+S flat rows");
  - the row tap's last output row reads row R, outside the block — it is
    patched with two small dots against a one-row extra ref;
  - the epilogue (dequant/bias/relu/requant) runs over the whole
    ``[R·S, O]`` accumulator and stores in TWO slices (rows 0..R-2 and
    the patched last row) — both sublane-aligned.

Junk propagation is self-contained: a real output column j < W-1 only
reads real inputs (j, j+1 ≤ W-1); junk columns/rows only ever feed junk
columns/rows, and every consumer reads the real window. All values stay
finite (junk is computed from real data plus roll wrap-around), so no
masking is needed anywhere.

int8 note: these kernels use four K=C dots (the MXU runs int8 at the
bf16 rate below K=256, so the dots cost the same as bf16's) — the win
over conv.py's wide-K formulation is eliminating the fill, not the MXU
time; at the bandwidth-bound U-Net sites that is the larger term.

Parity: tests/test_conv_flat.py pins every kernel against the conv.py
kernels / lax.conv oracles. Reference behavior: 3×3 VALID conv slim
semantics per SURVEY §2 (/root/reference/models/basemodel.py conv
stacks), re-expressed in the s2d packed layout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segmentation_tpu.nn.pallas.conv import (
    _auto_r,
    _epilogue,
    _epilogue_parts,
    _fit_r,
    _quant_parts,
    _quant_rows,
    _smem_scalar,
)

_INT8_PREF = jnp.int32


def _interp(flag: bool) -> bool:
    """interpret-mode override: SEG_PALLAS_INTERPRET=1 forces every
    padflat kernel into interpret mode (CPU model-level parity tests)."""
    import os

    return flag or os.environ.get("SEG_PALLAS_INTERPRET") == "1"


def stride_for(w: int, dtype) -> int:
    """Flat row stride: W rounded to the sublane tile of ``dtype``."""
    t = 32 if dtype == jnp.int8 else 8
    return (w + t - 1) // t * t


def pad_rows(x4: jnp.ndarray, s: int, hp: Optional[int] = None):
    """[N, H, W, C] → flat [N, HP·S, C] (XLA-side; one fused pad+reshape
    copy — used at region entry and in tests)."""
    n, h, w, c = x4.shape
    hp = hp or h
    x4 = jnp.pad(x4, ((0, 0), (0, hp - h), (0, s - w), (0, 0)))
    return x4.reshape(n, hp * s, c)


def unpad_rows(xf: jnp.ndarray, s: int, h: int, w: int):
    """flat [N, HP·S, C] → [N, h, w, C] real window."""
    n, hps, c = xf.shape
    return xf.reshape(n, hps // s, s, c)[:, :h, :w, :]


def pad_pairs(x4: jnp.ndarray, s2: int, hp: Optional[int] = None):
    """[N, H, W, C] → pf2 [N, HP·S2, 2C]: column pair (2j, 2j+1) becomes
    one flat row of 2C lanes at pair stride S2 (XLA-side; tests and
    region entry)."""
    n, h, w, c = x4.shape
    hp = hp or h
    x4 = jnp.pad(x4, ((0, 0), (0, hp - h), (0, 2 * s2 - w), (0, 0)))
    return x4.reshape(n, hp * s2, 2 * c)


def unpad_pairs(xf: jnp.ndarray, s2: int, h: int, w: int):
    """pf2 [N, HP·S2, 2C] → [N, h, w, C] real window."""
    n, hps2, c2 = xf.shape
    hp = hps2 // s2
    x = xf.reshape(n, hp, 2 * s2, c2 // 2)
    return x[:, :h, :w, :]


def _rolldn(v, d):
    """Shift toward lower flat rows by d: out[k] = v[k + d] (wraps)."""
    return pltpu.roll(v, v.shape[0] - d, 0)


def _rolldn8(v, d):
    """int8 sublane roll: Mosaic has no int8 rotate, so roll the
    sublane-packed int32 bitcast view (4 int8 rows per int32 row).
    Requires d and the row count to be multiples of 4 — always true in
    the int8 region, where strides are 32-aligned."""
    assert d % 4 == 0 and v.shape[0] % 4 == 0, (d, v.shape)
    v32 = pltpu.bitcast(v, jnp.int32)
    return pltpu.bitcast(
        pltpu.roll(v32, v32.shape[0] - d // 4, 0), jnp.int8
    )


def _acc_taps(x_main, x_next, w00, w01, w10, w11, s, r_block, pref):
    """Four-tap accumulator on a flat block.

    Returns (acc_main [(R-1)·S, O] region valid, acc_last [S, O]): the
    main roll-based accumulation is valid for output rows 0..R-2; the
    last row's row-tap contribution comes from x_next.
    """
    p00 = jnp.dot(x_main, w00, preferred_element_type=pref)
    p01 = jnp.dot(x_main, w01, preferred_element_type=pref)
    p10 = jnp.dot(x_main, w10, preferred_element_type=pref)
    p11 = jnp.dot(x_main, w11, preferred_element_type=pref)
    keep = p00 + _rolldn(p01, 1)
    acc = keep + _rolldn(p10, s) + _rolldn(p11, s + 1)
    pn0 = jnp.dot(x_next, w10, preferred_element_type=pref)
    pn1 = jnp.dot(x_next, w11, preferred_element_type=pref)
    last = keep[(r_block - 1) * s :] + pn0 + _rolldn(pn1, 1)
    return acc, last


def _acc_taps_stacked8(x_main, x_next, ws, s, r_block):
    """int8 _acc_taps with the ROW taps stacked into the contraction:
    ws = [w00; w10; w01; w11] as one [4C, O] operand → two K=2C dots
    (the operand row shift is an int8 bitcast roll, the column shift an
    int32 product roll). At C=256 that is K=512, where the int8 MXU
    runs at 2× the bf16 rate; the four-K=C-dot form never gets there."""
    c = x_main.shape[-1]

    def d(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.int32)

    z4 = jnp.concatenate([x_main, _rolldn8(x_main, s)], axis=1)
    q_keep = d(z4, ws[0 : 2 * c])
    q_shift = d(z4, ws[2 * c : 4 * c])
    acc = q_keep + _rolldn(q_shift, 1)
    cut = (r_block - 1) * s
    xl = x_main[cut:]
    w00, w10 = ws[0:c], ws[c : 2 * c]
    w01, w11 = ws[2 * c : 3 * c], ws[3 * c : 4 * c]
    last = (d(xl, w00) + _rolldn(d(xl, w01) + d(x_next, w11), 1)
            + d(x_next, w10))
    return acc, last


def _pool_slots(y, out_inv):
    """Slot-max 2×2/2 pool on a flat [M, O] epilogue value: lane rolls
    (32-bit) + maxima; first O/4 lanes hold the max over all 4 slots."""
    o = y.shape[-1]
    yp = y.astype(jnp.int32) if out_inv is not None else y.astype(
        jnp.float32
    )
    m = jnp.maximum(yp, pltpu.roll(yp, o // 2, 1))
    m = jnp.maximum(m, pltpu.roll(m, o - o // 4, 1))
    return m[:, : o // 4]


def _split_store(out_ref, r_block, s, val_main, val_last):
    """Two aligned stores: rows 0..R-2 from the roll path, row R-1 from
    the patched value."""
    if r_block > 1:
        out_ref[0, 0 : (r_block - 1) * s] = val_main
    out_ref[0, (r_block - 1) * s : r_block * s] = val_last


def _conv2x2_padflat_kernel(
    r_block, s, relu, out_dtype, quant, in_int8, out_int8, has_head,
    head_only, pool, *refs
):
    if quant:  # stacked-K weights: one [4C, O] operand
        ws = refs[0]
        bias = refs[1]
        k = 2
    else:
        w00, w01, w10, w11 = refs[0:4]
        bias = refs[4]
        k = 5
    chan_scale = act_inv = out_inv = None
    if quant:
        chan_scale = refs[k]; k += 1
        if not in_int8:
            act_inv = refs[k]; k += 1
        if out_int8:
            out_inv = refs[k]; k += 1
    wd = bd = None
    if has_head:
        wd = refs[k]; bd = refs[k + 1]; k += 2
    x_main_ref, x_next_ref = refs[k], refs[k + 1]
    k += 2
    outs = refs[k:]

    x_main = _quant_rows(x_main_ref[0], act_inv)
    x_next = _quant_rows(x_next_ref[0], act_inv)
    if quant:
        acc, last = _acc_taps_stacked8(x_main, x_next, ws, s, r_block)
    else:
        acc, last = _acc_taps(
            x_main, x_next, w00[:], w01[:], w10[:], w11[:], s, r_block,
            jnp.float32,
        )

    # pre-cast epilogue: pool on the f32 value, finish (round/clip/cast)
    # applied after — monotone, so max∘finish == finish∘max, and the
    # pool skips the s8→s32 unpack/repack (see _epilogue_parts)
    yp_main, finish = _epilogue_parts(acc[: (r_block - 1) * s], bias,
                                      relu, out_dtype, chan_scale,
                                      out_inv)
    yp_last, _ = _epilogue_parts(last, bias, relu, out_dtype,
                                 chan_scale, out_inv)
    y_main, y_last = finish(yp_main), finish(yp_last)
    oi = 0
    if not head_only:
        _split_store(outs[oi], r_block, s, y_main, y_last)
        oi += 1
    if has_head:
        # fused nc=2 head+argmax: mask = (y @ (w1-w0) + (b1-b0) > 0),
        # evaluated on the STORED value (see conv.py's head story)
        def mk_mask(yv):
            hd = jnp.dot(yv.astype(jnp.bfloat16), wd[:],
                         preferred_element_type=jnp.float32)
            return (hd + bd[:] > 0).astype(jnp.uint8)

        _split_store(outs[oi], r_block, s, mk_mask(y_main),
                     mk_mask(y_last))
        oi += 1
    if pool:
        _split_store(
            outs[oi], r_block, s,
            finish(_pool_slots(yp_main, None)),
            finish(_pool_slots(yp_last, None)),
        )


def _q_extras(qparts, qspecs):
    parts = qparts[1:]
    specs = [sp or pl.BlockSpec(memory_space=pltpu.VMEM)
             for sp in qspecs[1:]]
    return parts, specs


@functools.partial(
    jax.jit,
    static_argnames=("h", "w_real", "s", "relu", "r_block", "pool",
                     "head_only", "interpret"),
)
def conv2x2_padflat(x, w, b, *, h: int, w_real: int, s: int,
                    relu: bool = True,
                    r_block: Optional[int] = None,
                    quant=None, head=None, head_only: bool = False,
                    pool: bool = False,
                    interpret: bool = False):
    """2×2 VALID conv on a padded-flat tensor.

    x: [N, HP·S, C] flat (real rows h, real cols w_real, stride s);
    w: [2, 2, C, O]; b: [O] tiled flat bias. Returns flat
    [N, (nb·R)·S, O] (real h-1 × w_real-1), plus optionally the fused
    uint8 head mask (``head=(wd, bd)``) and/or the fused slot-max pooled
    tensor (``pool=True`` → [N, (nb·R)·S, O/4]). ``head_only=True``
    drops the conv output itself — the final decoder conv's activation
    is dead once the mask exists, and not storing it saves its full HBM
    write. C, O must be 128-multiples.
    """
    n, hps, c = x.shape
    hp = hps // s
    o = w.shape[-1]
    assert c % 128 == 0 and o % 128 == 0, (c, o)
    assert head is not None or not head_only
    h_out = h - 1
    qparts, qspecs, qflags, cdt, out_dtype = _quant_parts(
        w, b, quant, x.dtype
    )
    ob = jnp.dtype(out_dtype).itemsize
    io_bytes = (x.dtype.itemsize * c
                + (0 if head_only else o * ob)
                + (head[0].shape[-1] if head is not None else 0)
                + (o // 4) * (1 if qflags[2] else ob) * pool)
    if r_block is None:
        r_block = _auto_r(h_out)
    # Float-epilogue pool kernels hold f32 pre-cast intermediates on the
    # Mosaic stack beyond the accumulator (the finish value the pool
    # reads, plus the pooled f32 lanes — pre-cast pooling, ef8362f):
    # measured 23.58M actual vs 13.00M modeled at r=16/s=256/o=256
    # (1024² bf16 MC compile failure) while the int8 epilogue's
    # requant+saturating cast fuses and stays within the old model
    # (c2_2 r=32 at 512² compiles and is the tuned win). Price two f32
    # row copies + the f32 pooled lanes on the float path only.
    epi_bytes = (8 * o + o) if (pool and not qflags[2]) else 0
    r_block = _fit_r(max(1, min(r_block, h_out)), s, io_bytes,
                     acc_bytes=4 * o + epi_bytes)
    nb = pl.cdiv(h_out, r_block)
    grid = (n, nb)
    assert head is None or not qflags[2], "head needs a float epilogue"
    wt = qparts[0]
    if qflags[0]:
        # stacked-K int8 weights [w00; w10; w01; w11] (row taps inside
        # the contraction — see _acc_taps_stacked8)
        parts = [
            jnp.concatenate([wt[0, 0], wt[1, 0], wt[0, 1], wt[1, 1]],
                            axis=0),
            qparts[1],
        ]
    else:
        parts = [wt[0, 0], wt[0, 1], wt[1, 0], wt[1, 1], qparts[1]]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(parts)
    eparts, especs = _q_extras(qparts[1:], qspecs[1:])
    parts += eparts
    in_specs += especs
    if head is not None:
        wd, bd = head
        parts += [wd.astype(jnp.bfloat16), bd.astype(jnp.float32)]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    # main block: R input rows, contiguous; extra ref: row i·R+R (clamped)
    in_specs += [
        pl.BlockSpec((1, r_block * s, c), lambda n_, i: (n_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, s, c),
            lambda n_, i: (n_, jnp.minimum(i * r_block + r_block, hp - 1),
                           0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_block = pl.BlockSpec((1, r_block * s, o),
                             lambda n_, i: (n_, i, 0),
                             memory_space=pltpu.VMEM)
    out_shapes, out_specs = [], []
    if not head_only:
        out_shapes.append(
            jax.ShapeDtypeStruct((n, nb * r_block * s, o), out_dtype)
        )
        out_specs.append(out_block)
    if head is not None:
        sh = head[0].shape[-1]
        out_shapes.append(
            jax.ShapeDtypeStruct((n, nb * r_block * s, sh), jnp.uint8)
        )
        out_specs.append(
            pl.BlockSpec((1, r_block * s, sh), lambda n_, i: (n_, i, 0),
                         memory_space=pltpu.VMEM)
        )
    if pool:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (n, nb * r_block * s, o // 4),
                jnp.int8 if qflags[2] else out_dtype,
            )
        )
        out_specs.append(
            pl.BlockSpec((1, r_block * s, o // 4),
                         lambda n_, i: (n_, i, 0),
                         memory_space=pltpu.VMEM)
        )
    kernel = functools.partial(
        _conv2x2_padflat_kernel, r_block, s, relu, out_dtype, *qflags,
        head is not None, head_only, pool,
    )
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=_interp(interpret),
    )(*parts, x, x)
    return res if len(res) > 1 else res[0]


# ------------------------------------------------------------- dual conv
def _conv2x2_dual_padflat_kernel(
    r_block, s, w_in, relu, out_dtype, co, slot_phase, n_a, quant,
    in_int8, out_int8, *refs
):
    if quant:  # stacked-K weights [w00; w10; w01; w11], one per side
        ws_a, ws_b, bias = refs[0], refs[1], refs[2]
        k = 3
    else:
        wa = refs[0:4]
        wb = refs[4:8]
        bias = refs[8]
        k = 9
    sc_a = sc_b = ai_a = ai_b = out_inv = None
    if quant:
        a_inline, b_inline = in_int8
        sc_a = refs[k]; sc_b = refs[k + 1]; k += 2
        if a_inline:
            ai_a = refs[k]; k += 1
        if b_inline:
            ai_b = refs[k]; k += 1
        if out_int8:
            out_inv = refs[k]; k += 1
    rows_a = refs[k : k + n_a]
    xb_main_ref, xb_next_ref = refs[k + n_a], refs[k + n_a + 1]
    out = refs[k + n_a + 2]
    xs = refs[k + n_a + 3]  # A-side scratch [(R+1)·S, C]
    pref = _INT8_PREF if quant else jnp.float32
    c_lane = xb_main_ref.shape[-1]

    # ---- A side (skip, cropped): fill the aligned scratch -----------
    for j in range(r_block + 1):
        if slot_phase is None:
            v = rows_a[j][0, co : co + w_in, :]
            xs[j * s : j * s + w_in, :] = _quant_rows(v, ai_a)
        else:
            # odd-offset center-crop = slot-phase shift: output slot
            # (d, e) reads input slot ((oh+d)%2, (ow+e)%2) at packed
            # offset ((oh+d)//2, (ow+e)//2) — see conv.py
            oh, ow = slot_phase
            cg = c_lane // 4
            for s_out in range(4):
                d, e = s_out // 2, s_out % 2
                src = 2 * ((oh + d) % 2) + ((ow + e) % 2)
                ro_d = (oh + d) // 2 - oh // 2
                cof = (ow + e) // 2
                grp = rows_a[j + ro_d][0, cof : cof + w_in,
                                      src * cg : (src + 1) * cg]
                xs[j * s : j * s + w_in,
                   s_out * cg : (s_out + 1) * cg] = _quant_rows(grp, ai_a)
    xa = xs[:]
    if quant:
        # stacked row taps: K=2C dots on [xa, row-rolled xa] (the roll
        # is the int8 bitcast roll; the column shift a product roll)
        ca = xa.shape[-1]
        za4 = jnp.concatenate([xa, _rolldn8(xa, s)], axis=1)
        qk = jnp.dot(za4, ws_a[0 : 2 * ca],
                     preferred_element_type=jnp.int32)
        qs = jnp.dot(za4, ws_a[2 * ca : 4 * ca],
                     preferred_element_type=jnp.int32)
        acc_a = (qk + _rolldn(qs, 1))[0 : r_block * s]
    else:
        pa00 = jnp.dot(xa, wa[0][:], preferred_element_type=pref)
        pa01 = jnp.dot(xa, wa[1][:], preferred_element_type=pref)
        pa10 = jnp.dot(xa, wa[2][:], preferred_element_type=pref)
        pa11 = jnp.dot(xa, wa[3][:], preferred_element_type=pref)
        acc_a = (pa00 + _rolldn(pa01, 1) + _rolldn(pa10, s)
                 + _rolldn(pa11, s + 1))[0 : r_block * s]

    # ---- B side (up): direct flat block ------------------------------
    xb_main = _quant_rows(xb_main_ref[0], ai_b)
    xb_next = _quant_rows(xb_next_ref[0], ai_b)
    if quant:
        acc_b, last_b = _acc_taps_stacked8(
            xb_main, xb_next, ws_b, s, r_block
        )
    else:
        acc_b, last_b = _acc_taps(
            xb_main, xb_next, wb[0][:], wb[1][:], wb[2][:], wb[3][:], s,
            r_block, pref,
        )

    if quant:
        def mix(a, bv):
            return (a.astype(jnp.float32) * sc_a[:]
                    + bv.astype(jnp.float32) * sc_b[:])
    else:
        def mix(a, bv):
            return a + bv

    y_main = _epilogue(
        mix(acc_a[: (r_block - 1) * s], acc_b[: (r_block - 1) * s]),
        bias, relu, out_dtype, None, out_inv,
    )
    y_last = _epilogue(
        mix(acc_a[(r_block - 1) * s :], last_b), bias, relu, out_dtype,
        None, out_inv,
    )
    _split_store(out, r_block, s, y_main, y_last)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w_real", "s", "s_a", "hp_a", "relu", "r_block",
                     "a_offset", "a_slot_phase", "interpret"),
)
def conv2x2_dual_padflat(xa, xb, wa, wb, b, *, h: int, w_real: int,
                         s: int, s_a: int, hp_a: int,
                         relu: bool = True,
                         r_block: Optional[int] = None,
                         a_offset=(0, 0), a_slot_phase=None,
                         quant=None, interpret: bool = False):
    """conv2x2(crop(xa), wa) + conv2x2(xb, wb) + b — the concat-free
    decoder conv on padded-flat tensors. xb [N, HP·S, C] sets the output
    geometry (real h × w_real); xa [N, HPA·S_A, C] is the (larger) skip,
    read through the center-crop offsets ``a_offset=(row, col)`` or the
    odd-offset ``a_slot_phase`` — the crop rides the A-side scratch fill
    (the B side needs no scratch at all)."""
    if a_slot_phase is not None:
        ro, co = a_slot_phase[0] // 2, None
        extra_row = 1
    else:
        ro, co = a_offset
        extra_row = 0
    n, hps, c = xb.shape
    assert xa.shape[0] == n and xa.shape[2] == c, (xa.shape, xb.shape)
    o = wa.shape[-1]
    assert c % 128 == 0 and o % 128 == 0, (c, o)
    hp = hps // s
    h_out, w_out = h - 1, w_real - 1
    if r_block is None:
        r_block = _auto_r(h_out)
    ob = 1 if (quant is not None and quant.get("out_scale") is not None
               ) else (2 if (quant is not None or xb.dtype == jnp.int8)
                       else xb.dtype.itemsize)
    cdt_b = 1 if quant is not None else xb.dtype.itemsize
    r_block = _fit_r(
        max(1, min(r_block, h_out)), s,
        io_bytes=c * xb.dtype.itemsize + o * ob,
        acc_bytes=4 * o,
        # A-side row blocks (double-buffered) + the A scratch
        aux_bytes=2 * s_a * c * xa.dtype.itemsize + s * c * cdt_b,
        # the dual's observed scoped usage runs ~1.4x this byte model
        # (23.28M measured vs ~16.5M modeled at bf16/r=32) — budget
        # down so the clamp fires before the compiler's 16M wall
        budget=11 << 20,
    )
    nb = pl.cdiv(h_out, r_block)
    grid = (n, nb)
    if quant is None:
        wta, wtb = wa.astype(xb.dtype), wb.astype(xb.dtype)
        qflags = (False, False, False)
        cdt, out_dtype = xb.dtype, xb.dtype
        extra_parts, extra_specs = [], []
    else:
        wta, wtb = wa, wb
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
        stack = lambda wt: jnp.concatenate(
            [wt[0, 0], wt[1, 0], wt[0, 1], wt[1, 1]], axis=0
        )
        parts = [stack(wta), stack(wtb), b.astype(jnp.float32)]
    else:
        parts = [wta[0, 0], wta[0, 1], wta[1, 0], wta[1, 1],
                 wtb[0, 0], wtb[0, 1], wtb[1, 0], wtb[1, 1],
                 b.astype(jnp.float32)]
    in_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * len(parts)
                + extra_specs)
    parts = parts + extra_parts

    def mk_a(u):
        return pl.BlockSpec(
            (1, s_a, c),
            lambda n_, i, u=u: (
                n_, jnp.minimum(i * r_block + u + ro, hp_a - 1), 0
            ),
            memory_space=pltpu.VMEM,
        )

    n_a = r_block + 1 + extra_row
    in_specs += [mk_a(u) for u in range(n_a)]
    in_specs += [
        pl.BlockSpec((1, r_block * s, c), lambda n_, i: (n_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, s, c),
            lambda n_, i: (n_, jnp.minimum(i * r_block + r_block, hp - 1),
                           0),
            memory_space=pltpu.VMEM,
        ),
    ]
    kernel = functools.partial(
        _conv2x2_dual_padflat_kernel, r_block, s, w_real, relu, out_dtype,
        co, a_slot_phase, n_a, *qflags,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, nb * r_block * s, o),
                                       out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r_block * s, o),
                               lambda n_, i: (n_, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(((r_block + 1) * s, c), cdt)],
        interpret=_interp(interpret),
    )(*parts, *([xa] * n_a), xb, xb)


# --------------------------------------------------------- strided conv
def _conv4x4s2_padflat_kernel(r_block, s2, relu, out_dtype, quant,
                              in_int8, out_int8, *refs):
    wk, ws, bias = refs[0], refs[1], refs[2]
    k = 3
    chan_scale = act_inv = out_inv = None
    if quant:
        chan_scale = refs[k]; k += 1
        if not in_int8:
            act_inv = refs[k]; k += 1
        if out_int8:
            out_inv = refs[k]; k += 1
    main_ref = refs[k]
    extra0, extra1 = refs[k + 1], refs[k + 2]
    out = refs[k + 3]
    x4 = refs[k + 4]  # [R·S2, 8C]
    c2 = main_ref.shape[-1]
    pref = _INT8_PREF if quant else jnp.float32
    main = _quant_rows(main_ref[0], act_inv)
    ex0 = _quant_rows(extra0[0], act_inv)
    ex1 = _quant_rows(extra1[0], act_inv)
    for r in range(r_block):
        for u in range(4):
            ri = 2 * r + u
            if ri < 2 * r_block:
                v = main[ri * s2 : (ri + 1) * s2, :]
            elif ri == 2 * r_block:
                v = ex0
            else:
                v = ex1
            x4[r * s2 : (r + 1) * s2, u * c2 : (u + 1) * c2] = v
    keep = jnp.dot(x4[:], wk[:], preferred_element_type=pref)
    shift = jnp.dot(x4[:], ws[:], preferred_element_type=pref)
    acc = keep + _rolldn(shift, 1)
    out[0] = _epilogue(acc, bias, relu, out_dtype, chan_scale, out_inv)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w2_real", "s2", "relu", "r_block", "interpret"),
)
def conv4x4s2_padflat(x, w4, b, *, h: int, w2_real: int, s2: int,
                      relu: bool = True, r_block: int = 8,
                      quant=None, interpret: bool = False):
    """4×4 stride-2 VALID conv, padded-flat PAIRED input
    [N, HP·S2, 2C] (pair j = true columns 2j, 2j+1) → padded-flat packed
    output [N, (nb·R)·S2, O4] (real (h-2)//2 × (w-2)//2 where
    w = 2·w2_real). The K-stacked scratch fill remains (row taps at
    stride 2 cannot ride a product roll) but reads from the in-VMEM
    block, and the epilogue is one aligned store."""
    n, hps2, c2 = x.shape
    hp = hps2 // s2
    o4 = w4.shape[-1]
    c = c2 // 2
    assert (2 * c) % 64 == 0 and o4 % 128 == 0, (c, o4)
    h_out = (h - 2) // 2
    w_out = w2_real - 1
    del w_out
    ob = 1 if (quant is not None and quant.get("out_scale") is not None
               ) else (2 if (quant is not None or x.dtype == jnp.int8)
                       else x.dtype.itemsize)
    cdt_b = 1 if quant is not None else x.dtype.itemsize
    r_block = _fit_r(
        max(1, min(r_block, h_out)), s2,
        io_bytes=2 * c2 * x.dtype.itemsize + o4 * ob,
        acc_bytes=4 * o4,
        aux_bytes=s2 * 8 * c * cdt_b,
    )
    nb = pl.cdiv(h_out, r_block)
    grid = (n, nb)
    wt = w4 if w4.dtype == jnp.int8 else w4.astype(x.dtype)
    wk = jnp.concatenate(
        [jnp.concatenate([wt[u, 0], wt[u, 1]], axis=0) for u in range(4)],
        axis=0,
    )
    ws = jnp.concatenate(
        [jnp.concatenate([wt[u, 2], wt[u, 3]], axis=0) for u in range(4)],
        axis=0,
    )
    parts = [wk, ws, b.astype(jnp.float32)]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
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
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if not in_int8:
            arr, spec = _smem_scalar(1.0 / quant["act_scale"])
            parts.append(arr); in_specs.append(spec)
        if out_int8:
            arr, spec = _smem_scalar(1.0 / quant["out_scale"])
            parts.append(arr); in_specs.append(spec)
    in_specs += [
        pl.BlockSpec((1, 2 * r_block * s2, c2),
                     lambda n_, i: (n_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, s2, c2),
            lambda n_, i: (
                n_, jnp.minimum(2 * i * r_block + 2 * r_block, hp - 1), 0
            ),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, s2, c2),
            lambda n_, i: (
                n_,
                jnp.minimum(2 * i * r_block + 2 * r_block + 1, hp - 1), 0,
            ),
            memory_space=pltpu.VMEM,
        ),
    ]
    kernel = functools.partial(
        _conv4x4s2_padflat_kernel, r_block, s2, relu, out_dtype, *qflags
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, nb * r_block * s2, o4),
                                       out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r_block * s2, o4),
                               lambda n_, i: (n_, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((r_block * s2, 8 * c), cdt)],
        interpret=_interp(interpret),
    )(*parts, x, x, x)


# -------------------------------------------------------- rowwise matmul
def _matmul_rows_padflat_kernel(relu, out_dtype, quant, in_int8,
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
    x_ref, out = refs[k], refs[k + 1]
    pref = _INT8_PREF if quant else jnp.float32
    xv = _quant_rows(x_ref[0], act_inv)
    acc = jnp.dot(xv, wm[:], preferred_element_type=pref)
    out[0] = _epilogue(acc, bias, relu, out_dtype, chan_scale, out_inv)


@functools.partial(
    jax.jit, static_argnames=("relu", "r_block", "interpret")
)
def matmul_rows_padflat(x, wm, b, *, relu: bool = True,
                        r_block: int = 16,
                        quant=None, interpret: bool = False):
    """Per-pixel channel matmul on a padded-flat tensor (the 2×2/2
    transposed conv with unpacked input) — zero scratch, zero per-row
    work; junk rows/cols map to junk rows/cols."""
    n, hps, c = x.shape
    k = wm.shape[-1]
    assert c % 128 == 0 and k % 128 == 0, (c, k)
    del r_block
    blk = min(2048, (hps + 7) // 8 * 8)
    grid = (n, pl.cdiv(hps, blk))
    wmt = wm if wm.dtype == jnp.int8 else wm.astype(x.dtype)
    parts = [wmt, b.astype(jnp.float32)]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    if quant is None:
        qflags = (False, False, False)
        out_dtype = x.dtype
    else:
        in_int8 = quant.get("act_scale") is None
        out_int8 = quant.get("out_scale") is not None
        qflags = (True, in_int8, out_int8)
        out_dtype = jnp.int8 if out_int8 else (
            jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype
        )
        parts.append(jnp.asarray(quant["chan_scale"], jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if not in_int8:
            arr, spec = _smem_scalar(1.0 / quant["act_scale"])
            parts.append(arr); in_specs.append(spec)
        if out_int8:
            arr, spec = _smem_scalar(1.0 / quant["out_scale"])
            parts.append(arr); in_specs.append(spec)
    in_specs.append(
        pl.BlockSpec((1, blk, c), lambda n_, i: (n_, i, 0),
                     memory_space=pltpu.VMEM)
    )
    kernel = functools.partial(
        _matmul_rows_padflat_kernel, relu, out_dtype, *qflags
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hps, k), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk, k), lambda n_, i: (n_, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interp(interpret),
    )(*parts, x)


# ---------------------------------------------------- deconv (packed in)
def _deconv_packed_padflat_kernel(r_half, s_i, s_o, j_in, relu, out_dtype,
                                  pf2_out, quant, in_int8, out_int8,
                                  *refs):
    k = 0
    if not pf2_out:
        il_e, il_o = refs[:2]    # [S_o, S_i] interleave selectors
        k = 2
    wsel = refs[k : k + 4]
    bias = refs[k + 4]
    k += 5
    chan_scale = act_inv = out_inv = None
    if quant:
        chan_scale = refs[k]; k += 1
        if not in_int8:
            act_inv = refs[k]; k += 1
        if out_int8:
            out_inv = refs[k]; k += 1
    x_ref, out = refs[k], refs[k + 1]
    pref = _INT8_PREF if quant else jnp.float32
    il_dt = jnp.bfloat16 if quant else out_dtype
    o4 = wsel[0].shape[-1]
    xv = _quant_rows(x_ref[0], act_inv)
    prods = [
        jnp.dot(xv, wsel[si][:], preferred_element_type=pref)
        for si in range(4)
    ]
    for r in range(2 * r_half):
        a, il = r % 2, r // 2
        # full s_i rows: the selector's zero columns beyond j_in kill the
        # junk rows, so the interleave also scrubs column garbage
        p0 = prods[2 * a][il * s_i : (il + 1) * s_i]
        p1 = prods[2 * a + 1][il * s_i : (il + 1) * s_i]
        if quant:
            p0 = p0.astype(jnp.float32) * chan_scale[:]
            p1 = p1.astype(jnp.float32) * chan_scale[:]
        if pf2_out:
            # pf2 output: out col pair j <- input col j, even/odd in
            # lane halves — the stride-2 scatter vanishes entirely
            out[0, r * s_o : (r + 1) * s_o, 0:o4] = _epilogue(
                p0, bias, relu, out_dtype, None, out_inv
            )
            out[0, r * s_o : (r + 1) * s_o, o4 : 2 * o4] = _epilogue(
                p1, bias, relu, out_dtype, None, out_inv
            )
            continue
        y = jnp.dot(il_e[:], p0.astype(il_dt),
                    preferred_element_type=jnp.float32)
        y += jnp.dot(il_o[:], p1.astype(il_dt),
                     preferred_element_type=jnp.float32)
        out[0, r * s_o : (r + 1) * s_o] = _epilogue(
            y, bias, relu, out_dtype, None, out_inv
        )


@functools.partial(
    jax.jit,
    static_argnames=("i_in", "j_in", "s_i", "s_out", "relu", "r_block",
                     "pf2_out", "interpret"),
)
def deconv_packed_padflat(x4, wm, b, *, i_in: int, j_in: int, s_i: int,
                          s_out: Optional[int] = None,
                          relu: bool = True,
                          r_block: Optional[int] = None,
                          pf2_out: bool = False,
                          quant=None, interpret: bool = False):
    """2×2/2 transposed conv, padded-flat packed input → padded-flat
    packed output: [N, HP·S_i, 4C] @ wm [C, 4O] → [N, (nb·R)·S_o, 4O]
    (real 2·i_in × 2·j_in, S_o = stride of 2·j_in). The slot scatter is
    4 masked-weight dots of the whole input block (no scratch); the
    column interleave stays per-row selection matmuls (stride-2 scatter
    has no vector form), rows interleave for free via aligned stores.

    ``pf2_out=True`` emits the pf2 layout instead — [N, (nb·R)·S_i, 2·4O]
    with out column pair j in lane halves — which needs NO interleave at
    all (out pair j is exactly input col j's even/odd products)."""
    n, hps, c4 = x4.shape
    hp = hps // s_i
    c = c4 // 4
    o4 = wm.shape[-1]
    assert c4 % 128 == 0 and o4 % 128 == 0, (c4, o4)
    if r_block is None:
        r_block = _auto_r(2 * i_in)
    out_int8 = quant is not None and quant.get("out_scale") is not None
    ob = 1 if out_int8 else (
        2 if (quant is not None or x4.dtype == jnp.int8)
        else x4.dtype.itemsize
    )
    s_o_est = s_i if pf2_out else (s_out or stride_for(2 * j_in,
                                   jnp.int8 if out_int8 else x4.dtype))
    o_lanes_est = 2 * o4 if pf2_out else o4
    # in block is r_half rows: halve its per-r contribution
    r_block = _fit_r(
        max(2, min(r_block + r_block % 2, 2 * i_in)), s_o_est,
        io_bytes=o_lanes_est * ob,
        acc_bytes=4 * o_lanes_est,
        aux_bytes=s_i * c4 * x4.dtype.itemsize,  # r_half in rows, 2x-buf
    )
    r_block = max(2, r_block + r_block % 2)  # even
    r_half = r_block // 2
    nb = pl.cdiv(2 * i_in, r_block)
    grid = (n, nb)
    if quant is None:
        qflags = (False, False, False)
        out_dtype, il_dt = x4.dtype, x4.dtype
        extra_parts, extra_specs = [], []
    else:
        in_int8 = quant.get("act_scale") is None
        out_int8 = quant.get("out_scale") is not None
        qflags = (True, in_int8, out_int8)
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
    if pf2_out:
        s_o = s_i  # one flat row per output PAIR = per input column
        assert s_out is None or s_out == s_i
    else:
        s_o = s_out or stride_for(2 * j_in, out_dtype)
        assert s_o >= 2 * j_in, (s_o, j_in)
    wmt = wm if wm.dtype == jnp.int8 else wm.astype(x4.dtype)
    zeros = jnp.zeros((c4, o4), wmt.dtype)
    wsel = [zeros.at[s * c : (s + 1) * c].set(wmt) for s in range(4)]
    parts = []
    if not pf2_out:
        il_e = np.zeros((s_o, s_i), np.float32)
        il_e[2 * np.arange(j_in), np.arange(j_in)] = 1.0
        il_o = np.zeros((s_o, s_i), np.float32)
        il_o[2 * np.arange(j_in) + 1, np.arange(j_in)] = 1.0
        parts = [jnp.asarray(il_e, il_dt), jnp.asarray(il_o, il_dt)]
    parts += wsel + [b.astype(jnp.float32)] + extra_parts
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * (5 + 2 * (not pf2_out))
        + extra_specs
    )
    in_specs.append(
        pl.BlockSpec((1, r_half * s_i, c4), lambda n_, i: (n_, i, 0),
                     memory_space=pltpu.VMEM)
    )
    o_lanes = 2 * o4 if pf2_out else o4
    kernel = functools.partial(
        _deconv_packed_padflat_kernel, r_half, s_i, s_o, j_in, relu,
        out_dtype, pf2_out, *qflags,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, nb * r_block * s_o, o_lanes),
                                       out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r_block * s_o, o_lanes),
                               lambda n_, i: (n_, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interp(interpret),
    )(*parts, x4)


# ------------------------------------------------------------ pf2 layout
# Paired-column padded-flat ("pf2"): level-1 tensors store column pair
# (2j, 2j+1) as one flat row of 2C lanes (lanes [0:C] = even column,
# [C:2C] = odd column), at pair stride S2. Rationale: the pool->pair
# handoff and the deconv's stride-2 column scatter are unvectorizable in
# plain padflat (Mosaic has no stride-2 sublane ops; the XLA-side pair
# reshape of the narrow 32-lane pooled tensor measured 6.6 ms at
# 512$^2$/B=128). In pf2, even/odd outputs are SEPARATE lane halves: the
# conv is 8 aligned K=C dots (identical FLOPs to the plain layout), the
# pool emits the paired handoff for free, and the deconv drops its
# interleave selector matmuls entirely.


def _taps_pf2(xm, xn, w00, w01, w10, w11, s2, r_block, pref, c):
    """Even/odd-column four-tap accumulators on a pf2 block.

    Returns (acc_e, acc_o) valid for output rows 0..R-2 and the patched
    last-row values (last_e, last_o). Odd column j reads pair j lane-H
    and pair j+1 lane-L (a roll by one flat row)."""
    xmL, xmH = xm[:, :c], xm[:, c:]
    xnL, xnH = xn[:, :c], xn[:, c:]

    def d(a, w):
        return jnp.dot(a, w, preferred_element_type=pref)

    pe0 = d(xmL, w00) + d(xmH, w01)
    pe1 = d(xmL, w10) + d(xmH, w11)
    po0 = d(xmH, w00) + _rolldn(d(xmL, w01), 1)
    po1 = d(xmH, w10) + _rolldn(d(xmL, w11), 1)
    acc_e = pe0 + _rolldn(pe1, s2)
    acc_o = po0 + _rolldn(po1, s2)
    cut = (r_block - 1) * s2
    last_e = pe0[cut:] + d(xnL, w10) + d(xnH, w11)
    last_o = po0[cut:] + d(xnH, w10) + _rolldn(d(xnL, w11), 1)
    return acc_e, acc_o, last_e, last_o


def _taps_pf2_stacked(xm, xn, ws, s2, r_block, c):
    """int8 variant of _taps_pf2 with the EVEN parity's lane taps
    stacked into the contraction: ws = [w00; w01; w10; w11] [4C, O];
    the even columns read whole pairs, so pe = dot(xm, ws[:2C]) is one
    K=2C dot — at C=128 that is K=256, the threshold where the MXU runs
    int8 at 2× the bf16 rate (K=128 dots only get the bf16 rate). The
    row tap stays a roll of the int32 PRODUCT (Mosaic cannot rotate
    int8 vectors, so operand rolls — which full 4-tap stacking would
    need, and which the ODD parity's pair-shift needs — are off the
    table; the odd parity keeps the four K=C product-roll dots)."""
    def d(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.int32)

    w_lo, w_hi = ws[0 : 2 * c], ws[2 * c : 4 * c]
    w01, w11 = ws[c : 2 * c], ws[3 * c : 4 * c]
    w00, w10 = ws[0:c], ws[2 * c : 3 * c]
    xmL, xmH = xm[:, :c], xm[:, c:]
    # even: both rows' whole pairs stacked into ONE K=4C dot (the
    # operand row shift is an int8 bitcast roll) — K=512 at C=128,
    # where the int8 MXU rate doubles (K=256 measured no better than
    # the bf16 rate; the K=512 strided conv sits at the 2× roofline)
    z4 = jnp.concatenate([xm, _rolldn8(xm, s2)], axis=1)
    acc_e = d(z4, ws[:])
    # odd: the pair shift is a +1 row offset (not 4-aligned, so no
    # operand roll) → K=C dots with int32 product rolls
    po0 = d(xmH, w00) + _rolldn(d(xmL, w01), 1)
    po1 = d(xmH, w10) + _rolldn(d(xmL, w11), 1)
    acc_o = po0 + _rolldn(po1, s2)
    cut = (r_block - 1) * s2
    xnL, xnH = xn[:, :c], xn[:, c:]
    last_e = d(xm[cut:], w_lo) + d(xn, w_hi)
    last_o = po0[cut:] + d(xnH, w10) + _rolldn(d(xnL, w11), 1)
    return acc_e, acc_o, last_e, last_o


def _store_pf2(out_ref, r_block, s2, o, em, om, el, ol):
    cut = (r_block - 1) * s2
    if r_block > 1:
        out_ref[0, 0:cut, 0:o] = em
        out_ref[0, 0:cut, o : 2 * o] = om
    out_ref[0, cut : r_block * s2, 0:o] = el
    out_ref[0, cut : r_block * s2, o : 2 * o] = ol


def _conv2x2_pf2_kernel(r_block, s2, relu, out_dtype, quant, in_int8,
                        out_int8, has_head, head_only, pool, *refs):
    if quant:  # stacked-K weights: one [4C, O] operand
        ws, bias = refs[0], refs[1]
        k = 2
        o = ws.shape[-1]
    else:
        w00, w01, w10, w11 = refs[0:4]
        bias = refs[4]
        k = 5
        o = w00.shape[-1]
    chan_scale = act_inv = out_inv = None
    if quant:
        chan_scale = refs[k]; k += 1
        if not in_int8:
            act_inv = refs[k]; k += 1
        if out_int8:
            out_inv = refs[k]; k += 1
    wd = bd = None
    if has_head:
        wd = refs[k]; bd = refs[k + 1]; k += 2
    x_main_ref, x_next_ref = refs[k], refs[k + 1]
    outs = refs[k + 2 :]
    c = x_main_ref.shape[-1] // 2

    xm = _quant_rows(x_main_ref[0], act_inv)
    xn = _quant_rows(x_next_ref[0], act_inv)
    if quant:
        acc_e, acc_o, last_e, last_o = _taps_pf2_stacked(
            xm, xn, ws, s2, r_block, c
        )
    else:
        acc_e, acc_o, last_e, last_o = _taps_pf2(
            xm, xn, w00[:], w01[:], w10[:], w11[:], s2, r_block,
            jnp.float32, c,
        )

    # pre-cast epilogue: store the finished value, pool on the f32
    # value with the monotone finish applied after (skips the pool's
    # s8→s32 unpack/repack — see _epilogue_parts)
    def epi(a):
        return _epilogue_parts(a, bias, relu, out_dtype, chan_scale,
                               out_inv)

    cut = (r_block - 1) * s2
    yp_em, finish = epi(acc_e[:cut])
    yp_om, _ = epi(acc_o[:cut])
    yp_el, _ = epi(last_e)
    yp_ol, _ = epi(last_o)
    ye_m, yo_m = finish(yp_em), finish(yp_om)
    ye_l, yo_l = finish(yp_el), finish(yp_ol)
    oi = 0
    if not head_only:
        _store_pf2(outs[oi], r_block, s2, o, ye_m, yo_m, ye_l, yo_l)
        oi += 1
    if has_head:
        def mk_mask(yv):
            hd = jnp.dot(yv.astype(jnp.bfloat16), wd[:],
                         preferred_element_type=jnp.float32)
            return (hd + bd[:] > 0).astype(jnp.uint8)

        _store_pf2(outs[oi], r_block, s2, wd.shape[-1],
                   mk_mask(ye_m), mk_mask(yo_m),
                   mk_mask(ye_l), mk_mask(yo_l))
        oi += 1
    if pool:
        _store_pf2(
            outs[oi], r_block, s2, o // 4,
            finish(_pool_slots(yp_em, None)),
            finish(_pool_slots(yp_om, None)),
            finish(_pool_slots(yp_el, None)),
            finish(_pool_slots(yp_ol, None)),
        )


@functools.partial(
    jax.jit,
    static_argnames=("h", "w_real", "s2", "relu", "r_block", "pool",
                     "head_only", "interpret"),
)
def conv2x2_pf2(x, w, b, *, h: int, w_real: int, s2: int,
                relu: bool = True, r_block: Optional[int] = None,
                quant=None, head=None, head_only: bool = False,
                pool: bool = False, interpret: bool = False):
    """2×2 VALID conv on a pf2 tensor.

    x: [N, HP·S2, 2C] pf2 (real h rows × w_real packed cols); w:
    [2, 2, C, O]; b: [O] tiled flat bias. Returns pf2
    [N, (nb·R)·S2, 2O] (real h-1 × w_real-1), plus optionally the fused
    uint8 pf2 head mask and/or the fused slot-max pooled tensor — the
    pool output [N, (nb·R)·S2, O/2] IS the column-paired handoff the
    next strided entry conv consumes (the whole point of pf2)."""
    n, hps2, c2 = x.shape
    hp = hps2 // s2
    c = c2 // 2
    o = w.shape[-1]
    assert c % 128 == 0 and o % 128 == 0, (c, o)
    assert head is not None or not head_only
    h_out = h - 1
    qparts, qspecs, qflags, cdt, out_dtype = _quant_parts(
        w, b, quant, x.dtype
    )
    ob = jnp.dtype(out_dtype).itemsize
    io_bytes = (x.dtype.itemsize * c2
                + (0 if head_only else 2 * o * ob)
                + (2 * head[0].shape[-1] if head is not None else 0)
                + (o // 2) * (1 if qflags[2] else ob) * pool)
    if r_block is None:
        r_block = _auto_r(h_out)
    # f32 pre-cast pool-epilogue intermediates on the float path (two
    # f32 copies of the 2·o pair outputs + f32 pooled lanes) — same
    # measured under-pricing as conv2x2_padflat's; the int8 requant
    # epilogue fuses and keeps the old model (its r=32 c2_2 pin is the
    # tuned, compile-verified win — unet_int8.py).
    epi_bytes = (8 * 2 * o + 2 * o) if (pool and not qflags[2]) else 0
    r_block = _fit_r(max(1, min(r_block, h_out)), s2, io_bytes,
                     acc_bytes=4 * 2 * o + epi_bytes)
    nb = pl.cdiv(h_out, r_block)
    grid = (n, nb)
    assert head is None or not qflags[2], "head needs a float epilogue"
    wt = qparts[0]
    if qflags[0]:
        # stacked-K int8 weights: [w00; w01; w10; w11] as one [4C, O]
        # operand (see _taps_pf2_stacked)
        parts = [
            jnp.concatenate([wt[0, 0], wt[0, 1], wt[1, 0], wt[1, 1]],
                            axis=0),
            qparts[1],
        ]
    else:
        parts = [wt[0, 0], wt[0, 1], wt[1, 0], wt[1, 1], qparts[1]]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(parts)
    eparts, especs = _q_extras(qparts[1:], qspecs[1:])
    parts += eparts
    in_specs += especs
    if head is not None:
        wd, bd = head
        parts += [wd.astype(jnp.bfloat16), bd.astype(jnp.float32)]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    in_specs += [
        pl.BlockSpec((1, r_block * s2, c2), lambda n_, i: (n_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, s2, c2),
            lambda n_, i: (n_, jnp.minimum(i * r_block + r_block, hp - 1),
                           0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shapes, out_specs = [], []

    def add_out(lanes, dtype):
        out_shapes.append(
            jax.ShapeDtypeStruct((n, nb * r_block * s2, lanes), dtype)
        )
        out_specs.append(
            pl.BlockSpec((1, r_block * s2, lanes),
                         lambda n_, i: (n_, i, 0),
                         memory_space=pltpu.VMEM)
        )

    if not head_only:
        add_out(2 * o, out_dtype)
    if head is not None:
        add_out(2 * head[0].shape[-1], jnp.uint8)
    if pool:
        add_out(o // 2, jnp.int8 if qflags[2] else out_dtype)
    kernel = functools.partial(
        _conv2x2_pf2_kernel, r_block, s2, relu, out_dtype, *qflags,
        head is not None, head_only, pool,
    )
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=_interp(interpret),
    )(*parts, x, x)
    return res if len(res) > 1 else res[0]


# -------------------------------------------------------------- pf2 dual
def _conv2x2_dual_pf2_kernel(
    r_block, s2, w2_in, relu, out_dtype, co2, phase, n_a, quant,
    in_int8, out_int8, *refs
):
    if quant:  # stacked-K weights, one [4C, O] operand per side
        ws_a, ws_b, bias = refs[0], refs[1], refs[2]
        k = 3
    else:
        wa = refs[0:4]
        wb = refs[4:8]
        bias = refs[8]
        k = 9
    sc_a = sc_b = ai_a = ai_b = out_inv = None
    if quant:
        a_inline, b_inline = in_int8
        sc_a = refs[k]; sc_b = refs[k + 1]; k += 2
        if a_inline:
            ai_a = refs[k]; k += 1
        if b_inline:
            ai_b = refs[k]; k += 1
        if out_int8:
            out_inv = refs[k]; k += 1
    rows_a = refs[k : k + n_a]
    xb_main_ref, xb_next_ref = refs[k + n_a], refs[k + n_a + 1]
    out = refs[k + n_a + 2]
    xs = refs[k + n_a + 3]  # A-side pf2 scratch [(R+1)·S2, 2C]
    pref = _INT8_PREF if quant else jnp.float32
    c = xb_main_ref.shape[-1] // 2
    o = ws_a.shape[-1] if quant else wa[0].shape[-1]

    # ---- A side (skip, cropped in pair space) ------------------------
    for j in range(r_block + 1):
        row = rows_a[j][0]
        if phase == 0:
            xs[j * s2 : j * s2 + w2_in, :] = _quant_rows(
                row[co2 : co2 + w2_in, :], ai_a
            )
        else:
            # odd column offset: even output cols read pair lane-H at
            # co2, odd cols read pair lane-L at co2+1
            xs[j * s2 : j * s2 + w2_in, 0:c] = _quant_rows(
                row[co2 : co2 + w2_in, c : 2 * c], ai_a
            )
            xs[j * s2 : j * s2 + w2_in, c : 2 * c] = _quant_rows(
                row[co2 + 1 : co2 + 1 + w2_in, 0:c], ai_a
            )
    xa = xs[:]
    cut = r_block * s2
    if quant:
        # stacked taps (see _taps_pf2_stacked): even parity one K=4C
        # dot via the int8 bitcast roll, odd parity K=C product rolls
        def di(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.int32)

        xaL, xaH = xa[:, :c], xa[:, c:]
        za4 = jnp.concatenate([xa, _rolldn8(xa, s2)], axis=1)
        acc_ae = di(za4, ws_a[:])[:cut]
        po0 = di(xaH, ws_a[0:c]) + _rolldn(di(xaL, ws_a[c : 2 * c]), 1)
        po1 = di(xaH, ws_a[2 * c : 3 * c]) + _rolldn(
            di(xaL, ws_a[3 * c : 4 * c]), 1
        )
        acc_ao = (po0 + _rolldn(po1, s2))[:cut]
    else:
        xaL, xaH = xa[:, :c], xa[:, c:]

        def d(a, w):
            return jnp.dot(a, w[:], preferred_element_type=pref)

        pe0 = d(xaL, wa[0]) + d(xaH, wa[1])
        pe1 = d(xaL, wa[2]) + d(xaH, wa[3])
        po0 = d(xaH, wa[0]) + _rolldn(d(xaL, wa[1]), 1)
        po1 = d(xaH, wa[2]) + _rolldn(d(xaL, wa[3]), 1)
        acc_ae = (pe0 + _rolldn(pe1, s2))[:cut]
        acc_ao = (po0 + _rolldn(po1, s2))[:cut]

    # ---- B side (up): direct pf2 block -------------------------------
    xbm = _quant_rows(xb_main_ref[0], ai_b)
    xbn = _quant_rows(xb_next_ref[0], ai_b)
    if quant:
        acc_be, acc_bo, last_be, last_bo = _taps_pf2_stacked(
            xbm, xbn, ws_b, s2, r_block, c
        )
    else:
        acc_be, acc_bo, last_be, last_bo = _taps_pf2(
            xbm, xbn, wb[0][:], wb[1][:], wb[2][:], wb[3][:], s2,
            r_block, pref, c,
        )

    if quant:
        def mix(a, bv):
            return (a.astype(jnp.float32) * sc_a[:]
                    + bv.astype(jnp.float32) * sc_b[:])
    else:
        def mix(a, bv):
            return a + bv

    def epi(a):
        return _epilogue(a, bias, relu, out_dtype, None, out_inv)

    m = (r_block - 1) * s2
    _store_pf2(
        out, r_block, s2, o,
        epi(mix(acc_ae[:m], acc_be[:m])),
        epi(mix(acc_ao[:m], acc_bo[:m])),
        epi(mix(acc_ae[m:], last_be)),
        epi(mix(acc_ao[m:], last_bo)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("h", "w_real", "s2", "s2_a", "hp_a", "relu",
                     "r_block", "a_row_off", "a_col_off", "interpret"),
)
def conv2x2_dual_pf2(xa, xb, wa, wb, b, *, h: int, w_real: int, s2: int,
                     s2_a: int, hp_a: int, relu: bool = True,
                     r_block: Optional[int] = None,
                     a_row_off: int = 0, a_col_off: int = 0,
                     quant=None, interpret: bool = False):
    """conv2x2(crop(xa), wa) + conv2x2(xb, wb) + b on pf2 tensors.

    xb [N, HP·S2, 2C] (pf2 up side) sets the output geometry (real
    h × w_real packed cols); xa [N, HPA·S2A, 2C] is the pf2 skip, read
    through the slot-even center-crop offset (a_row_off packed rows,
    a_col_off packed cols — pair offset a_col_off//2 with lane-phase
    a_col_off%2 riding the scratch fill). Output pf2
    [N, (nb·R)·S2, 2O]."""
    n, hps2, c2 = xb.shape
    assert xa.shape[0] == n and xa.shape[2] == c2, (xa.shape, xb.shape)
    c = c2 // 2
    o = wa.shape[-1]
    assert c % 128 == 0 and o % 128 == 0, (c, o)
    hp = hps2 // s2
    h_out = h - 1
    w2_in = w_real // 2 + 1
    co2, phase = a_col_off // 2, a_col_off % 2
    assert co2 + phase + w2_in <= s2_a, (co2, w2_in, s2_a)
    if r_block is None:
        r_block = _auto_r(h_out)
    ob = 1 if (quant is not None and quant.get("out_scale") is not None
               ) else (2 if (quant is not None or xb.dtype == jnp.int8)
                       else xb.dtype.itemsize)
    cdt_b = 1 if quant is not None else xb.dtype.itemsize
    r_block = _fit_r(
        max(1, min(r_block, h_out)), s2,
        io_bytes=c2 * xb.dtype.itemsize + 2 * o * ob,
        acc_bytes=4 * 2 * o,
        aux_bytes=2 * s2_a * c2 * xa.dtype.itemsize + s2 * c2 * cdt_b,
    )
    nb = pl.cdiv(h_out, r_block)
    grid = (n, nb)
    if quant is None:
        wta, wtb = wa.astype(xb.dtype), wb.astype(xb.dtype)
        qflags = (False, False, False)
        cdt, out_dtype = xb.dtype, xb.dtype
        extra_parts, extra_specs = [], []
    else:
        wta, wtb = wa, wb
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
        stack = lambda wt: jnp.concatenate(
            [wt[0, 0], wt[0, 1], wt[1, 0], wt[1, 1]], axis=0
        )
        parts = [stack(wta), stack(wtb), b.astype(jnp.float32)]
    else:
        parts = [wta[0, 0], wta[0, 1], wta[1, 0], wta[1, 1],
                 wtb[0, 0], wtb[0, 1], wtb[1, 0], wtb[1, 1],
                 b.astype(jnp.float32)]
    in_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * len(parts)
                + extra_specs)
    parts = parts + extra_parts

    def mk_a(u):
        return pl.BlockSpec(
            (1, s2_a, c2),
            lambda n_, i, u=u: (
                n_, jnp.minimum(i * r_block + u + a_row_off, hp_a - 1), 0
            ),
            memory_space=pltpu.VMEM,
        )

    n_a = r_block + 1
    in_specs += [mk_a(u) for u in range(n_a)]
    in_specs += [
        pl.BlockSpec((1, r_block * s2, c2), lambda n_, i: (n_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, s2, c2),
            lambda n_, i: (n_, jnp.minimum(i * r_block + r_block, hp - 1),
                           0),
            memory_space=pltpu.VMEM,
        ),
    ]
    kernel = functools.partial(
        _conv2x2_dual_pf2_kernel, r_block, s2, w2_in, relu, out_dtype,
        co2, phase, n_a, *qflags,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, nb * r_block * s2, 2 * o),
                                       out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r_block * s2, 2 * o),
                               lambda n_, i: (n_, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(((r_block + 1) * s2, c2), cdt)],
        interpret=_interp(interpret),
    )(*parts, *([xa] * n_a), xb, xb)


# ------------------------------------------------------- fused pf2 entry
# The level-1 entry (3×3 conv + stride-2 s2d fold + quantize) as ONE
# Pallas kernel writing the pf2 layout directly. This deletes the two
# costs of the XLA entry region: the batch-in-lanes conv's low MFU and
# the output relayout copy into padflat (~2.6 ms at 512²/B=128 — the
# conv output is the region's biggest bf16 tensor).
#
# Key observation: after the host-side pair-major transform
#   xt[n, 12·row + t, g] = x[n, row, 4g + t//3, t%3]
# an EVEN output column c = 2p reads exactly group p (real cols
# 4p..4p+3 = lane p, taps t = 3·(dx+kx)+ch ∈ 0..11 in sublanes), so the
# conv is one K=48 dot contracting SUBLANES (4 rows × 12 taps) with the
# group index riding the lanes; odd columns read taps 6..11 of group p
# plus taps 0..5 of group p+1 — a second dot plus a sublane roll of the
# int32 product. No im2col materialization anywhere (the earlier
# im2col-dot entry lost ~13 ms to XLA relayouts of the 16×-expanded
# taps; the transform here moves the raw 1-byte input once).
#
# Reference semantics: the standard 3×3 SAME-free (VALID) entry conv of
# the UNet encoder (/root/reference/models/unet.py:117-126), fused with
# this repo's s2d packing.


def entry_weights_pf2(w3: np.ndarray):
    """[3, 3, 3, O] entry conv weight → (we, wh, wl) [48, 4O] operands
    for the fused pf2 entry kernel (same dtype as w3)."""
    kh, kw, ci, o = w3.shape
    assert (kh, kw, ci) == (3, 3, 3), w3.shape
    we = np.zeros((48, 4 * o), w3.dtype)
    wh = np.zeros((48, 4 * o), w3.dtype)
    wl = np.zeros((48, 4 * o), w3.dtype)
    for dy in range(2):
        for dx in range(2):
            s = 2 * dy + dx
            for ky in range(3):
                for kx in range(3):
                    for ch in range(3):
                        row = (dy + ky) * 12
                        col = slice(s * o, (s + 1) * o)
                        v = w3[ky, kx, ch]
                        we[row + 3 * (dx + kx) + ch, col] += v
                        q = 2 + dx + kx  # odd column: real col offset
                        if q <= 3:
                            wh[row + 3 * q + ch, col] += v
                        else:
                            wl[row + 3 * (q - 4) + ch, col] += v
    return we, wh, wl


def entry_transform_pf2(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, 3] → [N, H·12, W//4] pair-major transform (the only
    XLA-side data movement the fused entry needs; quantize the input
    FIRST so the transpose moves 1-byte codes)."""
    n, h, w, c = x.shape
    assert c == 3 and w % 4 == 0, x.shape
    xt = x.reshape(n, h, w // 4, 12)
    return jnp.swapaxes(xt, 2, 3).reshape(n, h * 12, w // 4)


def _conv3entry_pf2_kernel(r_block, g, o4, relu, out_dtype, in_int8,
                           has_cs, has_oi, *refs):
    we, wh, wl, bias = refs[0:4]
    k = 4
    chan_scale = out_inv = None
    if has_cs:
        chan_scale = refs[k]; k += 1
    if has_oi:
        out_inv = refs[k]; k += 1
    xm_ref, xn_ref = refs[k], refs[k + 1]
    out = refs[k + 2]
    pref = jnp.int32 if in_int8 else jnp.float32
    dn = (((0,), (0,)), ((), ()))  # contract sublanes of both operands
    xa = jnp.concatenate([xm_ref[0], xn_ref[0]], axis=0)
    for r in range(r_block):
        blk = xa[24 * r : 24 * r + 48]  # 4 image rows × 12 taps
        qe = jax.lax.dot_general(blk, we[:], dn,
                                 preferred_element_type=pref)
        qh = jax.lax.dot_general(blk, wh[:], dn,
                                 preferred_element_type=pref)
        ql = jax.lax.dot_general(blk, wl[:], dn,
                                 preferred_element_type=pref)
        qo = qh + _rolldn(ql, 1)  # odd col p also reads group p+1
        out[0, r * g : (r + 1) * g, 0:o4] = _epilogue(
            qe, bias, relu, out_dtype, chan_scale, out_inv
        )
        out[0, r * g : (r + 1) * g, o4 : 2 * o4] = _epilogue(
            qo, bias, relu, out_dtype, chan_scale, out_inv
        )


def _entry_chain_kernel(r_block, g, o4, *refs):
    """Fused c1_1 (3×3 entry + s2d fold + requant) → c1_2 (2×2 stacked-K
    int8) → slot pool, one grid pass. c1_1's pf2 tensor lives only in a
    VMEM scratch: its 1.07 GB HBM write and c1_2's 1.07 GB read (512²,
    B=128) never happen. The entry runs R+1 rows per block (one-row
    recompute overlap, +1/R flops) so the c1_2 row tap's last row is
    local — the x_next ref pattern moves up to the RAW input."""
    (we, wh, wl, b1, oi1, ws2, b2, cs2, oi2,
     xm_ref, xn_ref, out2, pout, vs) = refs
    dn = (((0,), (0,)), ((), ()))
    xa = jnp.concatenate([xm_ref[0], xn_ref[0]], axis=0)
    for j in range(r_block + 1):
        blk = xa[24 * j : 24 * j + 48]
        qe = jax.lax.dot_general(blk, we[:], dn,
                                 preferred_element_type=jnp.float32)
        qh = jax.lax.dot_general(blk, wh[:], dn,
                                 preferred_element_type=jnp.float32)
        ql = jax.lax.dot_general(blk, wl[:], dn,
                                 preferred_element_type=jnp.float32)
        qo = qh + _rolldn(ql, 1)
        vs[j * g : (j + 1) * g, 0:o4] = _epilogue(
            qe, b1, True, jnp.int8, None, oi1
        )
        vs[j * g : (j + 1) * g, o4 : 2 * o4] = _epilogue(
            qo, b1, True, jnp.int8, None, oi1
        )
    xm = vs[0 : r_block * g]
    xn = vs[r_block * g : (r_block + 1) * g]
    acc_e, acc_o, last_e, last_o = _taps_pf2_stacked(
        xm, xn, ws2, g, r_block, o4
    )

    # pre-cast epilogue: pool on the f32 requant-unit value, monotone
    # finish after — skips the pool's s8→s32 unpack (_epilogue_parts)
    def epi(a):
        return _epilogue_parts(a, b2, True, jnp.int8, cs2, oi2)

    o = ws2.shape[-1]
    cut = (r_block - 1) * g
    yp_em, finish = epi(acc_e[:cut])
    yp_om, _ = epi(acc_o[:cut])
    yp_el, _ = epi(last_e)
    yp_ol, _ = epi(last_o)
    _store_pf2(out2, r_block, g, o, finish(yp_em), finish(yp_om),
               finish(yp_el), finish(yp_ol))
    _store_pf2(
        pout, r_block, g, o // 4,
        finish(_pool_slots(yp_em, None)),
        finish(_pool_slots(yp_om, None)),
        finish(_pool_slots(yp_el, None)),
        finish(_pool_slots(yp_ol, None)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("h_img", "r_block", "interpret"),
)
def entry_chain_pf2(xt, we, wh, wl, b1, w2, b2, *, h_img: int,
                    out_scale1: float, quant2, r_block: Optional[int] = None,
                    interpret: bool = False):
    """Fused level-1 serving chain on a pair-major input: conv3entry_pf2
    + conv2x2_pf2(pool=True) with the intermediate c1_1 tensor VMEM-
    resident (never written to HBM — its only consumer is c1_2).
    Bit-identical to the two-kernel composition: same requant points
    (c1_1 quantizes at ``out_scale1``, c1_2's epilogue uses ``quant2 =
    {chan_scale, out_scale}``), same tap/roll/patch structure.

    xt: [N, H·12, G] pair-major (entry_transform_pf2); we/wh/wl:
    [48, 4O] entry operands (entry_weights_pf2); w2: int8 [2, 2, 4O, 4O]
    c1_2 weight. Returns (conv2_out pf2 [N, nb·R·G, 8O] s8 — the level-1
    skip — and the pooled paired handoff [N, nb·R·G, 2O] s8).

    Reference semantics: UNet encoder level 1 (conv1_1+conv1_2+pool,
    /root/reference/models/unet.py:117-130), fused in the s2d/pf2
    formulation."""
    n, h12, g = xt.shape
    assert h12 == 12 * h_img, (h12, h_img)
    o4 = we.shape[-1]
    o = w2.shape[-1]
    assert o4 % 128 == 0 and o % 128 == 0 and g % 32 == 0, (o4, o, g)
    assert w2.dtype == jnp.int8, "entry_chain_pf2 is the int8 path"
    h1 = (h_img - 2) // 2      # c1_1 rows
    h_out = h1 - 1             # c1_2 rows
    if r_block is None:
        # r=32 measured 11.36 ms vs 13.35 at r=8 (512²/B=128): the
        # entry's per-row dots amortize over taller blocks — see
        # benchmarks/chain_sweep.py
        r_block = _auto_r(h_out, 32)
    r_block = _fit_r(
        max(2, min(r_block, h_out)), g,
        io_bytes=24 * xt.dtype.itemsize + 2 * o + o // 2,  # int8 outs
        acc_bytes=4 * 2 * o4 + 4 * 2 * o,  # c1_1 + c1_2 f32 accs
        aux_bytes=g * 2 * o4,              # int8 c1_1 scratch
    )
    r_block = max(2, r_block)
    r_block += r_block % 2     # next-ref block offset needs R even
    nb = pl.cdiv(h_out, r_block)
    grid = (n, nb)
    ws2 = jnp.concatenate(
        [w2[0, 0], w2[0, 1], w2[1, 0], w2[1, 1]], axis=0
    )
    oi1_arr, oi1_spec = _smem_scalar(1.0 / out_scale1)
    oi2_arr, oi2_spec = _smem_scalar(1.0 / quant2["out_scale"])
    cs2 = jnp.asarray(quant2["chan_scale"], jnp.float32)
    parts = [
        we.astype(xt.dtype), wh.astype(xt.dtype), wl.astype(xt.dtype),
        b1.astype(jnp.float32), oi1_arr, ws2, b2.astype(jnp.float32),
        cs2, oi2_arr,
    ]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [vspec, vspec, vspec, vspec, oi1_spec, vspec, vspec,
                vspec, oi2_spec]
    nb48 = h12 // 48 - 1
    rb2 = r_block // 2
    in_specs += [
        pl.BlockSpec((1, 24 * r_block, g), lambda n_, i: (n_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 48, g),
            lambda n_, i: (n_, jnp.minimum(rb2 * (i + 1), nb48), 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    kernel = functools.partial(_entry_chain_kernel, r_block, g, o4)
    out2, pooled = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, nb * r_block * g, 2 * o), jnp.int8),
            jax.ShapeDtypeStruct((n, nb * r_block * g, o // 2), jnp.int8),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, r_block * g, 2 * o), lambda n_, i: (n_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_block * g, o // 2),
                         lambda n_, i: (n_, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM(((r_block + 1) * g, 2 * o4), jnp.int8)
        ],
        interpret=_interp(interpret),
    )(*parts, xt, xt)
    return out2, pooled


@functools.partial(
    jax.jit,
    static_argnames=("h_img", "relu", "r_block", "interpret"),
)
def conv3entry_pf2(xt, we, wh, wl, b, *, h_img: int, relu: bool = True,
                   r_block: Optional[int] = None, quant=None,
                   interpret: bool = False):
    """Fused entry: pair-major input [N, H·12, G=W//4] → pf2 packed
    output [N, nb·R·G, 2·4O] (real (H-2)//2 packed rows × W//4 pair
    stride; the odd column of the last pair is junk).

    Modes: bf16 in + no quant → bf16 out; bf16 in + {out_scale} →
    EXACT-as-bf16 compute with the requant fused into the epilogue
    (the serving default — input quantization would cost mask accuracy
    for nothing: at K=48 the int8 MXU rate equals bf16's); int8 in +
    {chan_scale, out_scale} → full int8 path (u8-native image serving,
    where the input has no more than 8 bits anyway)."""
    n, h12, g = xt.shape
    assert h12 == 12 * h_img, (h12, h_img)
    o4 = we.shape[-1]
    assert o4 % 128 == 0 and g % 32 == 0, (o4, g)
    h_out = (h_img - 2) // 2
    if r_block is None:
        # r=32 measured 4.37 ms vs r=8's 5.14 at 512²/B=128 (the per-row
        # dots are latency-bound; taller blocks keep the MXU fed) — see
        # benchmarks/dual_entry_anatomy.py
        r_block = _auto_r(h_out, 32)
    ob = 1 if (quant is not None and "out_scale" in quant) else 2
    r_block = _fit_r(
        max(1, min(r_block, h_out)), g,
        io_bytes=24 * xt.dtype.itemsize + 2 * o4 * ob,
        acc_bytes=4 * 2 * o4,
    )
    nb = pl.cdiv(h_out, r_block)
    grid = (n, nb)
    in_int8 = xt.dtype == jnp.int8
    has_cs = quant is not None and "chan_scale" in quant
    has_oi = quant is not None and "out_scale" in quant
    out_dtype = jnp.int8 if has_oi else (
        jnp.bfloat16 if in_int8 else xt.dtype
    )
    extra_parts, extra_specs = [], []
    if has_cs:
        extra_parts.append(jnp.asarray(quant["chan_scale"], jnp.float32))
        extra_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if has_oi:
        arr, spec = _smem_scalar(1.0 / quant["out_scale"])
        extra_parts.append(arr)
        extra_specs.append(spec)
    wdt = xt.dtype if not in_int8 else jnp.int8
    we, wh, wl = (v if v.dtype == jnp.int8 else v.astype(wdt)
                  for v in (we, wh, wl))
    parts = [we, wh, wl, b.astype(jnp.float32)] + extra_parts
    in_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
                + extra_specs)
    in_specs += [
        # main: image rows 2r0 .. 2r0+2R-1 (one block = 24R flat rows)
        pl.BlockSpec((1, 24 * r_block, g), lambda n_, i: (n_, i, 0),
                     memory_space=pltpu.VMEM),
        # next: image rows 2r0+2R, +1 (last output row's bottom taps)
        pl.BlockSpec(
            (1, 24, g),
            lambda n_, i: (
                n_, jnp.minimum(r_block * (i + 1), h_img // 2 - 1), 0
            ),
            memory_space=pltpu.VMEM,
        ),
    ]
    kernel = functools.partial(
        _conv3entry_pf2_kernel, r_block, g, o4, relu, out_dtype,
        in_int8, has_cs, has_oi,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, nb * r_block * g, 2 * o4),
                                       out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r_block * g, 2 * o4),
                               lambda n_, i: (n_, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interp(interpret),
    )(*parts, xt, xt)
