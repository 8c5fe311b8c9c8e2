"""Backward (dgrad/wgrad) companions to the padded-flat conv kernels.

Round-3/4 measurements (docs/DESIGN.md §5, nn/pallas/train.py) proved
that wrapping the Pallas serving FORWARDS in custom_vjp with XLA
backwards loses to pure XLA: the win has to come from the backward
itself, in the same flat layout, with planned residuals. This module is
that backward:

  - ``conv2x2_dgrad_padflat``: input-gradient of the 2×2 VALID flat
    conv. Structurally the MIRROR of conv_flat._conv2x2_padflat_kernel:
    gx[f] = Σ_{u,v} g[f − u·S − v] · w[u,v]ᵀ — four K=O dots of the
    same contiguous block, with the row taps rolled UP (toward lower
    flat rows) instead of down, and the block's FIRST row patched from
    the previous block's last row (the forward patches its LAST row
    from the next block).

  - ``conv2x2_wgrad_flat``: filter gradient as four plain XLA matmuls
    contracting [N·(h−1)·S] — the flat layout turns the wgrad conv into
    a dot over contiguous row-shifted views (no im2col, no layout
    change), which XLA tiles at full MXU rate.

ZERO-JUNK COTANGENT CONTRACT. Forward flat activations carry finite
junk in columns w..S-1 and rows beyond h (conv_flat.py docstring);
cotangents here carry ZEROS there instead. That single invariant
deletes every boundary mask the "full"-correlation dgrad would need:

  - out col 0's v=1 tap reads the previous flat row's col S-1 — a junk
    column of g — which is 0, so the sublane roll needs no column mask;
  - out col w−1's v=0 tap and the junk columns read g's junk — 0;
  - gx's own junk columns read only g junk — so they come out zero and
    the contract propagates through the backward chain for free.

Only two row masks remain (both per-block VPU selects, negligible):
the u=0 taps are zeroed past g's last real row (a cotangent allocated
exactly (h−1)·S rows would otherwise feed Pallas out-of-bounds garbage
— NOT zeros — into gx's last real row), and stored rows past gx's real
h are zeroed to re-establish the contract for the next site.

Entry (stride-2) convs keep the XLA parity-decomposed dgrad
(models/unet_fast._s2conv_t) — they sit at the region boundary where
the cotangent is 4-D anyway.

Parity: tests/test_conv_flat_bwd.py pins dgrad+wgrad bit-level against
jax.vjp of the equivalent XLA conv (CPU interpret mode).
Reference anchor: backward of /root/reference/models/unet.py:109-175
(the conv stacks these gradients train).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segmentation_tpu.nn.pallas.conv import _auto_r, _fit_r
from segmentation_tpu.nn.pallas.conv_flat import _interp

_DN = ("NHWC", "HWIO", "NHWC")


def _rollup(v, d):
    """Shift toward HIGHER flat rows by d: out[k] = v[k − d] (wraps)."""
    return pltpu.roll(v, d, 0)


def _conv2x2_dgrad_padflat_kernel(r_block, s, h_out, out_dtype, *refs):
    """One grid step: [R·S, O] block of g → [R·S, C] block of gx.

    h_out: gx's real row count (g has h_out−1 real rows).
    """
    wt00, wt01, wt10, wt11, g_main_ref, g_prev_ref, out_ref = refs
    i = pl.program_id(1)
    g_main = g_main_ref[0]
    g_prev = g_prev_ref[0]

    rows = lax.broadcasted_iota(jnp.int32, (r_block * s, 1), 0)

    # Source mask: g rows ≥ h_out−1 are junk (zero when allocated, but
    # Pallas OUT-OF-BOUNDS garbage when the cotangent's allocation ends
    # at exactly (h_out−1)·S rows). The u=0 taps would feed them into
    # gx's last real row, and a rolled u=1 tap WRAPS the block end into
    # the first main row's column 0 — mask all four products at the
    # source so every junk/OOB read contributes exactly zero.
    lim_g = (h_out - 1 - i * r_block) * s

    def src(wt):
        q = jnp.dot(g_main, wt[:], preferred_element_type=jnp.float32)
        return jnp.where(rows < lim_g, q, 0.0)

    keep = src(wt00) + _rollup(src(wt01), 1)
    acc = keep + _rollup(src(wt10), s) + _rollup(src(wt11), s + 1)

    # First-row patch: block row 0's u=1 taps live in the PREVIOUS
    # block's last row (zero contribution for the tensor's first block).
    p10 = jnp.dot(g_prev, wt10[:], preferred_element_type=jnp.float32)
    p11 = jnp.dot(g_prev, wt11[:], preferred_element_type=jnp.float32)
    prev = jnp.where(i > 0, p10 + _rollup(p11, 1), 0.0)
    first = keep[:s] + prev

    # Output contract: rows past gx's real h are stored as ZEROS.
    lim_out = (h_out - i * r_block) * s
    first = jnp.where(rows[:s] < lim_out, first, 0.0).astype(out_dtype)
    main = jnp.where(rows < lim_out, acc, 0.0).astype(out_dtype)
    out_ref[0, 0:s] = first
    if r_block > 1:
        out_ref[0, s : r_block * s] = main[s:]


@functools.partial(
    jax.jit,
    static_argnames=("h_out", "w_out", "s", "r_block", "hp_out",
                     "interpret"),
)
def conv2x2_dgrad_padflat(g, w, *, h_out: int, w_out: int, s: int,
                          r_block: Optional[int] = None,
                          hp_out: Optional[int] = None,
                          interpret: bool = False):
    """Input-gradient of conv2x2_padflat.

    g: [N, HPg·S, O] flat cotangent of the conv output (real geometry
    (h_out−1) × (w_out−1) at stride s, junk ZEROED); w: [2, 2, C, O]
    (the forward weight). Returns gx flat [N, HP·S, C] with real
    geometry h_out × w_out and ZEROED junk (rows beyond h_out, through
    the allocation, are zero). ``hp_out`` pins the output allocation's
    row count (a custom_vjp must return dx with exactly x's shape —
    Pallas masks the partially-out-of-range tail stores); default is
    the block-padded nb·R. C, O must be 128-multiples.
    """
    n, _, o = g.shape
    c = w.shape[2]
    assert c % 128 == 0 and o % 128 == 0, (c, o)
    if r_block is None:
        r_block = _auto_r(h_out)
    io_bytes = g.dtype.itemsize * o + 2 * c  # g in, bf16/f32-ish out
    r_block = _fit_r(max(1, min(r_block, h_out)), s, io_bytes,
                     acc_bytes=4 * c)
    nb = pl.cdiv(hp_out or h_out, r_block)
    hp = hp_out or nb * r_block
    assert hp >= h_out, (hp, h_out)
    grid = (n, nb)
    wt = w.astype(g.dtype)
    parts = [
        jnp.transpose(wt[0, 0]), jnp.transpose(wt[0, 1]),
        jnp.transpose(wt[1, 0]), jnp.transpose(wt[1, 1]),
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    in_specs += [
        pl.BlockSpec((1, r_block * s, o), lambda n_, i: (n_, i, 0),
                     memory_space=pltpu.VMEM),
        # previous block's last row (clamped at the first block — the
        # kernel zeroes its contribution there)
        pl.BlockSpec(
            (1, s, o),
            lambda n_, i: (n_, jnp.maximum(i * r_block - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    kernel = functools.partial(
        _conv2x2_dgrad_padflat_kernel, r_block, s, h_out, g.dtype
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hp * s, c), g.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r_block * s, c),
                               lambda n_, i: (n_, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interp(interpret),
    )(*parts, g, g)


def _conv2x2_dgrad_dual_kernel(r_block, s, h_out, out_dtype, *refs):
    """Dual-site dgrad: ONE pass over the cotangent block produces both
    operands' input gradients (the decoder dual conv reads the skip and
    the upsampled tensor; its backward would otherwise stream g twice)."""
    wts = refs[0:8]   # a-taps then b-taps, each (00, 01, 10, 11)
    g_main_ref, g_prev_ref = refs[8], refs[9]
    outs = refs[10:12]
    i = pl.program_id(1)
    g_main = g_main_ref[0]
    g_prev = g_prev_ref[0]
    rows = lax.broadcasted_iota(jnp.int32, (r_block * s, 1), 0)
    lim_g = (h_out - 1 - i * r_block) * s
    lim_out = (h_out - i * r_block) * s

    for half in range(2):
        wt00, wt01, wt10, wt11 = wts[4 * half : 4 * half + 4]

        def src(wt):
            q = jnp.dot(g_main, wt[:], preferred_element_type=jnp.float32)
            return jnp.where(rows < lim_g, q, 0.0)

        keep = src(wt00) + _rollup(src(wt01), 1)
        acc = keep + _rollup(src(wt10), s) + _rollup(src(wt11), s + 1)
        p10 = jnp.dot(g_prev, wt10[:], preferred_element_type=jnp.float32)
        p11 = jnp.dot(g_prev, wt11[:], preferred_element_type=jnp.float32)
        prev = jnp.where(i > 0, p10 + _rollup(p11, 1), 0.0)
        first = keep[:s] + prev
        first = jnp.where(rows[:s] < lim_out, first, 0.0).astype(out_dtype)
        main = jnp.where(rows < lim_out, acc, 0.0).astype(out_dtype)
        outs[half][0, 0:s] = first
        if r_block > 1:
            outs[half][0, s : r_block * s] = main[s:]


@functools.partial(
    jax.jit,
    static_argnames=("h_out", "w_out", "s", "r_block", "hp_out",
                     "interpret"),
)
def conv2x2_dgrad_dual_padflat(g, wa, wb, *, h_out: int, w_out: int,
                               s: int, r_block: Optional[int] = None,
                               hp_out: Optional[int] = None,
                               interpret: bool = False):
    """Input-gradients of conv2x2_dual_padflat: returns (gxa, gxb), each
    flat [N, HP·S, C] with zeroed junk — same contract and structure
    as conv2x2_dgrad_padflat, with the g block read once for both."""
    n, _, o = g.shape
    c = wa.shape[2]
    assert c % 128 == 0 and o % 128 == 0, (c, o)
    assert wa.shape == wb.shape, (wa.shape, wb.shape)
    if r_block is None:
        r_block = _auto_r(h_out)
    io_bytes = g.dtype.itemsize * o + 2 * 2 * c  # g in, two outs
    r_block = _fit_r(max(1, min(r_block, h_out)), s, io_bytes,
                     acc_bytes=2 * 4 * c)
    nb = pl.cdiv(hp_out or h_out, r_block)
    hp = hp_out or nb * r_block
    assert hp >= h_out, (hp, h_out)
    parts = []
    for w in (wa, wb):
        wt = w.astype(g.dtype)
        parts += [
            jnp.transpose(wt[0, 0]), jnp.transpose(wt[0, 1]),
            jnp.transpose(wt[1, 0]), jnp.transpose(wt[1, 1]),
        ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
    in_specs += [
        pl.BlockSpec((1, r_block * s, o), lambda n_, i: (n_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, s, o),
            lambda n_, i: (n_, jnp.maximum(i * r_block - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_spec = pl.BlockSpec((1, r_block * s, c), lambda n_, i: (n_, i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _conv2x2_dgrad_dual_kernel, r_block, s, h_out, g.dtype
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, hp * s, c), g.dtype),
            jax.ShapeDtypeStruct((n, hp * s, c), g.dtype),
        ),
        grid=(n, nb),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        interpret=_interp(interpret),
    )(*parts, g, g)


def conv2x2_wgrad_flat(x, g, *, h_out: int, s: int,
                       pref=jnp.float32):
    """Filter gradient of the flat 2×2 VALID conv, as four XLA dots.

    x: [N, HPx·S, C] forward input (junk arbitrary); g: [N, HPg·S, O]
    cotangent (real (h_out−1)×(w_out−1), junk ZERO — so contracting the
    full padded span adds exact zeros and no mask is needed). Returns
    gw [2, 2, C, O] in f32 (caller casts).

    gw[u,v] = Σ_{n,f} x[n, f+u·s+v, :] ⊗ g[n, f, :] — each tap is one
    [C, K]·[K, O] dot with K = N·(h_out−1)·S over a CONTIGUOUS
    row-shifted view of x (the flat layout makes the wgrad conv a plain
    matmul; no im2col, no relayout).
    """
    L = (h_out - 1) * s
    g2 = g[:, :L, :]
    dn = (((0, 1), (0, 1)), ((), ()))  # contract batch+flat rows
    taps = []
    for u in (0, 1):
        for v in (0, 1):
            off = u * s + v
            span = L
            gg = g2
            if off + L > x.shape[1]:
                # (1,1) tap of an exactly-h_out·S allocation: the final
                # g position is a junk column (zero) — drop it instead
                # of reading past x.
                span = x.shape[1] - off
                gg = g2[:, :span, :]
            xs = lax.slice_in_dim(x, off, off + span, axis=1)
            taps.append(
                lax.dot_general(xs, gg, dn, preferred_element_type=pref)
            )
    return jnp.stack(
        [jnp.stack(taps[0:2], 0), jnp.stack(taps[2:4], 0)], 0
    )


def bias_grad_flat(g, *, h_out: int, s: int):
    """Bias gradient: plain sum over g's real span (junk rows/cols are
    zero by the cotangent contract, so the padded tail adds nothing)."""
    return jnp.sum(g[:, : (h_out - 1) * s, :].astype(jnp.float32), (0, 1))
