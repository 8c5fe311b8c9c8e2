"""Differentiable wrappers over the forward-only Pallas serving kernels.

MEASURED NEGATIVE RESULT — kept as tested infrastructure, OFF by
default (opt in with ``SEG_PALLAS_TRAIN=1``; see ``backend_ok``).

The hypothesis: the pure-XLA training step pays ~34 ms/step of
standalone bias+relu HBM passes, ~30 ms of memory-pressure remat
recompute, and ~18 ms of relayout copies that the serving kernels'
fused epilogues avoid — so wrapping the serving kernels in custom_vjp
(Pallas forward, XLA linear-transpose backward) should claw those back.

The measurement (512²/B=128 on v5e, benchmarks/profile_train_cats.py
with/without): 422 ms/step vs 305 pure-XLA. The forward kernels ARE at
parity with XLA's conv fusions; the loss is the autodiff boundary.

ROUND-5 CLOSURE: the follow-up ("backward kernels in the same flat
layout") was built (nn/pallas/conv_flat_bwd.py, parity-locked) and
measured ISOLATED at the real shapes (benchmarks/dgrad_bench.py):
Pallas dgrad TIES XLA's input-grad conv at every site and the
flat-matmul wgrad loses 2-3x to XLA's wgrad convs (84-96% MFU
in-graph). There is no 1:1 kernel-swap win anywhere in this backward;
see docs/DESIGN.md §5 for the full record.
"Residual memory equals XLA's no-remat footprint" was the flaw: each
wrapper force-saves its input AND output, and XLA's own policy at this
batch is to remat those chains instead of keeping them — forcing both
live doubles activation residency, and XLA responds with
compressed-remat spills (+25 ms), a pool recompute in the backward
(+21 ms), and +30 ms of layout copies at the custom-call seams.
Conclusion recorded for round 4: a winning Pallas training path needs
backward (dgrad/wgrad) kernels in the same flat layout with planned
residuals — not XLA-transpose backward around Pallas forwards.

Mechanics (all parity-tested in tests/test_pallas_train.py): each
wrapper is a ``jax.custom_vjp`` whose primal runs the Pallas forward
kernel (bit-identical to serving) and whose backward is the SAME XLA
backward autodiff would emit for the equivalent XLA conv — built with
``jax.linear_transpose`` of the linear part, so no forward recompute is
traced. ReLU's mask comes from the saved output (y > 0 ==
pre-activation > 0), and the bias gradient is the plain cotangent sum.

Reference workload anchor: /root/reference/examples/example_fcn.py:47-49
(the batch training loop these steps serve).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from segmentation_tpu.nn.pallas import conv as pk

_DN = ("NHWC", "HWIO", "NHWC")


def backend_ok() -> bool:
    """Backend gate for the trainable-Pallas dispatch.

    OPT-IN (``SEG_PALLAS_TRAIN=1``), default off — MEASURED at 512²/B=128
    on v5e (benchmarks/profile_train_cats.py, both variants): the
    custom-VJP dispatch is 422 ms/step vs pure-XLA's 305. The forward
    kernels themselves are at parity (7.07 vs 7.83 ms at the top site);
    what loses is the autodiff boundary: every wrapper force-saves its
    input AND output, doubling live activation memory, so XLA responds
    with compressed-remat spills (+25 ms), recomputes the pool in the
    backward (+21 ms), and inserts +30 ms of layout copies at the
    custom-call seams. A winning Pallas training path needs the backward
    kernels (dgrad/wgrad) in the same flat layout with planned
    residuals, not XLA-transpose backward around Pallas forwards.

    ``SEG_PALLAS_TRAIN=2`` selects the recompute-mask variant: each
    wrapper saves ONLY its input (the same residual set standard
    autodiff keeps) and re-runs the Pallas forward inside the backward
    to rebuild the ReLU mask — trading one forward kernel per site for
    the halved activation residency that sank variant 1. ALSO MEASURED,
    ALSO LOSES: B=128 fails to compile outright (Pallas custom calls in
    the backward defeat the scheduler where plain variant-1 compiled),
    and B=64 runs at 267 img/s — the recompute kernels serialize
    against the backward chain instead of hiding. The custom-call seam
    is the problem, not the residual policy.

    Interpret mode (CPU parity tests) enables it regardless so the
    wrappers stay tested — unless ``SEG_PALLAS_TRAIN=0`` is set
    explicitly, which always wins (so CPU interpret runs can select the
    pure-XLA trainable path). Per-site channel alignment is checked at
    the model hooks (C%128 for conv2x2/matmul, 2C%64 for the strided
    entry).

    NOTE: like ``_save_output``, this is read at TRACE time. A jitted
    train step (and the lru_cache'd custom_vjp closures) compiled under
    one setting keeps that dispatch if the env var changes later
    in-process — set the env before building the trainer.
    """
    if os.environ.get("SEG_PALLAS_TRAIN") == "0":
        return False
    if os.environ.get("SEG_PALLAS_INTERPRET") == "1":
        return True
    if os.environ.get("SEG_PALLAS_TRAIN") not in ("1", "2"):
        return False
    try:
        return jax.default_backend() == "tpu" and len(jax.devices()) == 1
    except Exception:  # backend not initialized yet
        return False


def _save_output() -> bool:
    """Variant switch: True (SEG_PALLAS_TRAIN=1) saves the output for
    the ReLU mask; False (=2) recomputes it in the backward. Read at
    trace time — callers re-trace per env configuration."""
    return os.environ.get("SEG_PALLAS_TRAIN") != "2"


def _mask(g, y, relu):
    if not relu:
        return g
    return jnp.where(y > 0, g, jnp.zeros_like(g))


def _db(g, b4):
    return jnp.sum(g, (0, 1, 2)).astype(b4.dtype)


# --------------------------------------------------------------- conv2x2
@functools.lru_cache(None)
def _conv2x2_t(relu: bool, save_y: bool):
    def lin(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "VALID", dimension_numbers=_DN
        )

    def prim(x, w, b4):
        return pk.conv2x2_flat(x, w, b4, relu=relu)

    def fwd(x, w, b4):
        y = prim(x, w, b4)
        return y, (x, w, b4, y if relu and save_y else None)

    def bwd(res, g):
        x, w, b4, y = res
        if relu and y is None:
            y = prim(x, w, b4)  # recompute-mask variant
        g = _mask(g, y, relu)
        (dx,) = jax.linear_transpose(lambda t: lin(t, w), x)(g)
        (dw,) = jax.linear_transpose(lambda t: lin(x, t), w)(g)
        return dx, dw, _db(g, b4)

    f = jax.custom_vjp(prim)
    f.defvjp(fwd, bwd)
    return f


def conv2x2_t(x, w, b4, relu: bool = True):
    """Trainable conv2x2_flat: [N,H,W,C] x [2,2,C,O] -> [N,H-1,W-1,O]."""
    return _conv2x2_t(relu, _save_output())(x, w, b4)


# ---------------------------------------------------------- dual conv2x2
@functools.lru_cache(None)
def _conv2x2_dual_t(relu: bool, save_y: bool):
    def lin(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "VALID", dimension_numbers=_DN
        )

    def prim(xa, xb, wa, wb, b4):
        return pk.conv2x2_dual_flat(xa, xb, wa, wb, b4, relu=relu)

    def fwd(xa, xb, wa, wb, b4):
        y = prim(xa, xb, wa, wb, b4)
        return y, (xa, xb, wa, wb, b4, y if relu and save_y else None)

    def bwd(res, g):
        xa, xb, wa, wb, b4, y = res
        if relu and y is None:
            y = prim(xa, xb, wa, wb, b4)  # recompute-mask variant
        g = _mask(g, y, relu)
        (dxa,) = jax.linear_transpose(lambda t: lin(t, wa), xa)(g)
        (dxb,) = jax.linear_transpose(lambda t: lin(t, wb), xb)(g)
        (dwa,) = jax.linear_transpose(lambda t: lin(xa, t), wa)(g)
        (dwb,) = jax.linear_transpose(lambda t: lin(xb, t), wb)(g)
        return dxa, dxb, dwa, dwb, _db(g, b4)

    f = jax.custom_vjp(prim)
    f.defvjp(fwd, bwd)
    return f


def conv2x2_dual_t(xa, xb, wa, wb, b4, relu: bool = True):
    """Trainable conv2x2_dual_flat (concat-free decoder conv): same-shape
    operands only (the crop is materialized upstream in training)."""
    return _conv2x2_dual_t(relu, _save_output())(xa, xb, wa, wb, b4)


# ----------------------------------------------------- strided entry conv
@functools.lru_cache(None)
def _conv4x4s2_t(relu: bool, save_y: bool):
    def lin(x, w4):
        return lax.conv_general_dilated(
            x, w4.astype(x.dtype), (2, 2), "VALID", dimension_numbers=_DN
        )

    def prim(x, w4, b4):
        return pk.conv4x4s2_flat(x, w4, b4, relu=relu)

    def fwd(x, w4, b4):
        y = prim(x, w4, b4)
        return y, (x, w4, b4, y if relu and save_y else None)

    def bwd(res, g):
        x, w4, b4, y = res
        if relu and y is None:
            y = prim(x, w4, b4)  # recompute-mask variant
        g = _mask(g, y, relu)
        (dx,) = jax.linear_transpose(lambda t: lin(t, w4), x)(g)
        (dw,) = jax.linear_transpose(lambda t: lin(x, t), w4)(g)
        return dx, dw, _db(g, b4)

    f = jax.custom_vjp(prim)
    f.defvjp(fwd, bwd)
    return f


def conv4x4s2_t(x, w4, b4, relu: bool = True):
    """Trainable conv4x4s2_flat (strided s2d entry conv): unpacked
    [N,H,W,C] -> packed flat [N,(H-2)//2,(W-2)//2,O4]."""
    return _conv4x4s2_t(relu, _save_output())(x, w4, b4)


# --------------------------------------------------- deconv (matmul form)
@functools.lru_cache(None)
def _matmul_rows_t(relu: bool, save_y: bool):
    def lin(x, wm):
        return jnp.einsum("nijc,ck->nijk", x, wm.astype(x.dtype))

    def prim(x, wm, b4):
        return pk.matmul_rows_flat(x, wm, b4, relu=relu)

    def fwd(x, wm, b4):
        y = prim(x, wm, b4)
        return y, (x, wm, b4, y if relu and save_y else None)

    def bwd(res, g):
        x, wm, b4, y = res
        if relu and y is None:
            y = prim(x, wm, b4)  # recompute-mask variant
        g = _mask(g, y, relu)
        (dx,) = jax.linear_transpose(lambda t: lin(t, wm), x)(g)
        (dwm,) = jax.linear_transpose(lambda t: lin(x, t), wm)(g)
        return dx, dwm, _db(g, b4)

    f = jax.custom_vjp(prim)
    f.defvjp(fwd, bwd)
    return f


def matmul_rows_t(x, wm, b4, relu: bool = True):
    """Trainable matmul_rows_flat (2x2/2 deconv, unpacked input)."""
    return _matmul_rows_t(relu, _save_output())(x, wm, b4)


# --------------------------------------------------- deconv (packed input)
def _deconv_lin(x4, wm):
    n, i, j, c4 = x4.shape
    c = c4 // 4
    o = wm.shape[-1] // 4
    y = jnp.einsum(
        "nijsc,ck->nijsk", x4.reshape(n, i, j, 4, c), wm.astype(x4.dtype)
    )
    y = y.reshape(n, i, j, 2, 2, 2, 2, o)
    y = y.transpose(0, 1, 3, 2, 4, 5, 6, 7)
    return y.reshape(n, 2 * i, 2 * j, 4 * o)


@functools.lru_cache(None)
def _deconv_packed_t(relu: bool, save_y: bool):
    def prim(x4, wm, b4):
        return pk.deconv_packed_flat(x4, wm, b4, relu=relu)

    def fwd(x4, wm, b4):
        y = prim(x4, wm, b4)
        return y, (x4, wm, b4, y if relu and save_y else None)

    def bwd(res, g):
        x4, wm, b4, y = res
        if relu and y is None:
            y = prim(x4, wm, b4)  # recompute-mask variant
        g = _mask(g, y, relu)
        (dx,) = jax.linear_transpose(lambda t: _deconv_lin(t, wm), x4)(g)
        (dwm,) = jax.linear_transpose(lambda t: _deconv_lin(x4, t), wm)(g)
        return dx, dwm, _db(g, b4)

    f = jax.custom_vjp(prim)
    f.defvjp(fwd, bwd)
    return f


def deconv_packed_t(x4, wm, b4, relu: bool = True):
    """Trainable deconv_packed_flat (2x2/2 deconv, packed in/out)."""
    return _deconv_packed_t(relu, _save_output())(x4, wm, b4)
