"""Parity locks for the flat-layout backward kernels (conv_flat_bwd).

dgrad/wgrad/bias-grad of the padded-flat 2×2 VALID conv are pinned
bit-level (f32, highest precision) against jax.vjp of the equivalent
XLA conv — the exact gradients autodiff would produce (VERDICT r4 item
3: "grads parity-locked in CPU interpret against the XLA VJP").
Kernels run in interpret mode on CPU (explicit interpret=True — no
env override, which would leak into other tests' backend gates).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from segmentation_tpu.nn.pallas.conv_flat import (
    pad_rows,
    stride_for,
    unpad_rows,
)
from segmentation_tpu.nn.pallas.conv_flat_bwd import (
    bias_grad_flat,
    conv2x2_dgrad_padflat,
    conv2x2_wgrad_flat,
)

_DN = ("NHWC", "HWIO", "NHWC")


def _oracle(x4, w, g4):
    """XLA-VJP gradients of the 2×2 VALID conv (+bias implicit)."""
    def f(x_, w_):
        return lax.conv_general_dilated(
            x_, w_, (1, 1), "VALID", dimension_numbers=_DN
        )

    _, vjp = jax.vjp(f, x4, w)
    return vjp(g4)


def _mk(np_rng, n=2, h=7, w=6, c=128, o=128, dtype=jnp.float32):
    x4 = jnp.asarray(np_rng.standard_normal((n, h, w, c)), dtype)
    wk = jnp.asarray(np_rng.standard_normal((2, 2, c, o)) * 0.1, dtype)
    g4 = jnp.asarray(np_rng.standard_normal((n, h - 1, w - 1, o)), dtype)
    return x4, wk, g4


@pytest.mark.parametrize("r_block", [None, 1, 3])
def test_dgrad_parity(np_rng, r_block):
    x4, wk, g4 = _mk(np_rng)
    n, h, w, c = x4.shape
    s = stride_for(w, x4.dtype)
    gx_ref, _ = _oracle(x4, wk, g4)

    g_flat = pad_rows(g4, s)  # zero junk — the cotangent contract
    gx_flat = conv2x2_dgrad_padflat(
        g_flat, wk, h_out=h, w_out=w, s=s, r_block=r_block,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(unpad_rows(gx_flat, s, h, w)), np.asarray(gx_ref),
        rtol=1e-5, atol=1e-5,
    )


def test_dgrad_zero_junk_output(np_rng):
    """gx's junk columns AND rows (through the block-padded allocation)
    come out exactly zero — the contract the next backward site relies
    on."""
    x4, wk, g4 = _mk(np_rng)
    n, h, w, c = x4.shape
    s = stride_for(w, x4.dtype)
    gx_flat = conv2x2_dgrad_padflat(
        pad_rows(g4, s), wk, h_out=h, w_out=w, s=s, interpret=True,
    )
    real = unpad_rows(gx_flat, s, h, w)
    rebuilt = pad_rows(real, s, hp=gx_flat.shape[1] // s)
    np.testing.assert_array_equal(np.asarray(gx_flat), np.asarray(rebuilt))


def test_dgrad_exact_allocation(np_rng):
    """A cotangent allocated EXACTLY (h−1)·S rows exercises the u=0
    source mask (without it, Pallas out-of-bounds reads feed garbage
    into gx's last real row)."""
    x4, wk, g4 = _mk(np_rng, h=9, w=8)
    n, h, w, c = x4.shape
    s = stride_for(w, x4.dtype)
    g_flat = pad_rows(g4, s)
    assert g_flat.shape[1] == (h - 1) * s  # exactly, no spare rows
    gx_ref, _ = _oracle(x4, wk, g4)
    gx_flat = conv2x2_dgrad_padflat(
        g_flat, wk, h_out=h, w_out=w, s=s, r_block=4, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(unpad_rows(gx_flat, s, h, w)), np.asarray(gx_ref),
        rtol=1e-5, atol=1e-5,
    )


def test_wgrad_parity_with_garbage_x_junk(np_rng):
    """wgrad contracts the full padded span; x's junk may be GARBAGE
    (forward contract) as long as g's junk is zero."""
    x4, wk, g4 = _mk(np_rng)
    n, h, w, c = x4.shape
    s = stride_for(w, x4.dtype)
    _, gw_ref = _oracle(x4, wk, g4)

    x_flat = pad_rows(x4, s)
    junk = jnp.asarray(
        np_rng.standard_normal(x_flat.shape) * 100, x_flat.dtype
    )
    mask = pad_rows(jnp.ones_like(x4), s) > 0
    x_flat = jnp.where(mask, x_flat, junk)  # garbage junk, real window

    gw = conv2x2_wgrad_flat(x_flat, pad_rows(g4, s), h_out=h, s=s)
    np.testing.assert_allclose(
        np.asarray(gw), np.asarray(gw_ref), rtol=1e-5, atol=1e-5
    )


def test_wgrad_exact_allocation(np_rng):
    """x allocated exactly h·S rows: the (1,1) tap's shifted view would
    run one position past the buffer — the kernel drops the final
    (zero-by-contract) g position instead."""
    x4, wk, g4 = _mk(np_rng, h=5, w=8)
    n, h, w, c = x4.shape
    s = stride_for(w, x4.dtype)
    x_flat = pad_rows(x4, s)
    assert x_flat.shape[1] == h * s
    _, gw_ref = _oracle(x4, wk, g4)
    gw = conv2x2_wgrad_flat(x_flat, pad_rows(g4, s), h_out=h, s=s)
    np.testing.assert_allclose(
        np.asarray(gw), np.asarray(gw_ref), rtol=1e-5, atol=1e-5
    )


def test_bias_grad(np_rng):
    x4, wk, g4 = _mk(np_rng)
    n, h, w, c = x4.shape
    s = stride_for(w, x4.dtype)
    db = bias_grad_flat(pad_rows(g4, s), h_out=h, s=s)
    np.testing.assert_allclose(
        np.asarray(db), np.asarray(jnp.sum(g4, (0, 1, 2))),
        rtol=1e-5, atol=1e-5,
    )


def test_dgrad_bf16_matches_bf16_xla(np_rng):
    """bf16 path (training dtype): compare against the XLA VJP run in
    bf16 — same inputs, same dtype discipline, f32 accumulation."""
    x4, wk, g4 = _mk(np_rng, dtype=jnp.bfloat16)
    n, h, w, c = x4.shape
    s = stride_for(w, x4.dtype)
    gx_ref, _ = _oracle(x4, wk, g4)
    gx_flat = conv2x2_dgrad_padflat(
        pad_rows(g4, s), wk, h_out=h, w_out=w, s=s, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(unpad_rows(gx_flat, s, h, w), np.float32),
        np.asarray(gx_ref, np.float32),
        rtol=0.05, atol=0.05,
    )


@pytest.mark.parametrize("r_block", [None, 2])
def test_dgrad_dual_parity(np_rng, r_block):
    from segmentation_tpu.nn.pallas.conv_flat_bwd import (
        conv2x2_dgrad_dual_padflat,
    )

    n, h, w, c, o = 2, 7, 6, 128, 128
    xa = jnp.asarray(np_rng.standard_normal((n, h, w, c)), jnp.float32)
    xb = jnp.asarray(np_rng.standard_normal((n, h, w, c)), jnp.float32)
    wa = jnp.asarray(np_rng.standard_normal((2, 2, c, o)) * 0.1,
                     jnp.float32)
    wb = jnp.asarray(np_rng.standard_normal((2, 2, c, o)) * 0.1,
                     jnp.float32)
    g4 = jnp.asarray(np_rng.standard_normal((n, h - 1, w - 1, o)),
                     jnp.float32)

    def f(a, b):
        return (
            lax.conv_general_dilated(a, wa, (1, 1), "VALID",
                                     dimension_numbers=_DN)
            + lax.conv_general_dilated(b, wb, (1, 1), "VALID",
                                       dimension_numbers=_DN)
        )

    _, vjp = jax.vjp(f, xa, xb)
    gxa_ref, gxb_ref = vjp(g4)

    s = stride_for(w, xa.dtype)
    gxa, gxb = conv2x2_dgrad_dual_padflat(
        pad_rows(g4, s), wa, wb, h_out=h, w_out=w, s=s,
        r_block=r_block, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(unpad_rows(gxa, s, h, w)), np.asarray(gxa_ref),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(unpad_rows(gxb, s, h, w)), np.asarray(gxb_ref),
        rtol=1e-5, atol=1e-5,
    )


def test_dgrad_hp_out_exact(np_rng):
    """hp_out pins the output allocation to exactly the forward input's
    row count (custom_vjp shape contract); the partially-out-of-range
    tail block's stores are masked by Pallas."""
    x4, wk, g4 = _mk(np_rng, h=7, w=6)
    n, h, w, c = x4.shape
    s = stride_for(w, x4.dtype)
    gx_ref, _ = _oracle(x4, wk, g4)
    gx_flat = conv2x2_dgrad_padflat(
        pad_rows(g4, s), wk, h_out=h, w_out=w, s=s, r_block=3,
        hp_out=h, interpret=True,
    )
    assert gx_flat.shape[1] == h * s
    np.testing.assert_allclose(
        np.asarray(unpad_rows(gx_flat, s, h, w)), np.asarray(gx_ref),
        rtol=1e-5, atol=1e-5,
    )
