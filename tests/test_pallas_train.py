"""Gradient parity for the trainable-Pallas wrappers (nn/pallas/train.py).

Each wrapper is a custom_vjp whose primal is a forward-only Pallas
serving kernel and whose backward is the linear-transpose of the
equivalent XLA op. These tests check BOTH directions against pure-XLA
oracles in interpret mode on CPU: the forward value, and the gradients
w.r.t. every operand (input(s), weight, tiled bias) under a random
cotangent-shaped loss.

Replaces the informal-by-inspection quality process of the reference
(/root/reference/models/basemodel.py has no tests); the workload these
kernels serve is the reference's batch train loop
(/root/reference/examples/example_fcn.py:47-49).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from segmentation_tpu.nn.pallas import train as tr

_DN = ("NHWC", "HWIO", "NHWC")


def _loss_pair(f_got, f_want, args, np_rng):
    """Return (got, want) of (value, grads) for sum(f * cot)."""
    probe = f_want(*args)
    cot = jnp.asarray(np_rng.normal(size=probe.shape), probe.dtype)

    def lg(f):
        def loss(*a):
            return jnp.sum(f(*a) * cot)

        val, grads = jax.value_and_grad(loss, argnums=tuple(range(len(args))))(
            *args
        )
        return val, grads

    return lg(f_got), lg(f_want)


def _check(got, want, atol=2e-3):
    val_g, grads_g = got
    val_w, grads_w = want
    np.testing.assert_allclose(np.asarray(val_g), np.asarray(val_w),
                               rtol=1e-3, atol=atol)
    assert len(grads_g) == len(grads_w)
    for gg, gw in zip(grads_g, grads_w):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=1e-3, atol=atol)


@pytest.mark.parametrize("variant", ["1", "2"])
@pytest.mark.parametrize("relu", [True, False])
def test_conv2x2_t_grads(monkeypatch, np_rng, relu, variant):
    monkeypatch.setenv("SEG_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("SEG_PALLAS_TRAIN", variant)  # 2 = recompute mask
    c = o = 128
    x = jnp.asarray(np_rng.normal(size=(2, 7, 9, c)), jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b4 = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)

    def ref(x, w, b4):
        y = lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                     dimension_numbers=_DN) + b4
        return jax.nn.relu(y) if relu else y

    got, want = _loss_pair(
        lambda *a: tr.conv2x2_t(*a, relu=relu), ref, (x, w, b4), np_rng
    )
    _check(got, want)


def test_conv2x2_dual_t_grads(monkeypatch, np_rng):
    monkeypatch.setenv("SEG_PALLAS_INTERPRET", "1")
    c = o = 128
    xa = jnp.asarray(np_rng.normal(size=(2, 6, 8, c)), jnp.float32)
    xb = jnp.asarray(np_rng.normal(size=(2, 6, 8, c)), jnp.float32)
    wa = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    wb = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b4 = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)

    def ref(xa, xb, wa, wb, b4):
        ya = lax.conv_general_dilated(xa, wa, (1, 1), "VALID",
                                      dimension_numbers=_DN)
        yb = lax.conv_general_dilated(xb, wb, (1, 1), "VALID",
                                      dimension_numbers=_DN)
        return jax.nn.relu(ya + yb + b4)

    got, want = _loss_pair(tr.conv2x2_dual_t, ref, (xa, xb, wa, wb, b4),
                           np_rng)
    _check(got, want)


def test_conv4x4s2_t_grads(monkeypatch, np_rng):
    monkeypatch.setenv("SEG_PALLAS_INTERPRET", "1")
    c, o4 = 64, 128
    x = jnp.asarray(np_rng.normal(size=(2, 14, 18, c)), jnp.float32)
    w4 = jnp.asarray(np_rng.normal(size=(4, 4, c, o4)) * 0.05, jnp.float32)
    b4 = jnp.asarray(np_rng.normal(size=(o4,)), jnp.float32)

    def ref(x, w4, b4):
        y = lax.conv_general_dilated(x, w4, (2, 2), "VALID",
                                     dimension_numbers=_DN) + b4
        return jax.nn.relu(y)

    got, want = _loss_pair(tr.conv4x4s2_t, ref, (x, w4, b4), np_rng)
    _check(got, want)


def test_matmul_rows_t_grads(monkeypatch, np_rng):
    monkeypatch.setenv("SEG_PALLAS_INTERPRET", "1")
    c = k = 128
    x = jnp.asarray(np_rng.normal(size=(2, 5, 9, c)), jnp.float32)
    wm = jnp.asarray(np_rng.normal(size=(c, k)) * 0.05, jnp.float32)
    b4 = jnp.asarray(np_rng.normal(size=(k,)), jnp.float32)

    def ref(x, wm, b4):
        return jax.nn.relu(jnp.einsum("nijc,ck->nijk", x, wm) + b4)

    got, want = _loss_pair(tr.matmul_rows_t, ref, (x, wm, b4), np_rng)
    _check(got, want)


@pytest.mark.parametrize("variant", ["1", "2"])
def test_deconv_packed_t_grads(monkeypatch, np_rng, variant):
    monkeypatch.setenv("SEG_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("SEG_PALLAS_TRAIN", variant)
    c, o = 32, 32  # packed widths 4C = 4O = 128
    x4 = jnp.asarray(np_rng.normal(size=(2, 5, 7, 4 * c)), jnp.float32)
    wm = jnp.asarray(np_rng.normal(size=(c, 4 * o)) * 0.05, jnp.float32)
    b4 = jnp.asarray(np_rng.normal(size=(4 * o,)), jnp.float32)

    def ref(x4, wm, b4):
        return jax.nn.relu(tr._deconv_lin(x4, wm) + b4)

    got, want = _loss_pair(tr.deconv_packed_t, ref, (x4, wm, b4), np_rng)
    _check(got, want)


def test_unet_s2d_train_grads_match_xla(monkeypatch, np_rng):
    """End-to-end: UNetS2D's train forward+backward with the trainable-
    Pallas dispatch engaged matches the pure-XLA step (SEG_PALLAS_TRAIN=0)
    on value and every parameter gradient."""
    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet_fast import UNetS2D
    from segmentation_tpu.nn import module as hk

    mcfg = ModelConfig(name="unet", n_classes=2, input_dims=(92, 92),
                       n_kernels=32)
    model = UNetS2D(mcfg, levels=2)
    fwd = hk.transform(lambda x: model(x))
    x = jnp.asarray(np_rng.normal(0.5, 0.2, (2, 92, 92, 3)), jnp.float32)
    params, state = fwd.init(jax.random.PRNGKey(0), x, train=True)
    cot_shape = (2, *model.output_hw((92, 92)), 2)
    cot = jnp.asarray(np_rng.normal(size=cot_shape), jnp.float32)

    def loss(p):
        y, _ = fwd.apply(p, state, jax.random.PRNGKey(1), x, train=True)
        return jnp.sum(y * cot)

    monkeypatch.setenv("SEG_PALLAS_TRAIN", "0")
    val_ref, g_ref = jax.value_and_grad(loss)(params)

    monkeypatch.delenv("SEG_PALLAS_TRAIN")
    monkeypatch.setenv("SEG_PALLAS_INTERPRET", "1")
    val_got, g_got = jax.value_and_grad(loss)(params)

    np.testing.assert_allclose(float(val_got), float(val_ref), rtol=1e-3)
    for name in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_got[name]), np.asarray(g_ref[name]),
            rtol=2e-3, atol=2e-3, err_msg=name,
        )
