"""Unit tests for the nn layer library (SURVEY §4(c) loss/kernel-math tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_tpu.nn import (
    batch_norm,
    bilinear_upsample_weights,
    center_crop_or_pad,
    conv2d,
    conv2d_transpose,
    conv_out,
    deconv_out,
    dense,
    dropout,
    fixed_conv2d_transpose,
    lrelu,
    max_pool,
    upsample_filt,
)
from segmentation_tpu.nn import module as hk
from segmentation_tpu.nn.shapes import unet_output_hw


def test_conv_out_shapes():
    # VALID 3x3 stride 1 loses 2 px (reference U-Net arithmetic)
    assert conv_out(512, 3, 1, "VALID") == 510
    assert conv_out(512, 3, 1, "SAME") == 512
    assert conv_out(512, 3, 2, "SAME") == 256
    assert conv_out(28, 5, 1, "VALID") == 24
    # pooling odd sizes: floor((125-2)/2)+1
    assert conv_out(125, 2, 2, "VALID") == 62


def test_deconv_out_shapes():
    # TF conv2d_transpose VALID: (n-1)*s + k
    assert deconv_out(25, 2, 2, "VALID") == 50
    assert deconv_out(7, 5, 2, "VALID") == 17
    assert deconv_out(7, 4, 2, "SAME") == 14


def test_conv2d_matches_shape_algebra(rng):
    f = hk.transform(
        lambda x: conv2d(x, 8, 3, 1, "VALID", name="c", activation=None)
    )
    x = jnp.ones((2, 16, 16, 3))
    params, state = f.init(rng, x)
    y, _ = f.apply(params, state, None, x)
    assert y.shape == (2, conv_out(16, 3, 1, "VALID"), 14, 8)


@pytest.mark.parametrize("k,s,pad", [(2, 2, "VALID"), (5, 2, "VALID"), (4, 2, "SAME")])
def test_conv2d_transpose_shape(rng, k, s, pad):
    f = hk.transform(
        lambda x: conv2d_transpose(x, 4, k, s, pad, name="d", activation=None)
    )
    x = jnp.ones((1, 7, 7, 3))
    params, state = f.init(rng, x)
    y, _ = f.apply(params, state, None, x)
    assert y.shape[1] == deconv_out(7, k, s, pad)


def test_deconv_vs_torch_reference(rng):
    """conv2d_transpose must match the TF/torch transposed-conv math."""
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(1).normal(size=(1, 5, 5, 3)).astype(np.float32)
    w = np.random.default_rng(2).normal(size=(4, 4, 3, 2)).astype(np.float32)

    f = hk.transform(
        lambda t: conv2d_transpose(
            t, 2, 4, 2, "VALID", name="d", activation=None, use_bias=False
        )
    )
    params, state = f.init(rng, jnp.asarray(x))
    params["d/w"] = jnp.asarray(w)
    y, _ = f.apply(params, state, None, jnp.asarray(x))

    # torch: input NCHW, weight [in, out, kh, kw]
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
    yt = F.conv_transpose2d(xt, wt, stride=2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


def test_bilinear_kernel_matches_scipy_zoom_property():
    # Kernel rows must sum to 1-per-contributing-pixel: upsampling a constant
    # image through the kernel reproduces the constant (interior pixels).
    w = bilinear_upsample_weights(2, 3)
    assert w.shape == (4, 4, 3, 3)
    # Off-diagonal class planes are zero (diagonal over classes)
    assert np.all(w[:, :, 0, 1] == 0)
    # The 2x filter: triangle [0.25, 0.75, 0.75, 0.25]
    expected = np.outer([0.25, 0.75, 0.75, 0.25], [0.25, 0.75, 0.75, 0.25])
    np.testing.assert_allclose(w[:, :, 1, 1], expected)


def test_upsample_filt_odd():
    f = upsample_filt(3)
    np.testing.assert_allclose(f[1, 1], 1.0)
    np.testing.assert_allclose(f[0, 1], 0.5)


def test_fixed_bilinear_upsample_constant_preserved():
    w = jnp.asarray(bilinear_upsample_weights(4, 2))
    x = jnp.ones((1, 8, 8, 2))
    y = fixed_conv2d_transpose(x, w, 4, "SAME")
    assert y.shape == (1, 32, 32, 2)
    # interior pixels should be ~1.0
    np.testing.assert_allclose(np.asarray(y)[0, 8:-8, 8:-8, :], 1.0, atol=1e-5)


def test_center_crop_or_pad_matches_tf_semantics():
    x = jnp.arange(5 * 5, dtype=jnp.float32).reshape(1, 5, 5, 1)
    y = center_crop_or_pad(x, 3, 3)
    np.testing.assert_allclose(
        np.asarray(y)[0, :, :, 0],
        np.asarray(x)[0, 1:4, 1:4, 0],
    )
    z = center_crop_or_pad(x, 7, 7)
    assert z.shape == (1, 7, 7, 1)
    np.testing.assert_allclose(np.asarray(z)[0, 1:6, 1:6, 0], np.asarray(x)[0, :, :, 0])
    assert np.asarray(z)[0, 0, :, 0].sum() == 0
    # odd difference: extra pixel on bottom/right (TF convention)
    y2 = center_crop_or_pad(x, 4, 4)
    np.testing.assert_allclose(
        np.asarray(y2)[0, :, :, 0], np.asarray(x)[0, 0:4, 0:4, 0]
    )


def test_batch_norm_train_eval(rng):
    f = hk.transform(lambda x: batch_norm(x, name="bn", decay=0.5))
    x = jax.random.normal(jax.random.key(3), (8, 4, 4, 2)) * 3 + 1
    params, state = f.init(rng, x, train=True)
    y, new_state = f.apply(params, state, None, x, train=True)
    # normalized output: ~zero mean, unit var
    assert abs(float(jnp.mean(y))) < 1e-4
    assert abs(float(jnp.var(y)) - 1.0) < 1e-2
    # moving stats moved toward batch stats
    assert float(jnp.abs(new_state["bn/moving_mean"]).sum()) > 0
    # eval mode uses moving stats, state unchanged
    y2, state2 = f.apply(params, new_state, None, x, train=False)
    np.testing.assert_allclose(
        np.asarray(state2["bn/moving_mean"]),
        np.asarray(new_state["bn/moving_mean"]),
    )


def test_dropout_modes(rng):
    f = hk.transform(lambda x: dropout(x, 0.5))
    x = jnp.ones((4, 128))
    params, state = f.init(rng, x)
    # eval: identity
    y, _ = f.apply(params, state, jax.random.key(1), x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    # train: ~half dropped, scaled by 1/keep
    y, _ = f.apply(params, state, jax.random.key(1), x, train=True)
    frac = float((np.asarray(y) == 0).mean())
    assert 0.3 < frac < 0.7
    assert np.isclose(np.asarray(y).max(), 2.0)


def test_mc_dropout_stays_live():
    f = hk.transform(lambda x: dropout(x, 0.5, deterministic=False))
    x = jnp.ones((4, 128))
    params, state = f.init(jax.random.key(0), x)
    y1, _ = f.apply(params, state, jax.random.key(1), x, train=False)
    y2, _ = f.apply(params, state, jax.random.key(2), x, train=False)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_lrelu():
    x = jnp.array([-1.0, 2.0])
    np.testing.assert_allclose(np.asarray(lrelu(x)), [-0.2, 2.0])


def test_max_pool():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = max_pool(x, 2)
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0], [[5, 7], [13, 15]])


def test_dense_shapes(rng):
    f = hk.transform(lambda x: dense(x, 32, name="fc", activation=None))
    x = jnp.ones((2, 7))
    params, state = f.init(rng, x)
    y, _ = f.apply(params, state, None, x)
    assert y.shape == (2, 32)


def test_unet_output_hw():
    # 572 -> 388 is the canonical Ronneberger figure-1 arithmetic
    assert unet_output_hw((572, 572)) == (388, 388)
