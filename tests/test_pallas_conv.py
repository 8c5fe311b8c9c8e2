"""Parity for the Pallas conv kernels (nn/pallas/conv.py) against
lax.conv_general_dilated oracles, float32, interpret mode on CPU.

Shapes mirror the real U-Net sites (scaled down spatially, same channel
structure incl. odd H/W and ragged row blocks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from segmentation_tpu.nn.pallas.conv import (
    conv2x2_dual_flat,
    conv2x2_flat,
    conv4x4s2_flat,
)

_DN = ("NHWC", "HWIO", "NHWC")


def _oracle_conv(x, w, b, strides, relu):
    y = lax.conv_general_dilated(x, w, strides, "VALID",
                                 dimension_numbers=_DN)
    y = y + b
    return jax.nn.relu(y) if relu else y


@pytest.mark.parametrize("h,w_in,c,o", [
    (21, 23, 128, 128),   # c1_2-like (odd spatial, ragged last block)
    (16, 16, 128, 256),
    (9, 33, 256, 256),    # c2_2 / c8_2-like
])
@pytest.mark.parametrize("relu", [True, False])
def test_conv2x2_parity(np_rng, h, w_in, c, o, relu):
    x = jnp.asarray(np_rng.normal(size=(2, h, w_in, c)), jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    got = conv2x2_flat(x, w, b, relu=relu, r_block=4, interpret=True)
    want = _oracle_conv(x, w, b, (1, 1), relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv2x2_dual_parity(np_rng):
    c = o = 128
    xa = jnp.asarray(np_rng.normal(size=(2, 11, 13, c)), jnp.float32)
    xb = jnp.asarray(np_rng.normal(size=(2, 11, 13, c)), jnp.float32)
    wa = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    wb = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    got = conv2x2_dual_flat(xa, xb, wa, wb, b, r_block=4, interpret=True)
    # oracle: conv(concat(xa, xb)) with stacked kernel == conv(a)+conv(b)
    x = jnp.concatenate([xa, xb], axis=-1)
    w = jnp.concatenate([wa, wb], axis=2)
    want = _oracle_conv(x, w, b, (1, 1), True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("h,w_in,c,o4", [
    (20, 20, 64, 128),    # 2C=128 exact
    (18, 26, 32, 256),    # c2_1-like: 2C=64 (half-K path)
    (13, 24, 64, 256),    # odd H
])
def test_conv4x4s2_parity(np_rng, h, w_in, c, o4):
    x = jnp.asarray(np_rng.normal(size=(2, h, w_in, c)), jnp.float32)
    w4 = jnp.asarray(np_rng.normal(size=(4, 4, c, o4)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o4,)), jnp.float32)
    got = conv4x4s2_flat(x, w4, b, r_block=3, interpret=True)
    want = _oracle_conv(x, w4, b, (2, 2), True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv2x2_rejects_thin_channels(np_rng):
    x = jnp.zeros((1, 5, 5, 64), jnp.float32)
    w = jnp.zeros((2, 2, 64, 128), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    with pytest.raises(AssertionError):
        conv2x2_flat(x, w, b, interpret=True)


def test_conv2x2_pool_parity(np_rng):
    """Fused conv+slot-max pool == conv followed by packed_pool_flat."""
    from segmentation_tpu.models.unet_fast import packed_pool_flat
    from segmentation_tpu.nn.pallas.conv import conv2x2_pool_flat

    c, o = 128, 128
    x = jnp.asarray(np_rng.normal(size=(2, 13, 21, c)), jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    y, pooled = conv2x2_pool_flat(x, w, b, r_block=4, interpret=True)
    want_y = _oracle_conv(x, w, b, (1, 1), True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=1e-4, atol=1e-4)
    want_p = packed_pool_flat(want_y, o // 4)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want_p),
                               rtol=1e-4, atol=1e-4)


def test_conv2x2_dual_with_crop_offset(np_rng):
    """a_offset folds the skip center-crop into the dual kernel."""
    c = o = 128
    xa_full = jnp.asarray(np_rng.normal(size=(2, 17, 19, c)), jnp.float32)
    xb = jnp.asarray(np_rng.normal(size=(2, 11, 13, c)), jnp.float32)
    wa = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    wb = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    ro, co = 3, 2
    got = conv2x2_dual_flat(xa_full, xb, wa, wb, b, r_block=4,
                            a_offset=(ro, co), interpret=True)
    xa = xa_full[:, ro : ro + 11, co : co + 13]
    x = jnp.concatenate([xa, xb], axis=-1)
    w = jnp.concatenate([wa, wb], axis=2)
    want = _oracle_conv(x, w, b, (1, 1), True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_matmul_rows_parity(np_rng):
    from segmentation_tpu.nn.pallas.conv import matmul_rows_flat

    x = jnp.asarray(np_rng.normal(size=(2, 9, 11, 128)), jnp.float32)
    wm = jnp.asarray(np_rng.normal(size=(128, 256)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(256,)), jnp.float32)
    got = matmul_rows_flat(x, wm, b, r_block=4, interpret=True)
    want = jax.nn.relu(jnp.einsum("nijc,ck->nijk", x, wm) + b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_deconv_packed_parity(np_rng):
    """Pallas packed-in deconv == deconv2_packed_in_flat oracle."""
    from segmentation_tpu.models.unet_fast import (
        deconv2_packed_in_flat, tile_bias4,
    )
    from segmentation_tpu.nn.pallas.conv import deconv_packed_flat

    c, o = 32, 32  # 4C=128, 4O=128
    x4 = jnp.asarray(np_rng.normal(size=(2, 7, 9, 4 * c)), jnp.float32)
    wm = jnp.asarray(np_rng.normal(size=(c, 4 * o)) * 0.1, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    got = deconv_packed_flat(x4, wm, tile_bias4(b), r_block=4,
                             interpret=True)
    want = deconv2_packed_in_flat(x4, wm, b, o)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv2x2_pool_pairs_parity(np_rng):
    """pool_pairs=True emits the column-paired pool layout."""
    from segmentation_tpu.models.unet_fast import packed_pool_flat
    from segmentation_tpu.nn.pallas.conv import conv2x2_pool_flat

    c, o = 128, 128
    x = jnp.asarray(np_rng.normal(size=(2, 12, 23, c)), jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    y, paired = conv2x2_pool_flat(x, w, b, r_block=4, pool_pairs=True,
                                  interpret=True)
    want_y = _oracle_conv(x, w, b, (1, 1), True)
    want_p = np.asarray(packed_pool_flat(want_y, o // 4))
    n, hp, wp, cc = want_p.shape
    want_paired = want_p.reshape(n, hp, wp // 2, 2 * cc)
    assert paired.shape == want_paired.shape
    np.testing.assert_allclose(np.asarray(paired), want_paired,
                               rtol=1e-4, atol=1e-4)


def test_conv2x2_dual_slot_phase_crop(np_rng):
    """a_slot_phase folds the ODD-offset (slot-phase) center-crop."""
    from segmentation_tpu.models.unet_fast import packed_center_crop_flat

    c = o = 128
    cg = c // 4
    xa_full = jnp.asarray(np_rng.normal(size=(2, 19, 21, c)), jnp.float32)
    xb = jnp.asarray(np_rng.normal(size=(2, 11, 13, c)), jnp.float32)
    wa = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    wb = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    off = (5, 3)  # odd unpacked offsets
    got = conv2x2_dual_flat(xa_full, xb, wa, wb, b, r_block=4,
                            a_slot_phase=off, interpret=True)
    sk = packed_center_crop_flat(xa_full, cg, (22, 26), off)
    x = jnp.concatenate([sk, xb], axis=-1)
    w = jnp.concatenate([wa, wb], axis=2)
    want = _oracle_conv(x, w, b, (1, 1), True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
