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


# ----------------------------------------------------------- int8 kernels
def _q8w(np_rng, shape):
    w = np_rng.normal(size=shape).astype(np.float32) * 0.05
    s = np.abs(w).max(axis=tuple(range(w.ndim - 1))) / 127.0
    s = np.maximum(s, 1e-8)
    wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return jnp.asarray(wq), jnp.asarray(s.astype(np.float32))


def test_conv2x2_int8_parity(np_rng):
    """Pallas int8 conv2x2 == the XLA int8 reference (unet_int8)."""
    from segmentation_tpu.models.unet_int8 import int8_packed_conv
    from segmentation_tpu.models.unet_fast import tile_bias4

    c, o = 128, 128
    x = jnp.asarray(np_rng.normal(size=(2, 9, 13, c)), jnp.float32)
    wq, ws = _q8w(np_rng, (2, 2, c, o))
    b = jnp.asarray(np_rng.normal(size=(o // 4,)), jnp.float32)
    act_scale = float(jnp.max(jnp.abs(x))) / 127.0
    got = conv2x2_flat(
        x, wq, tile_bias4(b), r_block=4,
        quant={"chan_scale": ws * act_scale, "act_scale": act_scale},
        interpret=True,
    )
    want = int8_packed_conv(x, wq, ws, jnp.float32(act_scale), b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_conv2x2_int8_resident_roundtrip(np_rng):
    """int8-in/int8-out: feeding the requantized output of one kernel to
    the next (act_scale=None input path) matches the dequant-requant
    composition."""
    from segmentation_tpu.models.unet_fast import tile_bias4

    c = o = 128
    x = jnp.asarray(np_rng.normal(size=(2, 9, 11, c)), jnp.float32)
    wq, ws = _q8w(np_rng, (2, 2, c, o))
    b = jnp.asarray(np_rng.normal(size=(o // 4,)), jnp.float32)
    a_s = float(jnp.max(jnp.abs(x))) / 127.0
    out_s = 0.05
    # bf16-in -> int8-out
    y8 = conv2x2_flat(
        x, wq, tile_bias4(b), r_block=4,
        quant={"chan_scale": ws * a_s, "act_scale": a_s,
               "out_scale": out_s},
        interpret=True,
    )
    assert y8.dtype == jnp.int8
    # reference: float result, then requantize
    yf = conv2x2_flat(
        x, wq, tile_bias4(b), r_block=4,
        quant={"chan_scale": ws * a_s, "act_scale": a_s},
        interpret=True,
    )
    want = np.clip(np.round(np.asarray(yf) / out_s), -127, 127)
    np.testing.assert_allclose(np.asarray(y8), want, atol=1.0)

    # int8-resident input: consume y8 directly (act_scale None);
    # chan_scale folds the incoming tensor scale
    wq2, ws2 = _q8w(np_rng, (2, 2, c, o))
    z = conv2x2_flat(
        y8, wq2, tile_bias4(b), r_block=4,
        quant={"chan_scale": ws2 * out_s},
        interpret=True,
    )
    zf = conv2x2_flat(
        jnp.asarray(y8, jnp.float32) * out_s, wq2, tile_bias4(b),
        r_block=4,
        quant={"chan_scale": ws2 * out_s, "act_scale": out_s},
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(zf),
                               rtol=2e-2, atol=2e-2)


def test_conv2x2_pool_int8(np_rng):
    from segmentation_tpu.models.unet_fast import (
        packed_pool_flat, tile_bias4,
    )
    from segmentation_tpu.nn.pallas.conv import conv2x2_pool_flat

    c, o = 128, 128
    x = jnp.asarray(np_rng.normal(size=(2, 13, 21, c)), jnp.float32)
    wq, ws = _q8w(np_rng, (2, 2, c, o))
    b = jnp.asarray(np_rng.normal(size=(o // 4,)), jnp.float32)
    a_s = float(jnp.max(jnp.abs(x))) / 127.0
    q = {"chan_scale": ws * a_s, "act_scale": a_s, "out_scale": 0.04}
    y, pooled = conv2x2_pool_flat(x, wq, tile_bias4(b), r_block=4,
                                  quant=q, interpret=True)
    assert y.dtype == jnp.int8 and pooled.dtype == jnp.int8
    want_p = packed_pool_flat(np.asarray(y, np.int32), o // 4)
    np.testing.assert_allclose(np.asarray(pooled, np.int32), want_p,
                               atol=0)


def test_conv4x4s2_int8_parity(np_rng):
    from segmentation_tpu.models.unet_int8 import int8_strided_conv
    from segmentation_tpu.models.unet_fast import tile_bias4

    c, o4 = 32, 256
    x = jnp.asarray(np_rng.normal(size=(2, 18, 26, c)), jnp.float32)
    wq, ws = _q8w(np_rng, (4, 4, c, o4))
    b = jnp.asarray(np_rng.normal(size=(o4 // 4,)), jnp.float32)
    a_s = float(jnp.max(jnp.abs(x))) / 127.0
    got = conv4x4s2_flat(
        x, wq, tile_bias4(b), r_block=3,
        quant={"chan_scale": ws * a_s, "act_scale": a_s},
        interpret=True,
    )
    want = int8_strided_conv(x, wq, ws, jnp.float32(a_s), b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_dual_int8_parity(np_rng):
    from segmentation_tpu.models.unet_int8 import int8_packed_conv_dual
    from segmentation_tpu.models.unet_fast import tile_bias4

    c = o = 128
    xa = jnp.asarray(np_rng.normal(size=(2, 9, 11, c)), jnp.float32)
    xb = jnp.asarray(np_rng.normal(size=(2, 9, 11, c)), jnp.float32)
    wqa, wsa = _q8w(np_rng, (2, 2, c, o))
    wqb, wsb = _q8w(np_rng, (2, 2, c, o))
    b = jnp.asarray(np_rng.normal(size=(o // 4,)), jnp.float32)
    asa = float(jnp.max(jnp.abs(xa))) / 127.0
    asb = float(jnp.max(jnp.abs(xb))) / 127.0
    got = conv2x2_dual_flat(
        xa, xb, wqa, wqb, tile_bias4(b), r_block=4,
        quant={"chan_scale_a": wsa * asa, "chan_scale_b": wsb * asb,
               "act_scale_a": asa, "act_scale_b": asb},
        interpret=True,
    )
    want = int8_packed_conv_dual(
        xa, xb, wqa, wsa, jnp.float32(asa), wqb, wsb, jnp.float32(asb), b
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_conv2x2_head_parity(np_rng):
    """Fused binary-segmentation head: mask == argmax of the 1×1 head on
    the conv output (n_classes=2 sign-of-difference formulation)."""
    c = o = 128
    x = jnp.asarray(np_rng.normal(size=(2, 11, 13, c)), jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    # block-diagonal per-slot difference head (4 slots of o//4 channels)
    cg = o // 4
    wdv = np_rng.normal(size=(cg,)).astype(np.float32)
    wd = np.zeros((o, 4), np.float32)
    for s in range(4):
        wd[s * cg : (s + 1) * cg, s] = wdv
    bd = np.full((4,), 0.3, np.float32)
    y, mask = conv2x2_flat(
        x, w, b, relu=True, r_block=4,
        head=(jnp.asarray(wd), jnp.asarray(bd)), interpret=True,
    )
    want_y = _oracle_conv(x, w, b, (1, 1), True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=1e-4, atol=1e-4)
    # bf16 head dot in-kernel vs f32 oracle: compare away from ties
    hd = np.einsum("nhwc,cs->nhws", np.asarray(want_y), wd) + bd
    clear = np.abs(hd) > 1e-2
    want_m = (hd > 0).astype(np.uint8)
    np.testing.assert_array_equal(
        np.asarray(mask)[clear], want_m[clear]
    )
    assert mask.dtype == jnp.uint8
