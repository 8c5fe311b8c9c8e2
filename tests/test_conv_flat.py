"""Parity for the padded-flat Pallas kernels (nn/pallas/conv_flat.py)
against lax.conv oracles and the conv.py kernels — float + int8 modes,
interpret mode on CPU. Junk rows/columns are verified to never leak into
the real output window."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from segmentation_tpu.nn.pallas.conv_flat import (
    conv2x2_dual_padflat,
    conv2x2_padflat,
    conv4x4s2_padflat,
    matmul_rows_padflat,
    pad_rows,
    stride_for,
    unpad_rows,
)

_DN = ("NHWC", "HWIO", "NHWC")


def _oracle_conv(x, w, b, strides, relu):
    y = lax.conv_general_dilated(x, w, strides, "VALID",
                                 dimension_numbers=_DN)
    y = y + b
    return jax.nn.relu(y) if relu else y


def _flat_in(np_rng, shape, dtype=jnp.float32, s=None):
    x = jnp.asarray(np_rng.normal(size=shape), jnp.float32)
    if dtype == jnp.int8:
        x = jnp.clip(jnp.round(x * 40), -127, 127).astype(jnp.int8)
    else:
        x = x.astype(dtype)
    s = s or stride_for(shape[2], dtype)
    return x, pad_rows(x, s), s


@pytest.mark.parametrize("h,w_in,c,o", [
    (21, 23, 128, 128),   # odd spatial, ragged last block (nb*R > h)
    (16, 16, 128, 256),
    (9, 33, 256, 256),
])
@pytest.mark.parametrize("relu", [True, False])
def test_conv2x2_padflat_parity(np_rng, h, w_in, c, o, relu):
    x, xf, s = _flat_in(np_rng, (2, h, w_in, c))
    w = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    got = conv2x2_padflat(xf, w, b, h=h, w_real=w_in, s=s, relu=relu,
                          r_block=4, interpret=True)
    got = unpad_rows(got, s, h - 1, w_in - 1)
    want = _oracle_conv(x, w, b, (1, 1), relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv2x2_padflat_int8_resident(np_rng):
    h, w_in, c, o = 13, 17, 128, 128
    x, xf, s = _flat_in(np_rng, (2, h, w_in, c), jnp.int8)
    wq = jnp.clip(
        jnp.round(jnp.asarray(np_rng.normal(size=(2, 2, c, o)),
                              jnp.float32) * 30),
        -127, 127,
    ).astype(jnp.int8)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    cs = jnp.full((o,), 0.01, jnp.float32)
    q = {"chan_scale": cs, "out_scale": 0.07}
    got = conv2x2_padflat(xf, wq, b, h=h, w_real=w_in, s=s, r_block=4,
                          quant=q, interpret=True)
    got = unpad_rows(got, s, h - 1, w_in - 1)
    yf = _oracle_conv(
        x.astype(jnp.float32), wq.astype(jnp.float32), jnp.zeros_like(b),
        (1, 1), False,
    )
    want = jax.nn.relu(yf * cs + b)
    wq8 = jnp.clip(jnp.round(want / 0.07), -127, 127).astype(jnp.int8)
    assert got.dtype == jnp.int8
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(wq8, np.float32), atol=1,
    )


def test_conv2x2_padflat_int8_inline(np_rng):
    h, w_in, c, o = 11, 12, 128, 128
    x, xf, s = _flat_in(np_rng, (2, h, w_in, c), jnp.bfloat16)
    wq = jnp.clip(
        jnp.round(jnp.asarray(np_rng.normal(size=(2, 2, c, o)),
                              jnp.float32) * 30),
        -127, 127,
    ).astype(jnp.int8)
    b = jnp.zeros((o,), jnp.float32)
    cs = jnp.full((o,), 0.02, jnp.float32)
    q = {"chan_scale": cs, "act_scale": 0.05}
    got = conv2x2_padflat(xf, wq, b, h=h, w_real=w_in, s=s, r_block=4,
                          quant=q, interpret=True)
    got = unpad_rows(got, s, h - 1, w_in - 1)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.05), -127,
                  127).astype(jnp.float32)
    yf = _oracle_conv(xq, wq.astype(jnp.float32), jnp.zeros_like(b),
                      (1, 1), False)
    want = jax.nn.relu(yf * cs)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.5,
    )


def test_conv2x2_padflat_pool_and_head(np_rng):
    h, w_in, c, o = 13, 15, 128, 128
    x, xf, s = _flat_in(np_rng, (2, h, w_in, c))
    w = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    wd = jnp.asarray(np_rng.normal(size=(o, 4)), jnp.float32)
    bd = jnp.asarray(np_rng.normal(size=(4,)), jnp.float32)
    y, mask, pooled = conv2x2_padflat(
        xf, w, b, h=h, w_real=w_in, s=s, r_block=4, head=(wd, bd),
        pool=True, interpret=True,
    )
    y = unpad_rows(y, s, h - 1, w_in - 1)
    mask = unpad_rows(mask, s, h - 1, w_in - 1)
    pooled = unpad_rows(pooled, s, h - 1, w_in - 1)
    want = _oracle_conv(x, w, b, (1, 1), True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    want_mask = (
        jnp.einsum("nhwc,cs->nhws", want, wd) + bd > 0
    ).astype(jnp.uint8)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(want_mask))
    yv = want.reshape(*want.shape[:3], 4, o // 4)
    want_pool = jnp.max(yv, axis=3)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want_pool),
                               rtol=1e-4, atol=1e-4)
    # head_only drops the conv output
    mask2 = conv2x2_padflat(
        xf, w, b, h=h, w_real=w_in, s=s, r_block=4, head=(wd, bd),
        head_only=True, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(unpad_rows(mask2, s, h - 1, w_in - 1)),
        np.asarray(want_mask),
    )


@pytest.mark.parametrize("off,slot_phase", [
    ((0, 0), None),
    ((2, 1), None),
    (None, (3, 5)),
])
def test_conv2x2_dual_padflat_parity(np_rng, off, slot_phase):
    c = o = 128
    hb, wb_ = 11, 13
    if slot_phase is not None:
        ha, wa_ = hb + 4, wb_ + 4
    elif off == (0, 0):
        ha, wa_ = hb, wb_
    else:
        ha, wa_ = hb + 3, wb_ + 2
    xa, xaf, sa = _flat_in(np_rng, (2, ha, wa_, c))
    xb, xbf, sb = _flat_in(np_rng, (2, hb, wb_, c))
    wa = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    wb = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    if slot_phase is not None:
        from segmentation_tpu.models.unet_fast import (
            packed_center_crop_flat,
        )

        xa_c = packed_center_crop_flat(
            xa, c // 4, (2 * hb, 2 * wb_), slot_phase
        )
        kw = dict(a_offset=(0, 0), a_slot_phase=slot_phase)
    else:
        xa_c = xa[:, off[0] : off[0] + hb, off[1] : off[1] + wb_, :]
        kw = dict(a_offset=off)
    got = conv2x2_dual_padflat(
        xaf, xbf, wa, wb, b, h=hb, w_real=wb_, s=sb, s_a=sa,
        hp_a=xaf.shape[1] // sa, r_block=4, interpret=True, **kw,
    )
    got = unpad_rows(got, sb, hb - 1, wb_ - 1)
    x = jnp.concatenate([xa_c, xb], axis=-1)
    w = jnp.concatenate([wa, wb], axis=2)
    want = _oracle_conv(x, w, b, (1, 1), True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv2x2_dual_padflat_int8(np_rng):
    c = o = 128
    hb, wb_ = 9, 11
    ha, wa_ = hb + 3, wb_ + 2
    off = (1, 2)
    xa, xaf, sa = _flat_in(np_rng, (2, ha, wa_, c), jnp.int8)
    xb, xbf, sb = _flat_in(np_rng, (2, hb, wb_, c), jnp.bfloat16)
    mkq = lambda k: jnp.clip(
        jnp.round(jnp.asarray(np_rng.normal(size=(2, 2, c, o)),
                              jnp.float32) * 30),
        -127, 127,
    ).astype(jnp.int8)
    wqa, wqb = mkq(0), mkq(1)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    csa = jnp.full((o,), 0.01, jnp.float32)
    csb = jnp.full((o,), 0.02, jnp.float32)
    q = {"chan_scale_a": csa, "chan_scale_b": csb, "act_scale_b": 0.05,
         "out_scale": 0.1}
    got = conv2x2_dual_padflat(
        xaf, xbf, wqa, wqb, b, h=hb, w_real=wb_, s=sb, s_a=sa,
        hp_a=xaf.shape[1] // sa, r_block=4, a_offset=off, quant=q,
        interpret=True,
    )
    got = unpad_rows(got, sb, hb - 1, wb_ - 1)
    xa_c = xa[:, off[0] : off[0] + hb, off[1] : off[1] + wb_, :]
    xbq = jnp.clip(jnp.round(xb.astype(jnp.float32) / 0.05), -127, 127)
    ya = _oracle_conv(xa_c.astype(jnp.float32), wqa.astype(jnp.float32),
                      jnp.zeros_like(b), (1, 1), False)
    yb = _oracle_conv(xbq, wqb.astype(jnp.float32), jnp.zeros_like(b),
                      (1, 1), False)
    want = jax.nn.relu(ya * csa + yb * csb + b)
    wq8 = jnp.clip(jnp.round(want / 0.1), -127, 127)
    assert got.dtype == jnp.int8
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(wq8, np.float32), atol=1.5,
    )


@pytest.mark.parametrize("h,w_in,c,o4", [
    (20, 20, 64, 128),
    (18, 26, 32, 256),    # c2_1-like: 2C=64
    (13, 24, 64, 256),    # odd H (ragged)
])
def test_conv4x4s2_padflat_parity(np_rng, h, w_in, c, o4):
    x = jnp.asarray(np_rng.normal(size=(2, h, w_in, c)), jnp.float32)
    w4 = jnp.asarray(np_rng.normal(size=(4, 4, c, o4)) * 0.05,
                     jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o4,)), jnp.float32)
    # paired flat input
    xp = x.reshape(x.shape[0], h, w_in // 2, 2 * c)
    s2 = stride_for(w_in // 2, jnp.float32)
    xpf = pad_rows(xp, s2)
    got = conv4x4s2_padflat(xpf, w4, b, h=h, w2_real=w_in // 2, s2=s2,
                            r_block=3, interpret=True)
    got = unpad_rows(got, s2, (h - 2) // 2, (w_in - 2) // 2)
    want = _oracle_conv(x, w4, b, (2, 2), True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_matmul_rows_padflat_parity(np_rng):
    h, w_in, c, k = 9, 13, 128, 256
    x, xf, s = _flat_in(np_rng, (2, h, w_in, c))
    wm = jnp.asarray(np_rng.normal(size=(c, k)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(k,)), jnp.float32)
    got = matmul_rows_padflat(xf, wm, b, interpret=True)
    got = unpad_rows(got, s, h, w_in)
    want = jax.nn.relu(jnp.einsum("nhwc,ck->nhwk", x, wm) + b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("quantized", [False, True])
def test_deconv_packed_padflat_parity(np_rng, quantized):
    from segmentation_tpu.models.unet_fast import deconv2_packed_in_flat
    from segmentation_tpu.nn.pallas.conv_flat import deconv_packed_padflat

    i_in, j_in, c, o = 9, 11, 64, 32
    x = jnp.asarray(np_rng.normal(size=(2, i_in, j_in, 4 * c)),
                    jnp.float32)
    wm = jnp.asarray(np_rng.normal(size=(c, 4 * o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    want = deconv2_packed_in_flat(x, wm, b, o, pallas=False)
    s_i = stride_for(j_in, jnp.int8 if quantized else jnp.float32)
    if quantized:
        xq = jnp.clip(jnp.round(x * 8), -127, 127).astype(jnp.int8)
        x = xq.astype(jnp.float32) / 8.0
        wq = jnp.clip(jnp.round(wm / 0.05), -127, 127).astype(jnp.int8)
        want = deconv2_packed_in_flat(
            x, wq.astype(jnp.float32) * 0.05, b, o, pallas=False
        )
        xf = pad_rows(xq, s_i)
        q = {"chan_scale": jnp.full((4 * o,), 0.05 / 8.0, jnp.float32)}
        got = deconv_packed_padflat(
            xf, wq, jnp.tile(b, 4), i_in=i_in, j_in=j_in, s_i=s_i,
            r_block=4, quant=q, interpret=True,
        )
    else:
        xf = pad_rows(x, s_i)
        got = deconv_packed_padflat(
            xf, wm, jnp.tile(b, 4), i_in=i_in, j_in=j_in, s_i=s_i,
            r_block=4, interpret=True,
        )
    from segmentation_tpu.nn.pallas.conv_flat import stride_for as _sf

    s_o = _sf(2 * j_in, got.dtype)
    got = unpad_rows(got, s_o, 2 * i_in, 2 * j_in)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=1e-3, atol=0.05,
    )


# ------------------------------------------------------------- pf2 layout
def _pf2_in(np_rng, shape, dtype=jnp.float32):
    from segmentation_tpu.nn.pallas.conv_flat import pad_pairs

    x = jnp.asarray(np_rng.normal(size=shape), jnp.float32)
    if dtype == jnp.int8:
        x = jnp.clip(jnp.round(x * 40), -127, 127).astype(jnp.int8)
    else:
        x = x.astype(dtype)
    s2 = stride_for((shape[2] + 1) // 2, dtype)
    return x, pad_pairs(x, s2), s2


@pytest.mark.parametrize("h,w_in,c,o", [
    (21, 23, 128, 128),
    (16, 16, 128, 256),
])
@pytest.mark.parametrize("relu", [True, False])
def test_conv2x2_pf2_parity(np_rng, h, w_in, c, o, relu):
    from segmentation_tpu.nn.pallas.conv_flat import (
        conv2x2_pf2, unpad_pairs,
    )

    x, xf, s2 = _pf2_in(np_rng, (2, h, w_in, c))
    w = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    got = conv2x2_pf2(xf, w, b, h=h, w_real=w_in, s2=s2, relu=relu,
                      r_block=4, interpret=True)
    got = unpad_pairs(got, s2, h - 1, w_in - 1)
    want = _oracle_conv(x, w, b, (1, 1), relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv2x2_pf2_pool_int8(np_rng):
    """int8-resident pf2 conv+pool: the pooled output IS the paired
    handoff (lane halves = even/odd column pools)."""
    from segmentation_tpu.nn.pallas.conv_flat import (
        conv2x2_pf2, unpad_pairs,
    )

    h, w_in, c, o = 15, 19, 128, 128
    x, xf, s2 = _pf2_in(np_rng, (2, h, w_in, c), jnp.int8)
    wq = jnp.clip(
        jnp.round(jnp.asarray(np_rng.normal(size=(2, 2, c, o)), jnp.float32)
                  * 20), -127, 127,
    ).astype(jnp.int8)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    q = {"chan_scale": jnp.full((o,), 0.02 * 0.025, jnp.float32),
         "out_scale": 0.05}
    y8, p8 = conv2x2_pf2(xf, wq, b, h=h, w_real=w_in, s2=s2,
                         r_block=4, pool=True, quant=q, interpret=True)
    xi = x.astype(jnp.float32) * 0.025
    wf = wq.astype(jnp.float32) * 0.02
    want = _oracle_conv(xi, wf, b, (1, 1), True)
    want8 = jnp.clip(jnp.round(want / 0.05), -127, 127)
    got = unpad_pairs(y8, s2, h - 1, w_in - 1).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want8),
                               atol=1.01)
    # pool = slot-max over the 4 lane groups, then requant
    wantp = jnp.max(
        want.reshape(*want.shape[:-1], 4, o // 4), axis=-2
    )
    wantp8 = jnp.clip(jnp.round(wantp / 0.05), -127, 127)
    gotp = unpad_pairs(p8, s2, h - 1, w_in - 1).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(gotp), np.asarray(wantp8),
                               atol=1.01)


def test_conv2x2_pf2_head_only(np_rng):
    from segmentation_tpu.nn.pallas.conv_flat import (
        conv2x2_pf2, unpad_pairs,
    )

    h, w_in, c = 13, 17, 128
    x, xf, s2 = _pf2_in(np_rng, (1, h, w_in, c))
    w = jnp.asarray(np_rng.normal(size=(2, 2, c, c)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(c,)), jnp.float32)
    wd = jnp.asarray(np_rng.normal(size=(c, 4)), jnp.float32)
    bd = jnp.asarray(np_rng.normal(size=(4,)), jnp.float32)
    mask = conv2x2_pf2(xf, w, b, h=h, w_real=w_in, s2=s2, r_block=4,
                       head=(wd, bd), head_only=True, interpret=True)
    y = _oracle_conv(x, w, b, (1, 1), True)
    want = (jnp.einsum(
        "nhwc,cs->nhws", y.astype(jnp.bfloat16).astype(jnp.float32),
        wd.astype(jnp.bfloat16).astype(jnp.float32)) + bd > 0
    ).astype(jnp.uint8)
    got = unpad_pairs(mask, s2, h - 1, w_in - 1)
    assert (np.asarray(got) == np.asarray(want)).mean() > 0.995


@pytest.mark.parametrize("col_off", [4, 7])
def test_conv2x2_dual_pf2_parity(np_rng, col_off):
    """Dual pf2 conv with the pair-space crop fold (even + odd column
    offsets = lane-phase)."""
    from segmentation_tpu.nn.pallas.conv_flat import (
        conv2x2_dual_pf2, pad_pairs, unpad_pairs,
    )

    hb, wb_, c, o = 11, 13, 128, 128
    ro = 3
    ha, wa_ = hb + 8, wb_ + 12
    xa = jnp.asarray(np_rng.normal(size=(2, ha, wa_, c)), jnp.float32)
    xb = jnp.asarray(np_rng.normal(size=(2, hb, wb_, c)), jnp.float32)
    wa = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    wb = jnp.asarray(np_rng.normal(size=(2, 2, c, o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    s2a = stride_for((wa_ + 2) // 2, jnp.float32)
    s2b = stride_for((wb_ + 1) // 2, jnp.float32)
    got = conv2x2_dual_pf2(
        pad_pairs(xa, s2a), pad_pairs(xb, s2b), wa, wb, b,
        h=hb, w_real=wb_, s2=s2b, s2_a=s2a,
        hp_a=ha, a_row_off=ro, a_col_off=col_off,
        r_block=4, interpret=True,
    )
    got = unpad_pairs(got, s2b, hb - 1, wb_ - 1)
    crop = xa[:, ro : ro + hb, col_off : col_off + wb_, :]
    want = jax.nn.relu(
        _oracle_conv(crop, wa, jnp.zeros_like(b), (1, 1), False)
        + _oracle_conv(xb, wb, jnp.zeros_like(b), (1, 1), False) + b
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_deconv_pf2_out_parity(np_rng):
    from segmentation_tpu.models.unet_fast import deconv2_packed_in_flat
    from segmentation_tpu.nn.pallas.conv_flat import (
        deconv_packed_padflat, unpad_pairs,
    )

    i_in, j_in, c, o = 9, 11, 64, 32
    x = jnp.asarray(np_rng.normal(size=(2, i_in, j_in, 4 * c)),
                    jnp.float32)
    wm = jnp.asarray(np_rng.normal(size=(c, 4 * o)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    want = deconv2_packed_in_flat(x, wm, b, o, pallas=False)
    s_i = stride_for(j_in, jnp.float32)
    xf = pad_rows(x, s_i)
    got = deconv_packed_padflat(
        xf, wm, jnp.tile(b, 4), i_in=i_in, j_in=j_in, s_i=s_i,
        r_block=4, pf2_out=True, interpret=True,
    )
    got = unpad_pairs(got, s_i, 2 * i_in, 2 * j_in)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=1e-3, atol=1e-3,
    )


@pytest.mark.parametrize("col_off", [4, 7])
def test_conv2x2_dual_pf2_int8(np_rng, col_off):
    """Stacked-K int8 dual pf2: resident int8 skip + inline-quant bf16
    up side, int8 requant output."""
    from segmentation_tpu.nn.pallas.conv_flat import (
        conv2x2_dual_pf2, pad_pairs, unpad_pairs,
    )

    hb, wb_, c, o = 9, 11, 128, 128
    ro = 2
    ha, wa_ = hb + 6, wb_ + 10
    xa = jnp.clip(jnp.round(jnp.asarray(
        np_rng.normal(size=(2, ha, wa_, c)), jnp.float32) * 40),
        -127, 127).astype(jnp.int8)
    xb = jnp.asarray(np_rng.normal(size=(2, hb, wb_, c)),
                     jnp.bfloat16)
    mkq = lambda: jnp.clip(jnp.round(jnp.asarray(
        np_rng.normal(size=(2, 2, c, o)), jnp.float32) * 30),
        -127, 127).astype(jnp.int8)
    wqa, wqb = mkq(), mkq()
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    sca = jnp.full((o,), 0.01, jnp.float32)
    scb = jnp.full((o,), 0.02, jnp.float32)
    q = {"chan_scale_a": sca, "chan_scale_b": scb,
         "act_scale_b": 0.05, "out_scale": 0.07}
    s2a = stride_for((wa_ + 1) // 2, jnp.int8)
    s2b = stride_for((wb_ + 1) // 2, jnp.int8)
    got = conv2x2_dual_pf2(
        pad_pairs(xa, s2a), pad_pairs(xb, s2b), wqa, wqb, b,
        h=hb, w_real=wb_, s2=s2b, s2_a=s2a, hp_a=ha,
        a_row_off=ro, a_col_off=col_off, r_block=4, quant=q,
        interpret=True,
    )
    assert got.dtype == jnp.int8
    got = unpad_pairs(got, s2b, hb - 1, wb_ - 1).astype(jnp.float32)
    crop = xa[:, ro : ro + hb, col_off : col_off + wb_, :]
    xbq = jnp.clip(jnp.round(xb.astype(jnp.float32) / 0.05), -127, 127)
    ya = _oracle_conv(crop.astype(jnp.float32), wqa.astype(jnp.float32),
                      jnp.zeros_like(b), (1, 1), False)
    yb = _oracle_conv(xbq, wqb.astype(jnp.float32), jnp.zeros_like(b),
                      (1, 1), False)
    want = jax.nn.relu(ya * sca + yb * scb + b)
    want8 = jnp.clip(jnp.round(want / 0.07), -127, 127)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want8),
                               atol=1.01)


def test_deconv_pf2_out_int8_resident(np_rng):
    """up1's serving config: resident int8 input (no act_scale), int8
    weights, requant epilogue (out_scale) emitting pf2 int8 directly."""
    from segmentation_tpu.models.unet_fast import deconv2_packed_in_flat
    from segmentation_tpu.nn.pallas.conv_flat import (
        deconv_packed_padflat, unpad_pairs,
    )

    i_in, j_in, c, o = 9, 11, 64, 32
    in_s, w_s, out_s = 1 / 8.0, 0.05, 1 / 4.0
    xq = jnp.clip(
        jnp.round(jnp.asarray(np_rng.normal(size=(2, i_in, j_in, 4 * c)),
                              jnp.float32) * 8), -127, 127
    ).astype(jnp.int8)
    wq = jnp.clip(
        jnp.round(jnp.asarray(np_rng.normal(size=(c, 4 * o)),
                              jnp.float32)), -127, 127
    ).astype(jnp.int8)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    want = deconv2_packed_in_flat(
        xq.astype(jnp.float32) * in_s, wq.astype(jnp.float32) * w_s, b,
        o, pallas=False,
    )
    want_q = np.clip(np.round(np.asarray(want) / out_s), 0, 127)

    s_i = stride_for(j_in, jnp.int8)
    xf = pad_rows(xq, s_i)
    q = {
        "chan_scale": jnp.full((4 * o,), w_s * in_s, jnp.float32),
        "out_scale": jnp.float32(out_s),
    }
    got = deconv_packed_padflat(
        xf, wq, jnp.tile(b, 4), i_in=i_in, j_in=j_in, s_i=s_i,
        r_block=4, pf2_out=True, quant=q, interpret=True,
    )
    assert got.dtype == jnp.int8
    got = unpad_pairs(got, s_i, 2 * i_in, 2 * j_in)
    diff = np.abs(np.asarray(got, np.float32) - want_q)
    assert diff.max() <= 1.0, diff.max()  # one rounding step


def test_matmul_rows_int8_resident(np_rng):
    """up2's serving config: resident int8 input through the rowwise
    deconv matmul with the requant epilogue."""
    in_s, w_s, out_s = 1 / 8.0, 0.05, 1 / 4.0
    c, o = 128, 128
    xq = jnp.clip(
        jnp.round(jnp.asarray(np_rng.normal(size=(2, 40, c)),
                              jnp.float32) * 8), -127, 127
    ).astype(jnp.int8)
    wq = jnp.clip(
        jnp.round(jnp.asarray(np_rng.normal(size=(c, o)), jnp.float32)),
        -127, 127,
    ).astype(jnp.int8)
    b = jnp.asarray(np_rng.normal(size=(o,)), jnp.float32)
    want = jax.nn.relu(
        jnp.dot(xq.astype(jnp.float32) * in_s,
                wq.astype(jnp.float32) * w_s) + b
    )
    want_q = np.clip(np.round(np.asarray(want) / out_s), 0, 127)
    q = {
        "chan_scale": jnp.full((o,), w_s * in_s, jnp.float32),
        "out_scale": jnp.float32(out_s),
    }
    got = matmul_rows_padflat(xq, wq, b, relu=True, quant=q,
                              interpret=True)
    assert got.dtype == jnp.int8
    diff = np.abs(np.asarray(got, np.float32) - want_q)
    assert diff.max() <= 1.0, diff.max()


def _entry_oracle(x, w3, b, relu=True):
    from segmentation_tpu.models.unet_fast import (
        pack_conv3_weight_s2, tile_bias4,
    )

    w4 = jnp.asarray(pack_conv3_weight_s2(np.asarray(w3, np.float32)))
    y = lax.conv_general_dilated(
        x.astype(jnp.float32), w4, (2, 2), "VALID", dimension_numbers=_DN
    ) + tile_bias4(jnp.asarray(b, jnp.float32))
    return jax.nn.relu(y) if relu else y


def test_conv3entry_pf2_parity(np_rng):
    """Fused pf2 entry (float mode) == the 4x4/2 packed entry conv."""
    from segmentation_tpu.nn.pallas.conv_flat import (
        conv3entry_pf2, entry_transform_pf2, entry_weights_pf2,
        unpad_pairs,
    )

    h_img, w_img, o = 18, 512, 32
    x = jnp.asarray(np_rng.normal(size=(2, h_img, w_img, 3)),
                    jnp.float32)
    w3 = np.asarray(np_rng.normal(size=(3, 3, 3, o)) * 0.2, np.float32)
    b = np_rng.normal(size=(o,)).astype(np.float32)
    want = _entry_oracle(x, w3, b)

    we, wh, wl = map(jnp.asarray, entry_weights_pf2(w3))
    xt = entry_transform_pf2(x)
    got = conv3entry_pf2(
        xt, we, wh, wl, jnp.tile(jnp.asarray(b), 4), h_img=h_img,
        r_block=3, interpret=True,
    )
    h_out, w_out = (h_img - 2) // 2, (w_img - 2) // 2
    got = unpad_pairs(got, w_img // 4, h_out, w_out)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_conv3entry_pf2_int8_resident(np_rng):
    """Fused pf2 entry, serving config: int8 input codes, int8 weights,
    requant epilogue -> int8 pf2 output."""
    from segmentation_tpu.nn.pallas.conv_flat import (
        conv3entry_pf2, entry_transform_pf2, entry_weights_pf2,
        unpad_pairs,
    )

    h_img, w_img, o = 18, 512, 32
    in_s, w_s, out_s = 1 / 100.0, 0.02, 1 / 16.0
    xq = jnp.clip(
        jnp.round(
            jnp.asarray(np_rng.random(size=(2, h_img, w_img, 3)),
                        jnp.float32) / in_s
        ), -127, 127,
    ).astype(jnp.int8)
    wq3 = np.clip(
        np.round(np_rng.normal(size=(3, 3, 3, o)) * 2), -127, 127
    ).astype(np.int8)
    b = np_rng.normal(size=(o,)).astype(np.float32) * 0.1
    want = _entry_oracle(
        xq.astype(jnp.float32) * in_s,
        wq3.astype(np.float32) * w_s, b,
    )
    want_q = np.clip(np.round(np.asarray(want) / out_s), 0, 127)

    we, wh, wl = map(jnp.asarray, entry_weights_pf2(wq3))
    xt = entry_transform_pf2(xq)
    q = {
        "chan_scale": jnp.full((4 * o,), w_s * in_s, jnp.float32),
        "out_scale": jnp.float32(out_s),
    }
    got = conv3entry_pf2(
        xt, we, wh, wl, jnp.tile(jnp.asarray(b), 4), h_img=h_img,
        r_block=3, quant=q, interpret=True,
    )
    assert got.dtype == jnp.int8
    h_out, w_out = (h_img - 2) // 2, (w_img - 2) // 2
    got = unpad_pairs(got, w_img // 4, h_out, w_out)
    diff = np.abs(np.asarray(got, np.float32) - want_q)
    assert diff.max() <= 1.0, diff.max()


def test_conv3entry_pf2_bf16_requant(np_rng):
    """Serving mode: bf16 taps/input, int8 requant epilogue — must equal
    the two-step (bf16 entry conv, then quantize) within one code."""
    from segmentation_tpu.nn.pallas.conv_flat import (
        conv3entry_pf2, entry_transform_pf2, entry_weights_pf2,
        unpad_pairs,
    )

    h_img, w_img, o = 18, 512, 32
    out_s = 1 / 16.0
    x = jnp.asarray(np_rng.random(size=(2, h_img, w_img, 3)),
                    jnp.bfloat16)
    w3 = np.asarray(np_rng.normal(size=(3, 3, 3, o)) * 0.2, np.float32)
    b = np_rng.normal(size=(o,)).astype(np.float32) * 0.1
    want = _entry_oracle(x, w3, b)
    want_q = np.clip(np.round(np.asarray(want) / out_s), 0, 127)

    we, wh, wl = (jnp.asarray(v, jnp.bfloat16)
                  for v in entry_weights_pf2(w3))
    xt = entry_transform_pf2(x)
    got = conv3entry_pf2(
        xt, we, wh, wl, jnp.tile(jnp.asarray(b), 4), h_img=h_img,
        r_block=3, quant={"out_scale": jnp.float32(out_s)},
        interpret=True,
    )
    assert got.dtype == jnp.int8
    h_out, w_out = (h_img - 2) // 2, (w_img - 2) // 2
    got = unpad_pairs(got, w_img // 4, h_out, w_out)
    diff = np.abs(np.asarray(got, np.float32) - want_q)
    assert diff.max() <= 1.0, diff.max()


def test_entry_chain_pf2_bitexact_vs_two_kernels(np_rng):
    """entry_chain_pf2 (fused c1_1+c1_2+pool, VMEM-resident c1_1) must be
    BIT-identical to the two-kernel composition it replaces: same requant
    points, same tap/roll/patch structure."""
    from segmentation_tpu.nn.pallas.conv_flat import (
        conv2x2_pf2, conv3entry_pf2, entry_chain_pf2,
        entry_transform_pf2, entry_weights_pf2,
    )

    h_img, w_img, o = 38, 512, 32
    o4 = 4 * o
    out_s1 = 1 / 16.0
    x = jnp.asarray(np_rng.random(size=(2, h_img, w_img, 3)),
                    jnp.bfloat16)
    w3 = np.asarray(np_rng.normal(size=(3, 3, 3, o)) * 0.2, np.float32)
    b1 = np_rng.normal(size=(o,)).astype(np.float32) * 0.1
    w2 = np.asarray(
        np_rng.integers(-90, 90, size=(2, 2, o4, o4)), np.int8
    )
    b2 = np_rng.normal(size=(o4,)).astype(np.float32) * 0.1
    cs2 = (np_rng.random(size=(o4,)).astype(np.float32) * 0.01
           + 0.001) * out_s1
    q2 = {"chan_scale": jnp.asarray(cs2), "out_scale": jnp.float32(0.05)}

    we, wh, wl = (jnp.asarray(v, jnp.bfloat16)
                  for v in entry_weights_pf2(w3))
    xt = entry_transform_pf2(x)
    b1t = jnp.tile(jnp.asarray(b1), 4)
    b2t = jnp.tile(jnp.asarray(b2), 1)

    v1 = conv3entry_pf2(
        xt, we, wh, wl, b1t, h_img=h_img, r_block=4,
        quant={"out_scale": jnp.float32(out_s1)}, interpret=True,
    )
    h1 = (h_img - 2) // 2
    want_y, want_p = conv2x2_pf2(
        v1, jnp.asarray(w2), b2t, h=h1, w_real=(w_img - 2) // 2,
        s2=w_img // 4, pool=True, quant=q2, r_block=4, interpret=True,
    )

    got_y, got_p = entry_chain_pf2(
        xt, we, wh, wl, b1t, jnp.asarray(w2), b2t, h_img=h_img,
        out_scale1=out_s1, quant2=q2, r_block=4, interpret=True,
    )
    # identical real region (padded block tails may differ: the chain's
    # junk rows come from clamped raw-input reads, the two-kernel path's
    # from clamped c1_1 reads)
    h2 = h1 - 1
    g = w_img // 4
    rows = h2 * g
    np.testing.assert_array_equal(
        np.asarray(got_y[:, :rows]), np.asarray(want_y[:, :rows])
    )
    np.testing.assert_array_equal(
        np.asarray(got_p[:, :rows]), np.asarray(want_p[:, :rows])
    )
