"""Parity: the space-to-depth U-Net inference path must reproduce the
standard forward bit-for-bit up to float reassociation."""

import jax
import jax.numpy as jnp
import numpy as np

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.models.unet import UNet
from segmentation_tpu.models.unet_fast import (
    UNetS2DInference,
    pack2,
    pack_conv3_weight,
    unpack2,
)
from segmentation_tpu.nn import module as hk


def test_pack_unpack_roundtrip():
    x = jnp.arange(2 * 8 * 6 * 3, dtype=jnp.float32).reshape(2, 8, 6, 3)
    np.testing.assert_array_equal(np.asarray(unpack2(pack2(x))), np.asarray(x))


def test_packed_conv_matches_plain():
    from jax import lax

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 12, 10, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    w2 = jnp.asarray(pack_conv3_weight(np.asarray(w)))
    xp = pack2(x)
    n, hp, wp, s, c = xp.shape
    y = lax.conv_general_dilated(
        xp.reshape(n, hp, wp, s * c), w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = unpack2(y.reshape(n, hp - 1, wp - 1, 4, 5))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_s2d_unet_parity_full():
    hw = (204, 204)
    mcfg = ModelConfig(name="unet", n_classes=2, input_dims=hw, n_kernels=4)
    model = UNet(mcfg, levels=4)
    fwd = hk.transform(lambda x: model(x))
    x = jnp.asarray(
        np.random.default_rng(1).normal(0.5, 0.2, (1, *hw, 3)).astype(
            np.float32
        )
    )
    params, state = fwd.init(jax.random.PRNGKey(0), x, train=False)
    ref, _ = fwd.apply(params, state, None, x, train=False)

    fast = UNetS2DInference(mcfg, levels=4)
    prepared = fast.prepare(params)
    got = fast.apply(prepared, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3
    )


def test_s2d_unet_parity_shallow():
    hw = (60, 60)
    mcfg = ModelConfig(name="unet", n_classes=3, input_dims=hw, n_kernels=4)
    model = UNet(mcfg, levels=2)
    fwd = hk.transform(lambda x: model(x))
    x = jnp.asarray(
        np.random.default_rng(2).normal(0.5, 0.2, (2, *hw, 3)).astype(
            np.float32
        )
    )
    params, state = fwd.init(jax.random.PRNGKey(0), x, train=False)
    ref, _ = fwd.apply(params, state, None, x, train=False)
    fast = UNetS2DInference(mcfg, levels=2)
    got = fast.apply(fast.prepare(params), x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3
    )


def test_unet_s2d_trainable_checkpoint_compatible(tmp_path):
    """UNetS2D declares UNet's params (same names/shapes), trains, and its
    state restores into a standard UNet trainer."""
    from segmentation_tpu.core.config import TrainConfig
    from segmentation_tpu.data.synthetic import SyntheticSegmentation
    from segmentation_tpu.models.base import SegmentationTrainer
    from segmentation_tpu.models.unet_fast import UNetS2D

    hw = (60, 60)
    mcfg = ModelConfig(n_classes=2, input_dims=hw, n_kernels=4)
    tcfg = TrainConfig(save_dir=str(tmp_path), learning_rate=1e-3)
    ds = SyntheticSegmentation(batch_size=8, hw=hw, seed=3)
    tr = SegmentationTrainer(
        UNetS2D(mcfg, levels=2), dataset=ds, model_cfg=mcfg, train_cfg=tcfg
    )
    first = tr.train_step()["seg_xentropy"]
    for _ in range(15):
        m = tr.train_step()
    assert m["seg_xentropy"] < first
    tr.snapshot()

    from segmentation_tpu.models.unet import UNet

    tr2 = SegmentationTrainer(
        UNet(mcfg, levels=2), dataset=ds, model_cfg=mcfg, train_cfg=tcfg
    )
    tr2.load_snapshot = True
    tr2._init_saver()
    assert tr2.global_step == 16
    np.testing.assert_allclose(
        np.asarray(tr2.state.params["output/w"]),
        np.asarray(tr.state.params["output/w"]),
    )


def test_pack_weight_jnp_matches_numpy():
    from segmentation_tpu.models.unet_fast import pack_conv3_weight_jnp

    w = np.random.default_rng(0).normal(size=(3, 3, 5, 7)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(pack_conv3_weight_jnp(jnp.asarray(w))),
        pack_conv3_weight(w),
        atol=1e-6,
    )


def test_apply_argmax_packed_head_matches():
    hw = (204, 204)
    mcfg = ModelConfig(name="unet", n_classes=3, input_dims=hw, n_kernels=4)
    model = UNet(mcfg, levels=4)
    fwd = hk.transform(lambda x: model(x))
    x = jnp.asarray(
        np.random.default_rng(4).normal(0.5, 0.2, (1, *hw, 3)).astype(
            np.float32
        )
    )
    params, state = fwd.init(jax.random.PRNGKey(0), x, train=False)
    fast = UNetS2DInference(mcfg, levels=4)
    prepared = fast.prepare(params)
    ref = np.asarray(jnp.argmax(fast.apply(prepared, x), -1))
    got = np.asarray(fast.apply_argmax(prepared, x))
    np.testing.assert_array_equal(got, ref)


def test_pack_weight_s2_jnp_matches_numpy():
    from segmentation_tpu.models.unet_fast import (
        pack_conv3_weight_s2,
        pack_conv3_weight_s2_jnp,
    )

    w = np.random.default_rng(1).normal(size=(3, 3, 5, 7)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(pack_conv3_weight_s2_jnp(jnp.asarray(w))),
        pack_conv3_weight_s2(w),
        atol=1e-6,
    )


def test_strided_conv_matches_pack_then_packed_conv():
    """The 4x4/2 strided-s2d conv equals pack2 + packed_conv3 (and both
    equal the plain 3x3 VALID conv, up to float reassociation)."""
    from segmentation_tpu.models.unet_fast import (
        pack2,
        pack_conv3_weight,
        pack_conv3_weight_s2,
        packed_conv3,
        strided_packed_conv3,
        unpack2,
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 20, 24, 5)).astype(np.float32))
    w = rng.normal(size=(3, 3, 5, 6)).astype(np.float32)
    b = rng.normal(size=(6,)).astype(np.float32)
    ref = packed_conv3(
        pack2(x), jnp.asarray(pack_conv3_weight(w)), jnp.asarray(b)
    )
    got = strided_packed_conv3(
        x, jnp.asarray(pack_conv3_weight_s2(w)), jnp.asarray(b)
    )
    np.testing.assert_allclose(
        np.asarray(unpack2(got)), np.asarray(unpack2(ref)), atol=1e-5
    )


def test_deconv2_packed_in_matches_unpack_matmul():
    from segmentation_tpu.models.unet_fast import (
        deconv2_as_matmul,
        deconv2_packed_in,
        unpack2,
    )

    rng = np.random.default_rng(3)
    xp = jnp.asarray(rng.normal(size=(2, 5, 6, 4, 8)).astype(np.float32))
    wm = jnp.asarray(rng.normal(size=(8, 4 * 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    ref = deconv2_as_matmul(unpack2(xp), wm, b, 3)
    got = deconv2_packed_in(xp, wm, b, 3)
    np.testing.assert_allclose(
        np.asarray(unpack2(got)), np.asarray(unpack2(ref)), atol=1e-5
    )


def test_unet_s2d_bayesian_dropout_sites_live():
    """cfg.bayesian=True must give the s2d U-Net REAL MC-dropout sites:
    two different rng keys → different logits; the uncertainty maps from
    infer_bayesian over this model are therefore non-zero (the ADVICE
    round-1 finding was silently-all-zero uncertainty via UNetS2D)."""
    from segmentation_tpu.models.unet_fast import UNetS2D

    cfg = ModelConfig(
        n_classes=2, input_dims=(192, 192), n_kernels=4, bayesian=True,
        dropout_rate=0.5,
    )
    model = UNetS2D(cfg, levels=2)
    fwd = hk.transform(lambda x: model(x))
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 192, 192, 3)), jnp.float32
    )
    params, state = fwd.init(jax.random.PRNGKey(0), x, train=False)
    a, _ = fwd.apply(params, state, jax.random.PRNGKey(1), x, train=False)
    b, _ = fwd.apply(params, state, jax.random.PRNGKey(2), x, train=False)
    assert float(jnp.abs(a - b).max()) > 0, "dropout sites are dead"
    # and with bayesian=False the path stays deterministic
    cfg_d = ModelConfig(n_classes=2, input_dims=(192, 192), n_kernels=4)
    model_d = UNetS2D(cfg_d, levels=2)
    fwd_d = hk.transform(lambda x: model_d(x))
    params_d, state_d = fwd_d.init(jax.random.PRNGKey(0), x, train=False)
    c, _ = fwd_d.apply(
        params_d, state_d, jax.random.PRNGKey(1), x, train=False
    )
    d, _ = fwd_d.apply(
        params_d, state_d, jax.random.PRNGKey(2), x, train=False
    )
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_flat_helpers_match_5d_oracles():
    """Flat-layout helpers vs the legacy 5-D helpers they replaced."""
    from segmentation_tpu.models.unet_fast import (
        deconv2_packed_in,
        deconv2_packed_in_flat,
        flat4,
        packed_center_crop,
        packed_center_crop_flat,
        packed_conv3,
        packed_conv3_dual_flat,
        packed_conv3_flat,
        packed_pool_flat,
        view5,
    )

    rng = np.random.default_rng(0)
    n, hp, wp, c, o = 2, 9, 8, 3, 5
    xp5 = jnp.asarray(rng.standard_normal((n, hp, wp, 4, c)), jnp.float32)
    x4 = flat4(xp5)

    # conv
    w2 = jnp.asarray(rng.standard_normal((2, 2, 4 * c, 4 * o)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
    ref = packed_conv3(xp5, w2, b)
    np.testing.assert_allclose(
        np.asarray(view5(packed_conv3_flat(x4, w2, b), o)),
        np.asarray(ref), rtol=1e-5, atol=1e-5,
    )

    # dual conv == conv of concat
    ca = cb = c
    wa = jnp.asarray(
        rng.standard_normal((2, 2, 4 * ca, 4 * o)), jnp.float32
    )
    wb = jnp.asarray(
        rng.standard_normal((2, 2, 4 * cb, 4 * o)), jnp.float32
    )
    a5 = jnp.asarray(rng.standard_normal((n, hp, wp, 4, ca)), jnp.float32)
    u5 = jnp.asarray(rng.standard_normal((n, hp, wp, 4, cb)), jnp.float32)
    cat5 = jnp.concatenate([a5, u5], axis=-1)
    # w for concat input interleaves per-slot [a-channels, b-channels]:
    # build the equivalent concat kernel by stacking along the input dim
    # per slot
    wa_s = wa.reshape(2, 2, 4, ca, 4 * o)
    wb_s = wb.reshape(2, 2, 4, cb, 4 * o)
    wcat = jnp.concatenate([wa_s, wb_s], axis=3).reshape(
        2, 2, 4 * (ca + cb), 4 * o
    )
    ref = packed_conv3(cat5, wcat, b)
    got = packed_conv3_dual_flat(flat4(a5), flat4(u5), wa, wb, b)
    np.testing.assert_allclose(
        np.asarray(view5(got, o)), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    # pool
    np.testing.assert_allclose(
        np.asarray(packed_pool_flat(x4, c)),
        np.asarray(jnp.max(xp5, axis=3)),
        rtol=1e-6,
    )

    # packed-in deconv
    wm = jnp.asarray(rng.standard_normal((c, 4 * o)), jnp.float32)
    bb = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
    ref = deconv2_packed_in(xp5, wm, bb, o)
    got = deconv2_packed_in_flat(x4, wm, bb, o)
    np.testing.assert_allclose(
        np.asarray(view5(got, o)), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    # center crop, even and odd offsets
    for off in ((2, 2), (1, 3), (3, 1)):
        th, tw = 8, 6
        ref = packed_center_crop(xp5, (th, tw), off)
        got = packed_center_crop_flat(x4, c, (th, tw), off)
        np.testing.assert_array_equal(
            np.asarray(view5(got, c)), np.asarray(ref)
        )


def test_pool4_select_matches_reduce(np_rng):
    """Forward parity + a valid-subgradient backward for the select-VJP
    pool (unique-max case must match the reduce pool's grad exactly)."""
    import jax
    import jax.numpy as jnp

    from segmentation_tpu.models.unet_fast import (
        packed_pool_flat, pool4_select,
    )

    x = jnp.asarray(np_rng.normal(size=(2, 6, 6, 128)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(pool4_select(x)),
        np.asarray(packed_pool_flat(x, 32, False)),
        rtol=1e-6,
    )

    def f_sel(v):
        return (pool4_select(v) ** 2).sum()

    def f_ref(v):
        return (packed_pool_flat(v, 32, False) ** 2).sum()

    g_sel = jax.grad(f_sel)(x)
    g_ref = jax.grad(f_ref)(x)
    # continuous random input -> no ties -> grads identical
    np.testing.assert_allclose(np.asarray(g_sel), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_crop_flat_t_grads(np_rng):
    """crop_flat_t (custom-VJP crop, flat-4D uncrop backward) matches the
    plain slice formulation's value and gradient for even AND odd
    (slot-phase) offsets."""
    import jax
    import jax.numpy as jnp

    from segmentation_tpu.models.unet_fast import (
        crop_flat_t, packed_center_crop_flat,
    )

    c = 8
    x4 = jnp.asarray(np_rng.normal(size=(2, 9, 9, 4 * c)), jnp.float32)
    for off in ((2, 2), (1, 3), (3, 1), (5, 5), (3, 3)):
        th, tw = 8, 6
        cot = jnp.asarray(
            np_rng.normal(size=(2, th // 2, tw // 2, 4 * c)), jnp.float32
        )

        def f_got(v):
            return (crop_flat_t(v, c, (th, tw), off) * cot).sum()

        def f_ref(v):
            return (packed_center_crop_flat(v, c, (th, tw), off)
                    * cot).sum()

        np.testing.assert_allclose(f_got(x4), f_ref(x4), rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(jax.grad(f_got)(x4)),
            np.asarray(jax.grad(f_ref)(x4)),
        )


def test_s2conv_t_grads(np_rng):
    """_s2conv_t's parity-decomposed dgrad and vjp-projected wgrad match
    XLA's AD of the plain stride-2 conv."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from segmentation_tpu.models.unet_fast import _DN, _s2conv_t

    c, o4 = 5, 12
    x = jnp.asarray(np_rng.normal(size=(2, 14, 18, c)), jnp.float32)
    w4 = jnp.asarray(np_rng.normal(size=(4, 4, c, o4)) * 0.1, jnp.float32)

    def ref(xx, ww):
        return lax.conv_general_dilated(
            xx, ww, (2, 2), "VALID", dimension_numbers=_DN
        )

    cot = jnp.asarray(np_rng.normal(size=ref(x, w4).shape), jnp.float32)

    def lg(f):
        def loss(xx, ww):
            return (f(xx, ww) * cot).sum()

        return jax.value_and_grad(loss, argnums=(0, 1))(x, w4)

    vg, (gx_g, gw_g) = lg(_s2conv_t)
    vr, (gx_r, gw_r) = lg(ref)
    np.testing.assert_allclose(vg, vr, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_g), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)


def test_packed_head_matches_unpacked(np_rng):
    """The packed-layout 1x1 output head (einsum on the slot view, then
    unpack) equals conv-after-unpack."""
    import jax.numpy as jnp

    from segmentation_tpu.models.unet_fast import (
        _conv_batch_sharded, unpack2, view5,
    )

    k, nc = 8, 3
    h = jnp.asarray(np_rng.normal(size=(2, 5, 7, 4 * k)), jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(1, 1, k, nc)), jnp.float32)

    ref = _conv_batch_sharded(unpack2(view5(h, k)), w, (1, 1))
    got = unpack2(jnp.einsum("nijsc,ck->nijsk", view5(h, k), w[0, 0]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
