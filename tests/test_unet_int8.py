"""int8 serving path: calibrated quantization must track the float path."""

import jax
import jax.numpy as jnp
import numpy as np

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.models.unet import UNet
from segmentation_tpu.models.unet_int8 import UNetS2DInt8
from segmentation_tpu.nn import module as hk


def test_int8_mask_agreement():
    hw = (204, 204)
    mcfg = ModelConfig(n_classes=2, input_dims=hw, n_kernels=4)
    model = UNet(mcfg, levels=4)
    fwd = hk.transform(lambda x: model(x))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0.5, 0.2, (2, *hw, 3)).astype(np.float32))
    params, state = fwd.init(jax.random.PRNGKey(0), x, train=False)
    ref, _ = fwd.apply(params, state, None, x, train=False)
    ref_mask = np.asarray(jnp.argmax(ref, -1))

    q = UNetS2DInt8(mcfg, levels=4)
    calib = [
        jnp.asarray(
            rng.normal(0.5, 0.2, (1, *hw, 3)).astype(np.float32)
        )
        for _ in range(2)
    ]
    prepared = q.prepare(params, calib_batches=calib)
    got = q.apply(prepared, x)
    got_mask = np.asarray(jnp.argmax(got, -1))

    agreement = float((got_mask == ref_mask).mean())
    assert agreement > 0.97, f"mask agreement {agreement:.3f}"
    # logits stay correlated
    corr = np.corrcoef(
        np.asarray(ref).ravel(), np.asarray(got).ravel()
    )[0, 1]
    assert corr > 0.98, f"logit correlation {corr:.3f}"


def test_int8_weights_are_int8():
    mcfg = ModelConfig(n_classes=2, input_dims=(60, 60), n_kernels=4)
    model = UNet(mcfg, levels=2)
    fwd = hk.transform(lambda x: model(x))
    x = jnp.zeros((1, 60, 60, 3))
    params, _ = fwd.init(jax.random.PRNGKey(0), x, train=False)
    q = UNetS2DInt8(mcfg, levels=2)
    prepared = q.prepare(params)
    wq_keys = [k for k in prepared if k.endswith("/wq")]
    assert wq_keys
    for k in wq_keys:
        assert prepared[k].dtype == jnp.int8


def test_int8_apply_argmax_matches_apply():
    hw = (204, 204)
    mcfg = ModelConfig(n_classes=2, input_dims=hw, n_kernels=4)
    model = UNet(mcfg, levels=4)
    fwd = hk.transform(lambda x: model(x))
    x = jnp.asarray(
        np.random.default_rng(9).normal(0.5, 0.2, (1, *hw, 3)).astype(
            np.float32
        )
    )
    params, _ = fwd.init(jax.random.PRNGKey(0), x, train=False)
    q = UNetS2DInt8(mcfg, levels=4)
    prepared = q.prepare(params, calib_batches=[x])
    ref = np.asarray(jnp.argmax(q.apply(prepared, x), -1))
    got = np.asarray(q.apply_argmax(prepared, x))
    np.testing.assert_array_equal(got, ref)


def test_uncalibrated_prepare_falls_back_to_float():
    """prepare() without calibration batches must NOT quantize activations —
    the forward equals the float s2d path exactly."""
    from segmentation_tpu.models.unet_fast import UNetS2DInference

    hw = (60, 60)
    mcfg = ModelConfig(n_classes=2, input_dims=hw, n_kernels=4)
    model = UNet(mcfg, levels=2)
    fwd = hk.transform(lambda x: model(x))
    x = jnp.asarray(
        np.random.default_rng(2).normal(0.5, 0.2, (1, *hw, 3)).astype(
            np.float32
        )
    )
    params, _ = fwd.init(jax.random.PRNGKey(0), x, train=False)
    q = UNetS2DInt8(mcfg, levels=2)
    ref = UNetS2DInference(mcfg, levels=2)
    np.testing.assert_allclose(
        np.asarray(q.apply(q.prepare(params), x)),
        np.asarray(ref.apply(ref.prepare(params), x)),
        atol=1e-5,
    )


def test_int8_conv_out_scale_matches_two_step():
    """The fused requant epilogue (out_scale) must equal quantizing the
    bf16-output path at the same scale, up to one rounding step plus the
    bf16 mantissa error of the two-step route."""
    from segmentation_tpu.models.unet_int8 import (
        _quantize_weight, int8_conv,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 12, 16)).astype(np.float32))
    wq, ws = _quantize_weight(
        rng.normal(0, 0.1, (2, 2, 16, 8)).astype(np.float32)
    )
    wq, ws = jnp.asarray(wq), jnp.asarray(ws)
    b = jnp.asarray(rng.normal(0, 0.05, (8,)).astype(np.float32))
    act_scale = jnp.float32(float(np.abs(np.asarray(x)).max()) / 127.0)

    for relu in (True, False):
        y_f = int8_conv(x, wq, ws, act_scale, b, relu=relu)
        out_scale = jnp.float32(
            float(np.abs(np.asarray(y_f, np.float32)).max()) / 127.0
        )
        y_q = int8_conv(
            x, wq, ws, act_scale, b, relu=relu, out_scale=out_scale
        )
        assert y_q.dtype == jnp.int8
        two_step = np.clip(
            np.round(
                np.asarray(y_f, np.float32) / float(out_scale)
            ), 0.0 if relu else -127.0, 127.0,
        )
        diff = np.abs(np.asarray(y_q, np.float32) - two_step)
        assert diff.max() <= 2.0, f"relu={relu}: {diff.max()} codes"


def test_int8_std_dual_conv_matches_concat_conv():
    """The per-operand weight split must approximate the float concat
    conv (concat order [skip, up]) — scales applied to the right halves."""
    from segmentation_tpu.models.unet_int8 import (
        _quantize_weight, int8_std_dual_conv,
    )
    from jax import lax

    rng = np.random.default_rng(4)
    c = 12
    sk = jnp.asarray(rng.normal(0, 1, (1, 10, 10, c)).astype(np.float32))
    up = jnp.asarray(rng.normal(0, 2, (1, 10, 10, c)).astype(np.float32))
    w = rng.normal(0, 0.1, (2, 2, 2 * c, 8)).astype(np.float32)
    b = jnp.asarray(rng.normal(0, 0.05, (8,)).astype(np.float32))

    wqa, wsa = _quantize_weight(w[:, :, :c])
    wqb, wsb = _quantize_weight(w[:, :, c:])
    sks = jnp.float32(float(np.abs(np.asarray(sk)).max()) / 127.0)
    asb = jnp.float32(float(np.abs(np.asarray(up)).max()) / 127.0)

    got = int8_std_dual_conv(
        sk, up, jnp.asarray(wqa), jnp.asarray(wsa), sks,
        jnp.asarray(wqb), jnp.asarray(wsb), asb, b, relu=True,
    )
    ref = lax.conv_general_dilated(
        jnp.concatenate([sk, up], -1), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    ref = np.maximum(np.asarray(ref), 0.0)
    err = np.abs(np.asarray(got, np.float32) - ref)
    assert err.max() <= 0.05 * max(1.0, float(ref.max())), err.max()


def _count_int8_convs(jaxpr):
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            if eqn.invars[0].aval.dtype == jnp.int8:
                n += 1
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                n += _count_int8_convs(v.jaxpr)
            if isinstance(v, (list, tuple)):
                for vv in v:
                    if hasattr(vv, "jaxpr"):
                        n += _count_int8_convs(vv.jaxpr)
    return n


def _has_int8_pool(jaxpr):
    for eqn in jaxpr.eqns:
        if (
            eqn.primitive.name.startswith("reduce_window")
            and eqn.invars[0].aval.dtype == jnp.int8
        ):
            return True
        for v in eqn.params.values():
            if hasattr(v, "jaxpr") and _has_int8_pool(v.jaxpr):
                return True
            if isinstance(v, (list, tuple)):
                for vv in v:
                    if hasattr(vv, "jaxpr") and _has_int8_pool(vv.jaxpr):
                        return True
    return False


def test_std_levels_int8_resident():
    """Calibrated std levels must stay int8-RESIDENT: std convs consume
    int8 operands and the encoder max pool runs on the int8 codes (the
    requant epilogue feeds the next site directly, no bf16 round trip)."""
    hw = (204, 204)
    mcfg = ModelConfig(n_classes=2, input_dims=hw, n_kernels=4)
    model = UNet(mcfg, levels=4)
    fwd = hk.transform(lambda x: model(x))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0.5, 0.2, (1, *hw, 3)).astype(np.float32))
    params, _ = fwd.init(jax.random.PRNGKey(0), x, train=False)
    q = UNetS2DInt8(mcfg, levels=4)
    prepared = q.prepare(params, calib_batches=[x])

    jaxpr = jax.make_jaxpr(lambda xx: q.apply(prepared, xx))(x)
    n_int8 = _count_int8_convs(jaxpr.jaxpr)
    # levels=4, packed_levels=2: std encoder convs 3_1..4_2 (4) +
    # bottleneck pair (2) + std decoder conv6_1 split (2 convs) +
    # conv6_2 (1) — plus the packed-region int8 sites.
    assert n_int8 >= 9, f"only {n_int8} int8 convs in the serving jaxpr"
    assert _has_int8_pool(jaxpr.jaxpr), (
        "encoder max pool does not run on int8 codes"
    )


def test_calibration_runs_at_serving_numerics():
    """An f32 calibration batch must produce the same activation scales as
    the identical batch pre-cast to bf16: calibration runs at the deployed
    (bf16) numerics. Regression: an f32 batch used to trace the whole
    Pallas region in f32, doubling scoped-VMEM footprints past the 16 MB
    stack limit (compile-time OOM on TPU, bench.py round 3)."""
    hw = (204, 204)
    mcfg = ModelConfig(n_classes=2, input_dims=hw, n_kernels=4)
    model = UNet(mcfg, levels=4)
    fwd = hk.transform(lambda x: model(x))
    rng = np.random.default_rng(3)
    xf = rng.normal(0.5, 0.2, (1, *hw, 3)).astype(np.float32)
    params, _ = fwd.init(
        jax.random.PRNGKey(0), jnp.asarray(xf), train=False
    )
    q = UNetS2DInt8(mcfg, levels=4)
    p32 = q.prepare(params, calib_batches=[jnp.asarray(xf)])
    p16 = q.prepare(
        params, calib_batches=[jnp.asarray(xf, jnp.bfloat16)]
    )
    scales32 = {k: v for k, v in p32.items() if "ascale" in k}
    assert scales32, "no activation scales recorded"
    for k, v in scales32.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(p16[k]))
