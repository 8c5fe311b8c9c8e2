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
