"""Golden-forward parity locks (VERDICT round-1 item 6a).

Fixed-seed params + a fixed input must reproduce committed logits
fingerprints. This guards refactors of the model zoo / nn layers against
silent numerical drift: the reference semantics these encode (U-Net VALID
crop-and-concat arithmetic, reference models/unet.py:109-175; FCN-8s skip
fusion, reference models/fcn.py:179-220) were verified against analytic
oracles when the fingerprints were minted (round 2, jax 0.9.0, CPU backend
f32). A legitimate semantic change must re-mint these constants in the same
commit and say why.

Tolerances are loose enough for cross-backend float reassociation (CPU vs
TPU) but far tighter than any architectural off-by-one: a single pixel of
crop misalignment moves `absum` by whole percents.
"""

import jax
import jax.numpy as jnp
import numpy as np

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.nn import module as hk

GOLDEN = {
    # name: (init_key, shape, mean, std, absum) — minted under the conftest
    # env (8-virtual-CPU backend, jax_default_matmul_precision=highest)
    "unet4": (42, (2, 36, 36, 2), -0.3170316935, 0.1955081697, 1665.809406),
    "fcn8s": (43, (2, 128, 128, 3), 0.1691973996, 0.7873527565, 63938.958113),
}


def _fingerprint(model, hw, key):
    fwd = hk.transform(lambda x: model(x))
    x = jnp.asarray(
        np.random.default_rng(1234).standard_normal((2, *hw, 3)), jnp.float32
    )
    params, state = fwd.init(jax.random.PRNGKey(key), x, train=False)
    logits, _ = fwd.apply(
        params, state, jax.random.PRNGKey(0), x, train=False
    )
    return np.asarray(logits, np.float64)


def _check(name, a):
    key, shape, mean, std, absum = GOLDEN[name]
    assert a.shape == shape, (name, a.shape, shape)
    np.testing.assert_allclose(a.mean(), mean, rtol=2e-4, err_msg=name)
    np.testing.assert_allclose(a.std(), std, rtol=2e-4, err_msg=name)
    np.testing.assert_allclose(np.abs(a).sum(), absum, rtol=2e-4,
                               err_msg=name)


def test_unet_golden_forward():
    from segmentation_tpu.models.unet import UNet

    model = UNet(ModelConfig(n_classes=2, input_dims=(224, 224), n_kernels=4))
    _check("unet4", _fingerprint(model, (224, 224), GOLDEN["unet4"][0]))


def test_fcn8s_golden_forward():
    from segmentation_tpu.models.fcn import FCN

    model = FCN(
        ModelConfig(
            n_classes=3, input_dims=(128, 128), n_kernels=8, fcn_type="8s"
        )
    )
    _check("fcn8s", _fingerprint(model, (128, 128), GOLDEN["fcn8s"][0]))


def test_unet_s2d_matches_golden():
    """The packed serving path must reproduce the SAME golden fingerprint —
    the strongest guard that layout rewrites stay semantics-preserving."""
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.models.unet_fast import UNetS2DInference

    cfg = ModelConfig(n_classes=2, input_dims=(224, 224), n_kernels=4)
    model = UNet(cfg)
    fwd = hk.transform(lambda x: model(x))
    x = jnp.asarray(
        np.random.default_rng(1234).standard_normal((2, 224, 224, 3)),
        jnp.float32,
    )
    params, _ = fwd.init(jax.random.PRNGKey(42), x, train=False)
    fast = UNetS2DInference(cfg)
    logits = fast.apply(fast.prepare(params), x)
    _check("unet4", np.asarray(logits, np.float64))
