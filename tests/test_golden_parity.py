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
    # round 3 (minted 2026-08-17): deconv + all 3 AE encoders + both GAN
    # generators. Size notes: the deconv/stacked/multiscale encoders shrink
    # 3x3-VALID stages to empty tensors below ~128-192px (a silent all-zero
    # forward) — fingerprint sizes chosen above that floor; multiscale key
    # picked so the 1-channel zed_conv ReLU isn't dead at init.
    "deconv": (44, (2, 192, 192, 2), -0.0008081325, 0.0044331736,
               445.649671),
    "ae_stacked": (45, (2, 96, 96, 3), 0.0002435787, 0.0006030682,
                   23.625056),
    "ae_small": (46, (2, 28, 28, 1), 0.0125631319, 0.0139711116, 22.877070),
    "ae_multiscale": (53, (2, 128, 128, 3), 0.0006975416, 0.0021631833,
                      132.486520),
    "gan_gen": (48, (4, 28, 28, 1), -0.0000139326, 0.0004739966, 1.129556),
    "gan_gen_cond": (49, (4, 28, 28, 1), 0.0109602264, 0.0518619936,
                     143.365534),
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


def test_deconv_golden_forward():
    from segmentation_tpu.models.deconvolution import DeconvModel

    model = DeconvModel(
        ModelConfig(n_classes=2, input_dims=(192, 192), n_kernels=4)
    )
    _check("deconv", _fingerprint(model, (192, 192), GOLDEN["deconv"][0]))


def test_autoencoder_goldens():
    """All three encoder variants (stacked/small/multiscale) with their
    decoders, reference models/autoencoder.py:245-465."""
    from segmentation_tpu.models.autoencoder import Autoencoder

    for name, enc, hw, ch in [
        ("ae_stacked", "stacked", (96, 96), 3),
        ("ae_small", "small", (28, 28), 1),
        ("ae_multiscale", "multiscale", (128, 128), 3),
    ]:
        cfg = ModelConfig(
            name="autoencoder", input_dims=hw, input_channel=ch,
            n_kernels=4, zed_dim=16, encoder_type=enc, autoencoder=True,
        )
        model = Autoencoder(cfg)
        fwd = hk.transform(lambda x: model(x))
        x = jnp.asarray(
            np.random.default_rng(1234).standard_normal((2, *hw, ch)),
            jnp.float32,
        )
        params, state = fwd.init(
            jax.random.PRNGKey(GOLDEN[name][0]), x, train=False
        )
        (y, _), _ = fwd.apply(
            params, state, jax.random.PRNGKey(0), x, train=False
        )
        _check(name, np.asarray(y, np.float64))


def test_gan_generator_goldens():
    """Unconditional + conditional generators, reference
    models/gan.py:281-332."""
    from segmentation_tpu.models.gan import GANGenerator

    rng = np.random.default_rng(1234)
    z = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    labels = jnp.asarray(np.eye(10, dtype=np.float32)[rng.integers(0, 10, 4)])
    for name, label_dim in [("gan_gen", None), ("gan_gen_cond", 10)]:
        cfg = ModelConfig(
            name="gan", input_dims=(28, 28), input_channel=1, n_kernels=8,
            zed_dim=16, label_dim=label_dim, autoencoder=True,
        )
        gen = GANGenerator(cfg)
        fwd = hk.transform(lambda zz, lab: gen(zz, lab))
        lab = labels if label_dim else None
        params, state = fwd.init(
            jax.random.PRNGKey(GOLDEN[name][0]), z, lab, train=False
        )
        out, _ = fwd.apply(
            params, state, jax.random.PRNGKey(0), z, lab, train=False
        )
        _check(name, np.asarray(out, np.float64))


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
