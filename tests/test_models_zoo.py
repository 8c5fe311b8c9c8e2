"""Model-zoo shape-contract and training smoke tests (SURVEY §4(b)/(d))."""

import jax
import numpy as np
import pytest

from segmentation_tpu.core.config import ModelConfig, TrainConfig
from segmentation_tpu.data.synthetic import (
    SyntheticImages,
    SyntheticSegmentation,
)
from segmentation_tpu.models.autoencoder import Autoencoder, AutoencoderTrainer
from segmentation_tpu.models.base import SegmentationTrainer
from segmentation_tpu.models.deconvolution import DeconvModel
from segmentation_tpu.models.fcn import FCN
from segmentation_tpu.nn import module as hk


def _forward(model, hw, channels=3, batch=2, train=True):
    import jax.numpy as jnp

    f = hk.transform(lambda x: model(x))
    x = jnp.zeros((batch, hw[0], hw[1], channels), jnp.float32)
    params, state = f.init(jax.random.PRNGKey(0), x, train=train)
    out, _ = f.apply(params, state, jax.random.PRNGKey(1), x, train=train)
    return out


@pytest.mark.parametrize("fcn_type", ["32s", "16s", "8s"])
def test_fcn_in_out_equal(fcn_type):
    """IN_OUT_EQUAL contract: FCN outputs match input size exactly
    (reference models/fcn.py:143, 174, 218)."""
    hw = (64, 64)
    cfg = ModelConfig(name="fcn", n_classes=3, input_dims=hw, n_kernels=4,
                      fcn_type=fcn_type)
    out = _forward(FCN(cfg), hw)
    assert out.shape == (2, 64, 64, 3)


def test_fcn_bad_type_raises():
    cfg = ModelConfig(name="fcn", input_dims=(32, 32), n_kernels=2,
                      fcn_type="64s")
    with pytest.raises(ValueError):
        _forward(FCN(cfg), (32, 32))


def test_deconv_in_out_equal():
    hw = (192, 192)  # deconv encoder needs >=~160px (empty-conv guard)
    cfg = ModelConfig(name="deconv", n_classes=2, input_dims=hw, n_kernels=4)
    out = _forward(DeconvModel(cfg), hw)
    assert out.shape == (2, 192, 192, 2)


def test_deconv_undersized_input_raises():
    """Below ~160px the encoder shrinks a 3x3 VALID stage to nothing; the
    round-2 build silently produced an all-zero network here. Must raise."""
    import pytest

    hw = (96, 96)
    cfg = ModelConfig(name="deconv", n_classes=2, input_dims=hw, n_kernels=4)
    with pytest.raises(ValueError, match="too\\s+small|too "):
        _forward(DeconvModel(cfg), hw)


@pytest.mark.parametrize("encoder_type", ["stacked", "small", "multiscale"])
def test_autoencoder_reconstruction_shape(encoder_type):
    hw = (28, 28) if encoder_type == "small" else (96, 96)
    cfg = ModelConfig(
        name="autoencoder", input_dims=hw, n_kernels=4, zed_dim=64,
        encoder_type=encoder_type, autoencoder=True,
        input_channel=1 if encoder_type == "small" else 3,
    )
    ch = cfg.input_channel
    y, aux = _forward(Autoencoder(cfg), hw, channels=ch)
    assert y.shape == (2, hw[0], hw[1], ch)
    assert aux == {}


def test_vae_aux():
    hw = (28, 28)
    cfg = ModelConfig(
        name="autoencoder", input_dims=hw, n_kernels=4, zed_dim=16,
        encoder_type="small", autoencoder=True, variational=True,
        input_channel=1,
    )
    y, aux = _forward(Autoencoder(cfg), hw, channels=1)
    assert aux["mu"].shape == (2, 16)
    assert aux["logvar"].shape == (2, 16)
    assert (np.asarray(aux["logvar"]) > 0).all()  # softplus + eps


def test_fcn8s_trains(tmp_path):
    hw = (64, 64)
    mcfg = ModelConfig(name="fcn", n_classes=2, input_dims=hw, n_kernels=4,
                       fcn_type="8s")
    tcfg = TrainConfig(save_dir=str(tmp_path), learning_rate=1e-3)
    ds = SyntheticSegmentation(batch_size=4, hw=hw, seed=2)
    tr = SegmentationTrainer(FCN(mcfg), dataset=ds, model_cfg=mcfg,
                             train_cfg=tcfg)
    first = tr.train_step()["seg_xentropy"]
    for _ in range(15):
        m = tr.train_step()
    assert m["seg_xentropy"] < first


def test_autoencoder_trains_and_dreams(tmp_path):
    hw = (28, 28)
    mcfg = ModelConfig(
        name="autoencoder", input_dims=hw, n_kernels=4, zed_dim=16,
        encoder_type="small", autoencoder=True, variational=True,
        input_channel=1, adversarial_training=False,
    )
    tcfg = TrainConfig(save_dir=str(tmp_path), learning_rate=1e-3)
    ds = SyntheticImages(batch_size=8, hw=hw, channels=1, seed=3)
    tr = AutoencoderTrainer(
        Autoencoder(mcfg), dataset=ds, model_cfg=mcfg, train_cfg=tcfg
    )
    first = tr.train_step()
    assert "KLD" in first
    for _ in range(10):
        m = tr.train_step()
    assert m["seg_xentropy"] < first["seg_xentropy"]
    dreams = tr.dream()
    assert dreams.shape == (8, 28, 28, 1)


def test_adversarial_autoencoder_trains(tmp_path):
    """AAE: adversary on reconstructions + split KLD optimizer
    (reference models/autoencoder.py:49, 143-146)."""
    hw = (28, 28)
    mcfg = ModelConfig(
        name="autoencoder", input_dims=hw, n_kernels=4, zed_dim=16,
        encoder_type="small", autoencoder=True, variational=True,
        input_channel=1, adversarial_training=True,
    )
    tcfg = TrainConfig(save_dir=str(tmp_path), learning_rate=1e-3)
    ds = SyntheticImages(batch_size=8, hw=hw, channels=1, seed=3)
    tr = AutoencoderTrainer(
        Autoencoder(mcfg), dataset=ds, model_cfg=mcfg, train_cfg=tcfg
    )
    m = tr.train_step()
    assert {"adv_loss", "KLD", "seg_loss"} <= set(m)
    for _ in range(3):
        m = tr.train_step()
    assert all(np.isfinite(v) for v in m.values())


def test_multiscale_adversarial_autoencoder_trains(tmp_path):
    """multiscale encoder + AAE mode (Luc adversary on reconstructions),
    reference models/autoencoder.py:388-465 + :49."""
    hw = (96, 96)
    mcfg = ModelConfig(
        name="autoencoder", input_dims=hw, n_kernels=4, zed_dim=64,
        encoder_type="multiscale", autoencoder=True,
        adversarial_training=True,
    )
    tcfg = TrainConfig(save_dir=str(tmp_path), learning_rate=1e-3)
    ds = SyntheticImages(batch_size=4, hw=hw, channels=3, seed=8)
    tr = AutoencoderTrainer(
        Autoencoder(mcfg), dataset=ds, model_cfg=mcfg, train_cfg=tcfg
    )
    m = tr.train_step()
    assert {"adv_loss", "seg_loss"} <= set(m)
    m = tr.train_step()
    assert all(np.isfinite(v) for v in m.values())
    d = tr.dream()
    assert d.shape == (4, 96, 96, 3)
