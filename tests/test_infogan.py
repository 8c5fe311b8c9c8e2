"""InfoGAN tests — latent structure and MI head (SURVEY §2 #14 note)."""

import numpy as np

from segmentation_tpu.core.config import ModelConfig, TrainConfig
from segmentation_tpu.data.synthetic import SyntheticImages
from segmentation_tpu.models.infogan import InfoGANTrainer


def make_infogan(tmp_path, bs=8):
    hw = (28, 28)
    mcfg = ModelConfig(
        name="infogan", input_dims=hw, input_channel=1, n_kernels=8,
        zed_dim=16, c_discrete=10, c_ctns=2,
    )
    tcfg = TrainConfig(save_dir=str(tmp_path), learning_rate=1e-4)
    ds = SyntheticImages(batch_size=bs, hw=hw, channels=1, seed=6)
    return InfoGANTrainer(None, dataset=ds, model_cfg=mcfg, train_cfg=tcfg)


def test_infogan_trains_with_mi(tmp_path):
    tr = make_infogan(tmp_path)
    m = tr.train_step()
    assert "mi_loss" in m and np.isfinite(m["mi_loss"])
    for _ in range(2):
        m = tr.train_step()
    assert all(np.isfinite(v) for v in m.values())


def test_infogan_latent_dim(tmp_path):
    tr = make_infogan(tmp_path)
    assert tr.latent_dim == 16 + 10 + 2
    # generator's first FC consumes the full latent
    assert tr.state.params["gen_zed_project/w"].shape[0] == tr.latent_dim


def test_infogan_q_head_params(tmp_path):
    tr = make_infogan(tmp_path)
    assert "dis_q_cat/w" in tr.state.adv_params
    assert tr.state.adv_params["dis_q_cat/w"].shape[-1] == 10
    assert tr.state.adv_params["dis_q_mu/w"].shape[-1] == 2


def test_infogan_dream_manifold(tmp_path):
    tr = make_infogan(tmp_path)
    tr.train_step()
    imgs = tr.dream_manifold(c_index=1, steps=4)
    assert imgs.shape == (4, 28, 28, 1)
    d = tr.dream()
    assert d.shape == (8, 28, 28, 1)
