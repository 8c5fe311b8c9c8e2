"""GAN / CGAN training tests (SURVEY §4(d); reference models/gan.py)."""

import numpy as np

from segmentation_tpu.core.config import ModelConfig, TrainConfig
from segmentation_tpu.data.synthetic import SyntheticImages
from segmentation_tpu.models.gan import GANTrainer


class LabeledImages(SyntheticImages):
    def get_batch(self):
        b = super().get_batch()
        b["label"] = np.arange(self.batch_size, dtype=np.int32) % 10
        return b


def make_gan(tmp_path, label_dim=None, bs=8):
    hw = (28, 28)
    mcfg = ModelConfig(
        name="gan", input_dims=hw, input_channel=1, n_kernels=8,
        zed_dim=16, label_dim=label_dim,
    )
    tcfg = TrainConfig(save_dir=str(tmp_path), learning_rate=1e-4)
    ds = (LabeledImages if label_dim else SyntheticImages)(
        batch_size=bs, hw=hw, channels=1, seed=5
    )
    return GANTrainer(None, dataset=ds, model_cfg=mcfg, train_cfg=tcfg)


def test_gan_trains(tmp_path):
    tr = make_gan(tmp_path)
    m = tr.train_step()
    assert {"adv_loss", "gen_loss", "loss_real", "loss_fake"} <= set(m)
    for _ in range(3):
        m = tr.train_step()
    assert all(np.isfinite(v) for v in m.values())
    assert tr.global_step == 4


def test_gan_param_partition(tmp_path):
    """gen_/dis_ name-prefix partition (reference models/gan.py:200-208)."""
    tr = make_gan(tmp_path)
    assert all(k.startswith("gen_") for k in tr.state.params)
    assert all(k.startswith("dis_") for k in tr.state.adv_params)


def test_gan_dream_fixed_sample(tmp_path):
    tr = make_gan(tmp_path)
    tr.train_step()
    d1 = tr.dream()
    d2 = tr.dream()
    assert d1.shape == (8, 28, 28, 1)
    # fixed z at construction → identical dreams for identical params
    np.testing.assert_allclose(d1, d2)
    assert d1.min() >= 0.0 and d1.max() <= 1.0


def test_cgan_trains(tmp_path):
    tr = make_gan(tmp_path, label_dim=10)
    m = tr.train_step()
    assert np.isfinite(m["gen_loss"])
    d = tr.dream()
    assert d.shape == (8, 28, 28, 1)


def test_gan_snapshot_restore(tmp_path):
    tr = make_gan(tmp_path)
    tr.train_step()
    tr.snapshot()
    tr2 = make_gan(tmp_path)
    tr2.load_snapshot = True
    tr2._init_saver()
    assert tr2.global_step == 1


def test_gan_grad_histograms_at_summary_cadence(tmp_path):
    """Per-variable GRADIENT histograms ship at summary cadence only
    (reference models/gan.py:148-156 logs every non-BN var and its grad);
    off-cadence steps must not ship gradients off device."""
    hw = (28, 28)
    mcfg = ModelConfig(
        name="gan", input_dims=hw, input_channel=1, n_kernels=8, zed_dim=16
    )
    tcfg = TrainConfig(
        save_dir=str(tmp_path / "s"), log_dir=str(tmp_path / "logs"),
        learning_rate=1e-4, summary_iter=2,
    )
    ds = SyntheticImages(batch_size=8, hw=hw, channels=1, seed=5)
    tr = GANTrainer(None, dataset=ds, model_cfg=mcfg, train_cfg=tcfg)

    calls = []
    tr.summary.histogram = lambda step, tag, values: calls.append(
        (step, tag, np.asarray(values).size)
    )
    tr.train_step()  # step 1: off-cadence (summary_iter=2)
    assert not calls
    tr.train_step()  # step 2: cadence hit -> grads for every non-BN var
    tags = {t for _, t, _ in calls}
    assert any(t.startswith("gen_") or "gen/" in t for t in tags)
    assert any("dis/" in t for t in tags)
    assert all(t.endswith("/grad") for t in tags)
    assert all(n > 0 for _, _, n in calls)
    n_expected = len([k for k in tr.state.params if "_bn" not in k]) + len(
        [k for k in tr.state.adv_params if "_bn" not in k]
    )
    assert len(calls) == n_expected
