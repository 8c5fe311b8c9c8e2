"""Fast-layout MC-dropout (VERDICT r3 #6): explicit-key dropout at the
two Kendall & Gal sites on the packed serving path.

Reference behavior: ``bayesian=True`` keeps dropout live at inference so
repeated forwards sample the posterior (/root/reference/examples/
inference.py:31-38, models/basemodel.py dropout sites). Here the fast
serving layout (models/unet_fast) takes ``mc_keys=(k_bottleneck,
k_decoder)`` and draws iid Bernoulli masks at the same two sites, so the
estimator matches the standard hk path's.
"""

import jax
import jax.numpy as jnp
import numpy as np

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.models.unet import UNet
from segmentation_tpu.nn import module as hk

HW = (204, 204)


def _params(k=32, seed=0, nc=2, hw=HW, bayesian=False, rate=0.5):
    mcfg = ModelConfig(
        n_classes=nc, input_dims=hw, n_kernels=k, bayesian=bayesian,
        dropout_rate=rate,
    )
    model = UNet(mcfg, levels=4)
    fwd = hk.transform(lambda x: model(x))
    x = jnp.zeros((1, *hw, 3))
    params, _ = fwd.init(jax.random.PRNGKey(seed), x, train=False)
    return mcfg, params, fwd


def _input(seed=1, b=1, hw=HW):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(0.5, 0.25, (b, *hw, 3)).astype(np.float32)
    )


def test_mc_drop_mask_stats():
    """_mc_drop: zeros at ~rate, survivors scaled by 1/keep; PadFlat and
    PF2 wrappers preserve geometry."""
    from segmentation_tpu.models.unet_fast import PF2, PadFlat, _mc_drop

    x = jnp.ones((4, 64, 128), jnp.float32)
    y = _mc_drop(x, jax.random.PRNGKey(0), 0.5)
    frac = float((np.asarray(y) == 0).mean())
    assert 0.4 < frac < 0.6, frac
    nz = np.asarray(y)[np.asarray(y) != 0]
    np.testing.assert_allclose(nz, 2.0, rtol=1e-6)

    pf = PadFlat(x, 8, 7, 8)
    pfd = _mc_drop(pf, jax.random.PRNGKey(1), 0.5)
    assert isinstance(pfd, PadFlat)
    assert (pfd.h, pfd.w, pfd.s) == (8, 7, 8)
    p2 = PF2(x, 8, 13, 8)
    p2d = _mc_drop(p2, jax.random.PRNGKey(1), 0.5)
    assert isinstance(p2d, PF2)
    assert (p2d.h, p2d.w, p2d.s2) == (8, 13, 8)
    # identical key + shape -> identical mask (flat vs wrapped)
    np.testing.assert_array_equal(
        np.asarray(pfd.x), np.asarray(_mc_drop(x, jax.random.PRNGKey(1),
                                                0.5))
    )


def test_mc_keys_rate0_is_identity(monkeypatch):
    """mc_keys threading through the padflat graph: at rate=0 the MC
    forward equals the deterministic forward exactly."""
    from segmentation_tpu.models.unet_fast import UNetS2DInference

    monkeypatch.setenv("SEG_PALLAS_INTERPRET", "1")
    mcfg, params, _ = _params(bayesian=True, rate=0.0)
    x = _input()
    pf = UNetS2DInference(mcfg, padflat=True)
    prepared = pf.prepare(params)
    assert pf._pf_supported(prepared, x)
    want = pf.apply(prepared, x)
    got = pf.apply(prepared, x,
                   mc_keys=jax.random.split(jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mc_padflat_vs_oracle_statistics(monkeypatch):
    """Uncertainty parity (statistical): MC moments from the padflat
    fast path match the XLA oracle path's at matched sample count.
    Masks are iid per element in both paths, so mean maps agree to the
    MC standard error and both paths show real posterior spread."""
    from segmentation_tpu.models.unet_fast import UNetS2DInference
    from segmentation_tpu.training.bayesian import mc_sample_fast

    monkeypatch.setenv("SEG_PALLAS_INTERPRET", "1")
    rate = 0.5
    mcfg, params, _ = _params(bayesian=True, rate=rate)
    x = _input()
    S = 24
    oracle = UNetS2DInference(mcfg, allow_pallas=False, padflat=False)
    pf = UNetS2DInference(mcfg, padflat=True)
    prepared = oracle.prepare(params)
    assert pf._pf_supported(prepared, x)

    s_pf = mc_sample_fast(pf, prepared, jax.random.PRNGKey(5), x, S,
                          samples_per_pass=4)
    s_or = mc_sample_fast(oracle, prepared, jax.random.PRNGKey(9), x, S,
                          samples_per_pass=4)
    assert s_pf.shape == s_or.shape == (S, 1, *s_or.shape[2:])
    m_pf, m_or = np.mean(np.asarray(s_pf), 0), np.mean(np.asarray(s_or), 0)
    v_pf, v_or = np.var(np.asarray(s_pf), 0), np.var(np.asarray(s_or), 0)
    # both paths actually sample (dropout live at inference)
    assert v_pf.max() > 1e-4 and v_or.max() > 1e-4
    # mean maps agree to MC standard error (se <= 0.5/sqrt(S) ~ 0.10;
    # compare at 4 se averaged over pixels via the mean abs delta)
    assert np.abs(m_pf - m_or).mean() < 0.08, np.abs(m_pf - m_or).mean()
    # matched posterior spread, not just matched means
    assert np.abs(v_pf.mean() - v_or.mean()) < 0.5 * max(
        v_pf.mean(), v_or.mean()
    )


def test_trainer_fast_mc_route(monkeypatch, tmp_path):
    """SegmentationTrainer.infer_bayesian routes through the fast layout
    when supported, and the outputs are finite/shaped like the standard
    path's."""
    from segmentation_tpu.core.config import TrainConfig
    from segmentation_tpu.models.base import SegmentationTrainer

    monkeypatch.setenv("SEG_PALLAS_INTERPRET", "1")
    mcfg = ModelConfig(
        n_classes=2, input_dims=HW, n_kernels=32, bayesian=True,
        dropout_rate=0.5,
    )
    model = UNet(mcfg, levels=4)
    tr = SegmentationTrainer(
        model, model_cfg=mcfg,
        train_cfg=TrainConfig(save_dir=str(tmp_path)),
    )
    imgs = np.asarray(_input(), np.float32)
    mean, var, out = tr.infer_bayesian(imgs, n_samples=4,
                                       samples_per_pass=2)
    assert getattr(tr, "_mc_fast_cache", None) is not None  # fast path hit
    assert mean.shape[0] == 1 and out.shape[-1] == 1
    assert np.isfinite(mean).all() and np.isfinite(var).all()
    assert var.max() > 0
    # fast='off' still runs the standard compiled loop
    mean2, var2, out2 = tr.infer_bayesian(
        imgs, n_samples=4, samples_per_pass=2, fast="off"
    )
    assert mean2.shape == mean.shape and out2.shape == out.shape
