"""CLI smoke tests on synthetic data (the L5 driver layer, SURVEY §1)."""

import numpy as np
import pytest

from segmentation_tpu.cli.main import build_trainer, main


class Args:
    """Minimal args namespace mirroring the CLI defaults."""

    def __init__(self, **kw):
        defaults = dict(
            model="unet", n_classes=2, input_channel=3, n_kernels=4,
            crop_size=60, batch_size=4, learning_rate=1e-3, fcn_type="8s",
            encoder_type="small", zed_dim=16, label_dim=None,
            variational=False, bayesian=False, autoencoder=False,
            adversarial_training=False, save_dir=None, log_dir=None,
            load_snapshot=False, load_snapshot_from=None, seed=0,
            image_dir=None, mask_dir=None, image_ext="jpg", mask_ext="png",
            capacity=64, min_holding=8, threads=2, data_seed=1,
            augment_flip=False, mnist_dir=None,
        )
        defaults.update(kw)
        for k, v in defaults.items():
            setattr(self, k, v)


def test_build_trainer_native_uint8(tmp_path):
    """--native-loader --uint8-staging through the CLI factory: uint8
    batches feed the trainer, which normalizes on device."""
    import os

    from segmentation_tpu.data import native as native_mod

    if not native_mod.available():
        pytest.skip(f"native loader unavailable: {native_mod.build_error()}")
    import cv2

    img_dir = tmp_path / "f"
    mask_dir = tmp_path / "l"
    img_dir.mkdir(), mask_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        cv2.imwrite(
            str(img_dir / f"{i}.jpg"),
            rng.integers(0, 255, (80, 80, 3), dtype=np.uint8),
        )
        cv2.imwrite(
            str(mask_dir / f"{i}.png"),
            rng.integers(0, 2, (80, 80), dtype=np.uint8) * 255,
        )
    args = Args(
        model="fcn", crop_size=64, batch_size=2,
        image_dir=str(img_dir), mask_dir=str(mask_dir),
        save_dir=str(tmp_path / "snap"),
        native_loader=True, uint8_staging=True,
    )
    tr = build_trainer(args)
    assert tr.dataset.get_batch()["image"].dtype == np.uint8
    m = tr.train_step()
    assert all(np.isfinite(v) for v in m.values()), m



@pytest.mark.parametrize(
    "model,kw",
    [
        ("unet", {"crop_size": 204, "batch_size": 2}),
        ("fcn", {"crop_size": 64}),
        ("deconvolution", {"crop_size": 192}),  # min viable ~160 (empty-conv guard)
        ("template", {"crop_size": 32}),
        ("autoencoder", {"crop_size": 28, "input_channel": 1}),
        ("gan", {"crop_size": 28, "input_channel": 1, "batch_size": 8}),
        ("infogan", {"crop_size": 28, "input_channel": 1, "batch_size": 8}),
    ],
)
def test_build_trainer_and_step(tmp_path, model, kw):
    args = Args(model=model, save_dir=str(tmp_path), **kw)
    tr = build_trainer(args)
    m = tr.train_step()
    assert all(np.isfinite(v) for v in m.values()), m


def test_cli_unet_uses_s2d_for_even_inputs(tmp_path):
    from segmentation_tpu.models.unet_fast import UNetS2D

    tr = build_trainer(
        Args(model="unet", crop_size=204, batch_size=2,
             save_dir=str(tmp_path))
    )
    tr2 = None
    assert isinstance(tr.model, UNetS2D)


def test_cli_train_command(tmp_path):
    rc = main([
        "train", "--model", "template", "--crop-size", "32",
        "--batch-size", "4", "--n-kernels", "2", "--epochs", "1",
        "--iters", "3", "--test-every", "2", "--save-dir", str(tmp_path),
    ])
    assert rc is None
    from segmentation_tpu.utils import checkpoint as ckpt

    assert ckpt.latest_checkpoint(str(tmp_path)) is not None


def test_cli_infer_int8(tmp_path):
    """--int8 serving path end-to-end: train a tiny unet, then infer
    through the calibrated int8 path (XLA fallback kernels on CPU) and
    check the written masks."""
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(
            str(img_dir / f"{i}.jpg"),
            rng.integers(0, 255, (200, 200, 3), dtype=np.uint8),
        )
    snap = tmp_path / "snap"
    rc = main([
        "train", "--model", "unet", "--crop-size", "188",
        "--batch-size", "2", "--n-kernels", "4", "--epochs", "1",
        "--iters", "2", "--test-every", "5",
        "--image-dir", str(img_dir), "--mask-dir", str(img_dir),
        "--mask-ext", "jpg", "--save-dir", str(snap),
    ])
    assert rc is None
    out = tmp_path / "pred"
    rc = main([
        "infer", "--model", "unet", "--crop-size", "188",
        "--batch-size", "4", "--n-kernels", "4", "--int8",
        "--image-dir", str(img_dir), "--save-dir", str(snap),
        "--out-dir", str(out),
    ])
    assert rc is None
    masks = sorted(out.glob("*_mask.png"))
    assert len(masks) == 4
    m = cv2.imread(str(masks[0]), 0)
    assert m is not None and set(np.unique(m)) <= {0, 255}
