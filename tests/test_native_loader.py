"""Native C++ loader tests: build, shapes, determinism, decode parity, and
throughput sanity vs the Python loader."""

import os
import time

import numpy as np
import pytest

from segmentation_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native loader unavailable: {native.build_error()}",
)


@pytest.fixture(scope="module")
def folder_pair(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("native_data")
    img_dir, mask_dir = root / "features", root / "labels"
    img_dir.mkdir(), mask_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(10):
        img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
        mask = np.zeros((64, 80, 1), np.uint8)
        mask[8 : 20 + i, 10:40] = 255
        cv2.imwrite(str(img_dir / f"{i:03d}.jpg"), img)
        cv2.imwrite(str(mask_dir / f"{i:03d}.png"), mask)
    return str(img_dir), str(mask_dir)


def test_native_batches(folder_pair):
    img_dir, mask_dir = folder_pair
    ds = native.NativeImageMaskDataSet(
        img_dir, mask_dir, batch_size=4, crop_size=32, threads=2, seed=1
    )
    b = ds.get_batch()
    assert b["image"].shape == (4, 32, 32, 3)
    assert b["image"].dtype == np.float32
    assert 0.0 <= b["image"].min() and b["image"].max() <= 1.0
    assert b["mask"].shape == (4, 32, 32, 1)
    assert set(np.unique(b["mask"])).issubset({0, 1})
    ds.close()


def test_native_determinism(folder_pair):
    img_dir, mask_dir = folder_pair

    def stream():
        ds = native.NativeImageMaskDataSet(
            img_dir, mask_dir, batch_size=6, crop_size=32, threads=3, seed=9
        )
        b = ds.get_batch()
        ds.close()
        return b

    b1, b2 = stream(), stream()
    np.testing.assert_array_equal(b1["image"], b2["image"])
    np.testing.assert_array_equal(b1["mask"], b2["mask"])


def test_native_png_decode_parity(folder_pair, tmp_path):
    """C++ libpng decode must match cv2's pixels exactly (PNG lossless)."""
    import cv2

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    p = str(tmp_path / "img.png")
    cv2.imwrite(p, img[:, :, ::-1])  # cv2 writes BGR

    ds = native.NativeImageMaskDataSet(
        str(tmp_path), None, image_names=[p], mask_names=None,
        batch_size=1, crop_size=40, threads=1, seed=0,
    )
    ds.has_masks = False
    b = {"image": ds._img_buf}
    import ctypes

    rc = ds._lib.sdl_next_batch(
        ds._handle,
        ds._img_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8)),
    )
    assert rc == 0
    got = (ds._img_buf[0] * 255.0).round().astype(np.uint8)
    np.testing.assert_array_equal(got, img)
    ds.close()


def test_native_image_only(folder_pair):
    img_dir, _ = folder_pair
    ds = native.NativeImageDataSet(
        img_dir, batch_size=3, crop_size=24, threads=2, seed=2
    )
    b = ds.get_batch()
    assert b["image"].shape == (3, 24, 24, 3)
    assert "mask" not in b
    ds.close()


def test_native_throughput_smoke(folder_pair):
    """Native loader should stream at least a few hundred crops/sec on tiny
    files (a loose sanity bound, not a benchmark)."""
    img_dir, mask_dir = folder_pair
    ds = native.NativeImageMaskDataSet(
        img_dir, mask_dir, batch_size=16, crop_size=32, threads=4, seed=5
    )
    ds.get_batch()  # warm
    t0 = time.perf_counter()
    n = 0
    for _ in range(10):
        ds.get_batch()
        n += 16
    rate = n / (time.perf_counter() - t0)
    ds.close()
    assert rate > 100, f"native loader too slow: {rate:.0f} crops/s"


def test_native_uint8_staging_parity(folder_pair):
    """uint8_images=True must serve the SAME crops as the float path (same
    seed → same stream), just unnormalized — and a trainer fed uint8 batches
    normalizes on device and trains."""
    img_dir, mask_dir = folder_pair
    kw = dict(batch_size=4, crop_size=32, threads=2, seed=9)
    ds_f = native.NativeImageMaskDataSet(img_dir, mask_dir, **kw)
    ds_u = native.NativeImageMaskDataSet(
        img_dir, mask_dir, uint8_images=True, **kw
    )
    for _ in range(3):
        bf, bu = ds_f.get_batch(), ds_u.get_batch()
        assert bu["image"].dtype == np.uint8
        np.testing.assert_allclose(
            bu["image"].astype(np.float32) / 255.0, bf["image"],
            atol=1e-6,
        )
        np.testing.assert_array_equal(bu["mask"], bf["mask"])
    ds_f.close()

    # uint8-fed training: the trainer's device-side /255 kicks in
    from segmentation_tpu.core.config import ModelConfig, TrainConfig
    from segmentation_tpu.models.base import SegmentationTrainer
    from segmentation_tpu.models.fcn import FCN

    mcfg = ModelConfig(n_classes=2, input_dims=(32, 32), n_kernels=4)
    tr = SegmentationTrainer(
        FCN(mcfg), dataset=ds_u, model_cfg=mcfg,
        train_cfg=TrainConfig(save_dir="/tmp/u8snap", learning_rate=1e-3),
    )
    m = tr.train_step()
    assert np.isfinite(m["seg_xentropy"])
    ds_u.close()
