"""Pallas fused-augmentation kernel: interpret-mode parity vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from segmentation_tpu.nn.pallas.augment import (
    fused_augment,
    pallas_crop_normalize,
)


def test_crop_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (3, 24, 32, 3), dtype=np.uint8)
    ys = np.array([0, 5, 8], np.int32)
    xs = np.array([8, 0, 16], np.int32)
    flips = np.array([0, 1, 0], np.int32)
    out = pallas_crop_normalize(
        jnp.asarray(imgs), jnp.asarray(ys), jnp.asarray(xs),
        jnp.asarray(flips), crop=16, interpret=True,
    )
    out = np.asarray(out)
    for i in range(3):
        want = imgs[i, ys[i] : ys[i] + 16, xs[i] : xs[i] + 16].astype(
            np.float32
        ) / 255.0
        if flips[i]:
            want = want[:, ::-1]
        np.testing.assert_allclose(out[i], want, atol=1e-6)


def test_fused_augment_pairs_image_and_mask():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (4, 40, 40, 3), dtype=np.uint8)
    masks = rng.integers(0, 3, (4, 40, 40, 1), dtype=np.uint8)
    out_i, out_m = fused_augment(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(masks),
        crop=32, flip=True, interpret=True,
    )
    assert out_i.shape == (4, 32, 32, 3)
    assert out_m.shape == (4, 32, 32, 1)
    assert out_m.dtype == jnp.uint8
    assert set(np.unique(np.asarray(out_m))).issubset({0, 1, 2})
    # joint transform: find each mask crop inside the original to confirm the
    # same offsets were applied to images (exhaustive match)
    for i in range(4):
        found = False
        mc = np.asarray(out_m)[i, :, :, 0]
        for y in range(9):
            for x in range(0, 9, 8):
                win = masks[i, y : y + 32, x : x + 32, 0]
                if np.array_equal(win, mc) or np.array_equal(
                    win[:, ::-1], mc
                ):
                    ic = np.asarray(out_i)[i]
                    wi = imgs[i, y : y + 32, x : x + 32].astype(np.float32) / 255
                    if np.allclose(ic, wi, atol=1e-5) or np.allclose(
                        ic, wi[:, ::-1], atol=1e-5
                    ):
                        found = True
                        break
            if found:
                break
        assert found, f"sample {i}: image/mask crops misaligned"
