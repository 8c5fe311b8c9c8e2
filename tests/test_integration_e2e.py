"""Full-system integration tests: real files → native loader → training →
checkpoint → inference; and spatial partitioning over a real zoo model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_tpu.core.config import ModelConfig, TrainConfig
from segmentation_tpu.core.mesh import MeshSpec, make_mesh


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    """A learnable on-disk dataset: bright disc on dark noise, mask = disc."""
    import cv2

    root = tmp_path_factory.mktemp("e2e")
    img_dir, mask_dir = root / "features", root / "labels"
    img_dir.mkdir(), mask_dir.mkdir()
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:96, 0:96]
    for i in range(16):
        cy, cx = rng.integers(24, 72, 2)
        r = rng.integers(10, 22)
        disc = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        img = rng.normal(60, 15, (96, 96, 3)).clip(0, 255)
        img[disc] = rng.normal(190, 15, (int(disc.sum()), 3)).clip(0, 255)
        cv2.imwrite(str(img_dir / f"{i:03d}.jpg"), img.astype(np.uint8))
        cv2.imwrite(
            str(mask_dir / f"{i:03d}.png"),
            (disc * 255).astype(np.uint8),
        )
    return str(img_dir), str(mask_dir)


def test_e2e_native_loader_training_miou(disk_dataset, tmp_path):
    """Native C++ loader → FCN-8s training → mIoU improves → snapshot →
    restore → infer. The README's canonical usage block, end to end."""
    from segmentation_tpu.data import native
    from segmentation_tpu.models import FCN, SegmentationTrainer

    if not native.available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")

    img_dir, mask_dir = disk_dataset
    ds = native.NativeImageMaskDataSet(
        img_dir, mask_dir, batch_size=8, crop_size=64, threads=2, seed=3,
        augment_flip=True,
    )
    mcfg = ModelConfig(name="fcn", n_classes=2, input_dims=(64, 64),
                       n_kernels=8, fcn_type="8s")
    tcfg = TrainConfig(save_dir=str(tmp_path), learning_rate=2e-3, seed=0)
    tr = SegmentationTrainer(FCN(mcfg), dataset=ds, test_dataset=ds,
                             model_cfg=mcfg, train_cfg=tcfg)
    miou0 = tr.test()["miou"]
    for _ in range(40):
        tr.train_step()
    miou1 = tr.test()["miou"]
    assert miou1 > miou0 + 0.05, f"mIoU {miou0:.3f} → {miou1:.3f}"
    tr.snapshot()

    from segmentation_tpu.data import load_images

    paths = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir)
    )
    imgs = load_images(paths, batchsize=4, crop_size=64, seed=1)
    probs, masks = tr.infer(imgs)
    assert masks.shape == (4, 64, 64, 1)
    ds.close()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_spatial_partitioned_fcn_matches_monolithic():
    """Spatial partitioning over a REAL zoo model: FCN-8s on a 2×4 spatial
    mesh with a stride-aligned halo approximates the monolithic output; the
    argmax masks must agree on virtually all interior pixels."""
    from segmentation_tpu.models.fcn import FCN
    from segmentation_tpu.nn import module as hk
    from segmentation_tpu.parallel import spatial_apply

    mesh = make_mesh(MeshSpec(data=1, sph=2, spw=4))
    mcfg = ModelConfig(name="fcn", n_classes=2, input_dims=(128, 256),
                       n_kernels=4, fcn_type="8s")
    model = FCN(mcfg)
    fwd = hk.transform(lambda x: model(x))
    x = jnp.asarray(
        np.random.default_rng(5).normal(0.5, 0.2, (1, 128, 256, 3)).astype(
            np.float32
        )
    )
    params, state = fwd.init(jax.random.PRNGKey(0), x, train=False)
    mono, _ = fwd.apply(params, state, None, x, train=False)
    mono_mask = np.asarray(jnp.argmax(mono, -1))

    def shard_fwd(xs):
        logits, _ = fwd.apply(params, state, None, xs, train=False)
        return logits

    # halo = 32 keeps the stride-32 encoder aligned per shard
    sharded = spatial_apply(shard_fwd, mesh, halo=32, batch_axis=None)(x)
    shard_mask = np.asarray(jnp.argmax(sharded, -1))
    agreement = float((shard_mask == mono_mask).mean())
    assert agreement > 0.95, f"spatial/monolithic agreement {agreement:.3f}"
