"""Bayesian MC-dropout inference with uncertainty maps.

Rebuild of reference examples/inference.py:30-61 (BASELINE.md config #5):
restore a trained model, run stochastic forward passes over input tiles,
write mask + per-pixel uncertainty images. With multiple devices and a
SAME-padded model, the 1024×1024 tile path goes through spatial
partitioning with halo exchange (segmentation_tpu.parallel.spatial).

  python examples/inference.py --image-dir imgs/ --save-dir snapshot/unet \
      --mc-samples 16 --out-dir pred/
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-dir", default=None)
    ap.add_argument("--model", default="unet",
                    choices=["unet", "fcn", "deconvolution"])
    ap.add_argument("--n-classes", type=int, default=2)
    ap.add_argument("--crop-size", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--mc-samples", type=int, default=16)
    ap.add_argument("--save-dir", default="./snapshot/unet")
    ap.add_argument("--out-dir", default="./pred")
    ap.add_argument("--spatial", action="store_true",
                    help="shard H/W over the device mesh with halo exchange "
                         "(fcn/deconvolution: interior-exact; unet: the "
                         "VALID overlap-tile path, exact everywhere)")
    ap.add_argument("--halo", type=int, default=32,
                    help="halo radius for SAME models; the VALID U-Net "
                         "path derives its exact halo automatically")
    args = ap.parse_args()

    from segmentation_tpu.core.config import ModelConfig, TrainConfig
    from segmentation_tpu.data import load_images
    from segmentation_tpu.models import (
        DeconvModel,
        FCN,
        SegmentationTrainer,
        UNet,
    )

    hw = (args.crop_size, args.crop_size)
    mcfg = ModelConfig(
        name=args.model, n_classes=args.n_classes, input_dims=hw,
        bayesian=True,
    )
    # INFERENCE mode forces snapshot restore (reference basemodel.py:53-55)
    tcfg = TrainConfig(mode="INFERENCE", save_dir=args.save_dir)
    model = {"unet": UNet, "fcn": FCN, "deconvolution": DeconvModel}[
        args.model
    ](mcfg)

    class _Feed:  # inference needs no dataset; keep ctor parity
        batch_size = args.batch_size
        has_masks = False
        use_feed = True

        def get_batch(self):
            raise RuntimeError("inference mode")

    trainer = SegmentationTrainer(
        model, dataset=_Feed(), model_cfg=mcfg, train_cfg=tcfg
    )

    if args.image_dir:
        paths = sorted(
            os.path.join(args.image_dir, f)
            for f in os.listdir(args.image_dir)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )
        imgs = load_images(paths, args.batch_size, args.crop_size, seed=0)
    else:
        print("no --image-dir: using random tiles")
        imgs = np.random.default_rng(0).random(
            (args.batch_size, *hw, 3), dtype=np.float32
        )

    if args.spatial:
        # Giant-tile path: H/W sharded over ('sph','spw') with ppermute halo
        # exchange (segmentation_tpu.parallel.spatial).
        import jax
        import jax.numpy as jnp

        from segmentation_tpu.core.mesh import MeshSpec, make_mesh
        from segmentation_tpu.parallel import (
            spatial_infer_bayesian,
            spatial_infer_bayesian_valid,
        )

        n_dev = len(jax.devices())
        if args.model == "unet" and n_dev % 4 == 0:
            # VALID path needs 2^levels-aligned shards — a square spatial
            # mesh keeps shards as large (and aligned) as possible.
            sph = spw = 2
        else:
            sph = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
            spw = max(1, n_dev // sph) if n_dev % max(1, sph) == 0 else 1
        mesh = make_mesh(MeshSpec(data=n_dev // (sph * spw), sph=sph,
                                  spw=spw))

        def apply_fn(params, model_state, rng, x):
            out, _ = trainer._fwd.apply(
                params, model_state, rng,
                x.astype(trainer.policy.compute_dtype), train=False,
            )
            return out[0] if isinstance(out, tuple) else out

        if args.model == "unet":
            # VALID overlap-tile path: pooling-grid-aligned halo derived
            # from the model's shrinkage; exact vs monolithic everywhere.
            run = spatial_infer_bayesian_valid(
                apply_fn, trainer.state.params, trainer.state.model_state,
                mesh, model.output_hw, levels=model.levels,
                n_samples=args.mc_samples, batch_axis=None,
            )
        else:
            halo = min(
                args.halo,
                imgs.shape[1] // max(1, sph),
                imgs.shape[2] // max(1, spw),
            )
            if halo != args.halo:
                print(f"halo clamped to {halo} (shard size limit)")
            run = spatial_infer_bayesian(
                apply_fn, trainer.state.params, trainer.state.model_state,
                mesh, halo=halo, n_samples=args.mc_samples,
            )
        mean, var = run(jax.random.PRNGKey(0), jnp.asarray(imgs))
        mean, var = np.asarray(mean), np.asarray(var)
        output = np.argmax(mean, axis=-1)[..., None].astype(np.float32)
    else:
        mean, var, output = trainer.infer_bayesian(imgs, args.mc_samples)
    os.makedirs(args.out_dir, exist_ok=True)
    try:
        import cv2

        for i in range(len(imgs)):
            cv2.imwrite(
                os.path.join(args.out_dir, f"{i:04d}_mask.png"),
                (output[i, :, :, 0] * 255).astype(np.uint8),
            )
            u = var[i].mean(-1)
            u = (255 * u / max(float(u.max()), 1e-8)).astype(np.uint8)
            cv2.imwrite(
                os.path.join(args.out_dir, f"{i:04d}_uncertainty.png"), u
            )
    except ImportError:
        np.savez(os.path.join(args.out_dir, "outputs.npz"),
                 mean=mean, var=var, mask=output)
    print(f"wrote {len(imgs)} mask+uncertainty pairs to {args.out_dir}")


if __name__ == "__main__":
    main()
