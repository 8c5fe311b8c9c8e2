"""Prototyping scratchpad — swap any zoo model into one train loop.

Counterpart of reference examples/prototyping.py:1-179, which documents the
"working towards" API (one dataset, any modelClass, train/test/snapshot/infer
from the same handle) with hand-toggled model blocks. Here the toggle is a
--model flag instead of commented-out constructors, and mid-training
inference (the part the reference left commented at :157-171) actually runs:
after every epoch we infer on a held batch and write the probability maps.

  python examples/prototyping.py --model deconvolution --adversarial
  python examples/prototyping.py --model autoencoder --image-dir data/feature
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_model(name, mcfg):
    """The reference's commented-out constructor blocks, as a table."""
    from segmentation_tpu.models import (
        Autoencoder,
        DeconvModel,
        FCN,
        UNet,
    )

    return {
        "deconvolution": lambda: DeconvModel(mcfg),
        "unet": lambda: UNet(mcfg),
        "fcn": lambda: FCN(mcfg),
        "autoencoder": lambda: Autoencoder(mcfg),
    }[name]()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="autoencoder",
                    choices=["deconvolution", "unet", "fcn", "autoencoder"])
    ap.add_argument("--image-dir", default=None)
    ap.add_argument("--mask-dir", default=None)
    ap.add_argument("--image-ext", default="jpg")
    ap.add_argument("--n-classes", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--crop-size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--test-every", type=int, default=100)
    ap.add_argument("--n-kernels", type=int, default=64)
    ap.add_argument("--learning-rate", type=float, default=1e-4)
    ap.add_argument("--adversarial", action="store_true")
    ap.add_argument("--bayesian", action="store_true")
    ap.add_argument("--experiment", default="auto")
    args = ap.parse_args()

    import numpy as np

    from segmentation_tpu.core.config import ModelConfig, TrainConfig
    from segmentation_tpu.data import (
        ImageMaskDataSet,
        SyntheticSegmentation,
        load_images,
    )
    from segmentation_tpu.models import (
        AutoencoderTrainer,
        SegmentationTrainer,
    )

    hw = (args.crop_size, args.crop_size)
    if args.image_dir:
        dataset = ImageMaskDataSet(
            args.image_dir, args.mask_dir, image_ext=args.image_ext,
            n_classes=args.n_classes, batch_size=args.batch_size,
            crop_size=args.crop_size, capacity=args.batch_size * 10,
            min_holding=args.batch_size * 5, threads=8,
        )
        img_list = sorted(
            os.path.join(args.image_dir, f)
            for f in os.listdir(args.image_dir)
            if f.endswith(args.image_ext)
        )
    else:
        print("no --image-dir: running on synthetic data")
        dataset = SyntheticSegmentation(
            args.batch_size, hw, n_classes=args.n_classes
        )
        img_list = None

    itert = time.strftime("%Y_%m_%d_%H_%M_%S")
    mcfg = ModelConfig(
        name=args.model, n_classes=args.n_classes, input_dims=hw,
        n_kernels=args.n_kernels, bayesian=args.bayesian,
        adversarial_training=args.adversarial,
        autoencoder=args.model == "autoencoder",
    )
    tcfg = TrainConfig(
        learning_rate=args.learning_rate,
        save_dir=f"./{args.experiment}/snapshots",
        log_dir=f"./{args.experiment}/logs/{itert}",
    )
    model = build_model(args.model, mcfg)
    trainer_cls = (
        AutoencoderTrainer if args.model == "autoencoder"
        else SegmentationTrainer
    )
    network = trainer_cls(
        model, dataset=dataset, model_cfg=mcfg, train_cfg=tcfg
    )

    inference_dir = f"./{args.experiment}/inference"
    os.makedirs(inference_dir, exist_ok=True)

    tstart = time.time()
    for epoch in range(args.epochs):
        t_outer = time.time()
        for k in range(args.iters):
            network.train_step()
            if k % args.test_every == 0:
                network.test()
        print(f"Time: {time.time() - t_outer:.1f}s")
        network.snapshot()

        # INFERENCE MODE, from the live training handle — the reference's
        # commented block (prototyping.py:157-171), made real.
        if img_list:
            img_tensor = load_images(
                img_list, args.batch_size, args.crop_size
            )
        else:
            img_tensor = np.asarray(
                dataset.get_batch()["image"], np.float32
            )
        probs = np.asarray(network.infer(img_tensor)[0])
        for k in range(min(8, probs.shape[0])):
            out = (np.squeeze(probs[k, :, :, -1]) * 255).astype(np.uint8)
            src = (img_tensor[k] * 255).astype(np.uint8)
            try:
                import cv2

                cv2.imwrite(os.path.join(inference_dir, f"{k}.jpg"), out)
                cv2.imwrite(
                    os.path.join(inference_dir, f"{k}_.jpg"),
                    src[:, :, ::-1],
                )
            except ImportError:
                np.save(os.path.join(inference_dir, f"{k}.npy"), out)

    print(f"Time: {time.time() - tstart:.1f}s")
    print("Done")
    network.close()


if __name__ == "__main__":
    main()
