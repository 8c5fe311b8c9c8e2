"""U-Net 512×512 with the threaded augmentation pipeline.

Rebuild of reference models/unet.py:24-58 + utils/datasets.py:94-190 usage
(BASELINE.md config #3). The native C++ loader decodes and crops off the
GIL; DevicePrefetcher keeps batches resident in HBM ahead of the step.

  python examples/example_unet.py --image-dir data/features \
      --mask-dir data/labels
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-dir", default=None)
    ap.add_argument("--mask-dir", default=None)
    ap.add_argument("--n-classes", type=int, default=2)
    ap.add_argument("--n-kernels", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--crop-size", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--test-every", type=int, default=100)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--bayesian", action="store_true")
    ap.add_argument("--save-dir", default="./snapshot/unet")
    ap.add_argument("--log-dir", default=None)
    args = ap.parse_args()

    from segmentation_tpu.core.config import ModelConfig, TrainConfig
    from segmentation_tpu.data import (
        DevicePrefetcher,
        ImageMaskDataSet,
        SyntheticSegmentation,
    )
    from segmentation_tpu.data import native
    from segmentation_tpu.models import SegmentationTrainer, UNet

    hw = (args.crop_size, args.crop_size)
    if args.image_dir:
        cls = (
            native.NativeImageMaskDataSet
            if native.available() else ImageMaskDataSet
        )
        dataset = cls(
            args.image_dir, args.mask_dir, n_classes=args.n_classes,
            batch_size=args.batch_size, crop_size=args.crop_size,
            threads=args.threads, augment_flip=True,
        )
    else:
        print("no --image-dir: running on synthetic data")
        dataset = SyntheticSegmentation(
            args.batch_size, hw, n_classes=args.n_classes
        )

    mcfg = ModelConfig(
        name="unet", n_classes=args.n_classes, input_dims=hw,
        n_kernels=args.n_kernels, bayesian=args.bayesian,
    )
    tcfg = TrainConfig(
        save_dir=args.save_dir,
        log_dir=args.log_dir or f"./logs/unet_{int(time.time())}",
    )
    trainer = SegmentationTrainer(
        UNet(mcfg), dataset=DevicePrefetcher(dataset),
        test_dataset=dataset, model_cfg=mcfg, train_cfg=tcfg,
    )

    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.iters):
            metrics = trainer.train_step()
            if it % args.test_every == 0:
                trainer.test()
        trainer.snapshot()
        dt = time.time() - t0
        ips = args.iters * args.batch_size / dt
        print(f"epoch {epoch}: {dt:.1f}s  {ips:.0f} img/s  {metrics}")
    trainer.close()


if __name__ == "__main__":
    main()
