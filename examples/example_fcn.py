"""FCN-8s segmentation on folder image/mask pairs at 256×256.

Rebuild of reference examples/example_fcn.py (data layout Readme.md:68-78:
features/*.jpg + labels/*.png). Without --image-dir it runs on synthetic
data so the example is executable anywhere.

  python examples/example_fcn.py --image-dir data/features \
      --mask-dir data/labels --epochs 5 --iters 1000
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
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--crop-size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--test-every", type=int, default=100)
    ap.add_argument("--fcn-type", default="8s", choices=["32s", "16s", "8s"])
    ap.add_argument("--adversarial", action="store_true")
    ap.add_argument("--native-loader", action="store_true", default=True)
    ap.add_argument("--save-dir", default="./snapshot/fcn")
    ap.add_argument("--log-dir", default=None)
    args = ap.parse_args()

    from segmentation_tpu.core.config import ModelConfig, TrainConfig
    from segmentation_tpu.data import (
        DevicePrefetcher,
        ImageMaskDataSet,
        SyntheticSegmentation,
    )
    from segmentation_tpu.data import native
    from segmentation_tpu.models import FCN, SegmentationTrainer

    hw = (args.crop_size, args.crop_size)
    if args.image_dir:
        cls = (
            native.NativeImageMaskDataSet
            if args.native_loader and native.available()
            else ImageMaskDataSet
        )
        dataset = cls(
            args.image_dir, args.mask_dir, n_classes=args.n_classes,
            batch_size=args.batch_size, crop_size=args.crop_size,
        )
    else:
        print("no --image-dir: running on synthetic data")
        dataset = SyntheticSegmentation(
            args.batch_size, hw, n_classes=args.n_classes
        )

    mcfg = ModelConfig(
        name="fcn", n_classes=args.n_classes, input_dims=hw,
        fcn_type=args.fcn_type, adversarial_training=args.adversarial,
    )
    tcfg = TrainConfig(
        save_dir=args.save_dir,
        log_dir=args.log_dir or f"./logs/fcn_{int(time.time())}",
    )
    trainer = SegmentationTrainer(
        FCN(mcfg), dataset=DevicePrefetcher(dataset),
        test_dataset=dataset, model_cfg=mcfg, train_cfg=tcfg,
    )

    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.iters):
            metrics = trainer.train_step()
            if it % args.test_every == 0:
                trainer.test()
        trainer.snapshot()
        print(f"epoch {epoch}: {time.time() - t0:.1f}s  {metrics}")
    trainer.close()


if __name__ == "__main__":
    main()
