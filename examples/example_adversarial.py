"""U-Net + discriminator adversarial training (Luc et al 2016).

Rebuild of the reference's (empty) examples/example_adversarial.py using the
adversarial subsystem (reference models/basemodel.py:278-354; BASELINE.md
config #4): any segmentation model + adversarial_training=True gets the
shared conv adversary at a low learning rate.

  python examples/example_adversarial.py --image-dir data/features \
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
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--crop-size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--adversarial-lr", type=float, default=1e-5)
    ap.add_argument("--save-dir", default="./snapshot/unet_adv")
    ap.add_argument("--log-dir", default=None)
    args = ap.parse_args()

    from segmentation_tpu.core.config import ModelConfig, TrainConfig
    from segmentation_tpu.data import ImageMaskDataSet, SyntheticSegmentation
    from segmentation_tpu.models import SegmentationTrainer, UNet

    hw = (args.crop_size, args.crop_size)
    if args.image_dir:
        dataset = ImageMaskDataSet(
            args.image_dir, args.mask_dir, n_classes=args.n_classes,
            batch_size=args.batch_size, crop_size=args.crop_size,
        )
    else:
        print("no --image-dir: running on synthetic data")
        dataset = SyntheticSegmentation(
            args.batch_size, hw, n_classes=args.n_classes
        )

    mcfg = ModelConfig(
        name="unet", n_classes=args.n_classes, input_dims=hw,
        adversarial_training=True,
    )
    tcfg = TrainConfig(
        save_dir=args.save_dir,
        log_dir=args.log_dir or f"./logs/unet_adv_{int(time.time())}",
        adversarial_lr=args.adversarial_lr,
    )
    trainer = SegmentationTrainer(
        UNet(mcfg), dataset=dataset, test_dataset=dataset,
        model_cfg=mcfg, train_cfg=tcfg,
    )

    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.iters):
            metrics = trainer.train_step()
            if it % 100 == 0:
                trainer.test()
        trainer.snapshot()
        print(f"epoch {epoch}: {time.time() - t0:.1f}s  {metrics}")
    trainer.close()


if __name__ == "__main__":
    main()
