"""GAN / CGAN / InfoGAN on MNIST.

Rebuild of reference examples/example_gan.py (batch 128, dream panels to
TensorBoard; reference models/gan.py). ``--label-dim 10`` makes it a CGAN;
``--infogan`` uses the InfoGAN trainer with the mutual-information head.

  python examples/example_gan.py --iters 1000 --epochs 5
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mnist-dir", default="./data/mnist")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--dream-every", type=int, default=100)
    ap.add_argument("--zed-dim", type=int, default=64)
    ap.add_argument("--label-dim", type=int, default=None)
    ap.add_argument("--infogan", action="store_true")
    ap.add_argument("--save-dir", default="./snapshot/gan")
    ap.add_argument("--log-dir", default=None)
    args = ap.parse_args()

    from segmentation_tpu.core.config import ModelConfig, TrainConfig
    from segmentation_tpu.data import MNISTDataSet
    from segmentation_tpu.models import GANTrainer, InfoGANTrainer

    dataset = MNISTDataSet(args.mnist_dir, args.batch_size)
    mcfg = ModelConfig(
        name="infogan" if args.infogan else "gan",
        input_dims=(28, 28), input_channel=1,
        zed_dim=args.zed_dim, label_dim=args.label_dim,
    )
    tcfg = TrainConfig(
        save_dir=args.save_dir,
        log_dir=args.log_dir or f"./logs/gan_{int(time.time())}",
        learning_rate=1e-4,
    )
    cls = InfoGANTrainer if args.infogan else GANTrainer
    trainer = cls(None, dataset=dataset, model_cfg=mcfg, train_cfg=tcfg)

    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.iters):
            metrics = trainer.train_step()
            if it % args.dream_every == 0:
                trainer.dream()
        trainer.snapshot()
        print(f"epoch {epoch}: {time.time() - t0:.1f}s  {metrics}")
    if args.infogan:
        trainer.dream_manifold(c_index=0)
    trainer.close()


if __name__ == "__main__":
    main()
