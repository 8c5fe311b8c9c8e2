"""Convolutional (variational) autoencoder on MNIST — CPU-runnable.

Rebuild of the reference driver (reference examples/example_autoencoder.py:
canonical loop at examples/example_fcn.py:104-115 shape): build dataset +
model, run epochs × iters of train_step, test()/dream() periodically,
snapshot() per epoch. Configuration is flags, not hand-edited constants.

  python examples/example_autoencoder.py --iters 200 --epochs 2
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
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--test-every", type=int, default=50)
    ap.add_argument("--zed-dim", type=int, default=16)
    ap.add_argument("--variational", action="store_true", default=True)
    ap.add_argument("--adversarial", action="store_true")
    ap.add_argument("--save-dir", default="./snapshot/autoencoder")
    ap.add_argument("--log-dir", default=None)
    args = ap.parse_args()

    from segmentation_tpu.core.config import ModelConfig, TrainConfig
    from segmentation_tpu.data import MNISTDataSet
    from segmentation_tpu.models import Autoencoder, AutoencoderTrainer

    dataset = MNISTDataSet(args.mnist_dir, args.batch_size)
    test_dataset = MNISTDataSet(args.mnist_dir, args.batch_size, mode="TEST")

    mcfg = ModelConfig(
        name="autoencoder",
        input_dims=(28, 28),
        input_channel=1,
        n_kernels=16,
        zed_dim=args.zed_dim,
        encoder_type="small",
        variational=args.variational,
        autoencoder=True,
        adversarial_training=args.adversarial,
    )
    tcfg = TrainConfig(
        save_dir=args.save_dir,
        log_dir=args.log_dir or f"./logs/autoencoder_{int(time.time())}",
        learning_rate=1e-3,
    )
    trainer = AutoencoderTrainer(
        Autoencoder(mcfg), dataset=dataset, test_dataset=test_dataset,
        model_cfg=mcfg, train_cfg=tcfg,
    )

    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.iters):
            metrics = trainer.train_step()
            if it % args.test_every == 0:
                trainer.test()
                trainer.dream()
        trainer.snapshot()
        print(f"epoch {epoch}: {time.time() - t0:.1f}s  {metrics}")
    trainer.close()


if __name__ == "__main__":
    main()
