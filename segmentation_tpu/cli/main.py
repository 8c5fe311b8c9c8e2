"""Typed CLI — replaces the reference's hand-edited driver constants
(reference examples/example_fcn.py:33-50 had no argparse anywhere; SURVEY §5
'config system': the constructor kwargs ARE the public config surface, here
exposed as flags with identical names).

Usage:
  python -m segmentation_tpu train --model unet --image-dir data/features \
      --mask-dir data/labels --crop-size 512 --batch-size 16 \
      --epochs 10 --iters 1000 --save-dir ./snapshot --log-dir ./logs
  python -m segmentation_tpu infer --model unet --image-dir imgs/ \
      --save-dir ./snapshot --out-dir ./pred
  python -m segmentation_tpu bench
"""

from __future__ import annotations

import argparse
import os
import time


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--model", default="unet",
                   choices=["unet", "fcn", "deconvolution", "autoencoder",
                            "gan", "infogan", "template"])
    p.add_argument("--n-classes", type=int, default=2)
    p.add_argument("--input-channel", type=int, default=3)
    p.add_argument("--n-kernels", type=int, default=32)
    p.add_argument("--crop-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--fcn-type", default="8s", choices=["32s", "16s", "8s"])
    p.add_argument("--encoder-type", default="stacked",
                   choices=["stacked", "multiscale", "small"])
    p.add_argument("--zed-dim", type=int, default=64)
    p.add_argument("--label-dim", type=int, default=None)
    p.add_argument("--variational", action="store_true")
    p.add_argument("--bayesian", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="INFERENCE: serve the U-Net through the "
                        "calibrated int8 Pallas path (padflat/pf2 "
                        "kernels on TPU; ~1.5x bf16 throughput at "
                        ">=98.5%% mask agreement)")
    p.add_argument("--autoencoder", action="store_true")
    p.add_argument("--adversarial-training", action="store_true")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="split each batch into k microbatches inside the "
                        "jitted step and apply one averaged update — "
                        "trains batches past the per-chip memory wall")
    p.add_argument("--adversarial-update-every", type=int, default=1,
                   help="update the Luc adversary every k-th step (low "
                        "update frequency, reference Readme.md:86)")
    p.add_argument("--save-dir", default="./snapshot")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--load-snapshot", action="store_true")
    p.add_argument("--load-snapshot-from", default=None)
    p.add_argument("--seed", type=int, default=0)
    # data
    p.add_argument("--image-dir", default=None)
    p.add_argument("--mask-dir", default=None)
    p.add_argument("--image-ext", default="jpg")
    p.add_argument("--mask-ext", default="png")
    p.add_argument("--capacity", type=int, default=5000)
    p.add_argument("--min-holding", type=int, default=1250)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--data-seed", type=int, default=5555)
    p.add_argument("--augment-flip", action="store_true")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="scan N optimizer steps per device dispatch "
                        "(Trainer.train_steps) — amortizes dispatch latency "
                        "for small models")
    p.add_argument("--native-loader", action="store_true",
                   help="use the C++ decode/crop worker pool (csrc/) "
                        "instead of the Python threaded loader")
    p.add_argument("--uint8-staging", action="store_true",
                   help="with --native-loader: ship raw uint8 crops to the "
                        "device (4x less transfer); /255 happens on device")
    p.add_argument("--mnist-dir", default=None,
                   help="use MNISTDataSet from this dir instead of folders")


def _configs(args):
    from segmentation_tpu.core.config import ModelConfig, TrainConfig

    autoencoder = args.autoencoder or args.model in ("autoencoder", "gan",
                                                     "infogan")
    mcfg = ModelConfig(
        name=args.model,
        n_classes=args.n_classes,
        input_dims=(args.crop_size, args.crop_size),
        input_channel=args.input_channel,
        n_kernels=args.n_kernels,
        fcn_type=args.fcn_type,
        zed_dim=args.zed_dim,
        encoder_type=args.encoder_type,
        variational=args.variational,
        label_dim=args.label_dim,
        bayesian=args.bayesian,
        autoencoder=autoencoder,
        adversarial_training=args.adversarial_training,
    )
    tcfg = TrainConfig(
        mode=getattr(args, "mode", "TRAINING"),
        log_dir=args.log_dir,
        save_dir=args.save_dir,
        learning_rate=args.learning_rate,
        load_snapshot=args.load_snapshot,
        load_snapshot_from=args.load_snapshot_from,
        seed=args.seed,
        adversarial_update_every=getattr(
            args, "adversarial_update_every", 1
        ),
        grad_accum=getattr(args, "grad_accum", 1),
    )
    return mcfg, tcfg


def _dataset(args, mcfg):
    from segmentation_tpu.data import (
        ImageDataSet,
        ImageMaskDataSet,
        MNISTDataSet,
        SyntheticImages,
        SyntheticSegmentation,
    )

    if args.mnist_dir is not None:
        return MNISTDataSet(args.mnist_dir, args.batch_size)
    # Inference never reads masks (cmd_infer loads images itself; the
    # dataset only sizes the model) — don't demand --mask-dir there.
    inference = getattr(args, "mode", "TRAINING") == "INFERENCE"
    needs_masks = not inference and args.model in (
        "unet", "fcn", "deconvolution", "template"
    )
    if args.image_dir is None:
        hw = (args.crop_size, args.crop_size)
        if needs_masks:
            return SyntheticSegmentation(args.batch_size, hw,
                                         args.input_channel, args.n_classes)
        return SyntheticImages(args.batch_size, hw, args.input_channel)
    common = dict(
        batch_size=args.batch_size,
        crop_size=args.crop_size,
        capacity=args.capacity,
        min_holding=args.min_holding,
        threads=args.threads,
        seed=args.data_seed,
        augment_flip=args.augment_flip,
        image_ext=args.image_ext,
    )
    if getattr(args, "native_loader", False):
        from segmentation_tpu.data import native

        if not native.available():
            raise SystemExit(
                f"--native-loader: build failed: {native.build_error()}"
            )
        common["uint8_images"] = getattr(args, "uint8_staging", False)
        common.pop("min_holding", None)
        if needs_masks:
            if args.mask_dir is None:
                raise SystemExit(
                    "--mask-dir required for segmentation models"
                )
            return native.NativeImageMaskDataSet(
                args.image_dir, args.mask_dir, n_classes=args.n_classes,
                mask_ext=args.mask_ext, **common,
            )
        return native.NativeImageDataSet(
            args.image_dir, n_classes=args.n_classes, **common
        )
    if needs_masks:
        if args.mask_dir is None:
            raise SystemExit("--mask-dir required for segmentation models")
        return ImageMaskDataSet(
            args.image_dir, args.mask_dir, n_classes=args.n_classes,
            mask_ext=args.mask_ext, **common,
        )
    return ImageDataSet(args.image_dir, n_classes=args.n_classes, **common)


def build_trainer(args, dataset=None, test_dataset=None):
    """Model-name → (model, trainer) factory shared by train/infer."""
    from segmentation_tpu.models import (
        Autoencoder,
        AutoencoderTrainer,
        DeconvModel,
        FCN,
        GANTrainer,
        InfoGANTrainer,
        SegmentationTrainer,
        Template,
        UNet,
    )

    mcfg, tcfg = _configs(args)
    dataset = dataset if dataset is not None else _dataset(args, mcfg)
    kwargs = dict(dataset=dataset, test_dataset=test_dataset,
                  model_cfg=mcfg, train_cfg=tcfg)
    name = args.model
    if name == "unet":
        # even-sized inputs take the space-to-depth fast path (exact parity;
        # models/unet_fast.py) — measurably faster on TPU. Bayesian mode is
        # supported there too (same MC-dropout sites as the standard UNet).
        h, w = mcfg.hw
        from segmentation_tpu.models import UNetS2D

        use_s2d = h % 2 == 0 and w % 2 == 0
        model = UNetS2D(mcfg) if use_s2d else UNet(mcfg)
        return SegmentationTrainer(model, **kwargs)
    if name == "fcn":
        return SegmentationTrainer(FCN(mcfg), **kwargs)
    if name == "deconvolution":
        return SegmentationTrainer(DeconvModel(mcfg), **kwargs)
    if name == "template":
        return SegmentationTrainer(Template(mcfg), **kwargs)
    if name == "autoencoder":
        return AutoencoderTrainer(Autoencoder(mcfg), **kwargs)
    if name == "gan":
        return GANTrainer(None, **kwargs)
    if name == "infogan":
        return InfoGANTrainer(None, **kwargs)
    raise SystemExit(f"unknown model {name}")


def cmd_train(args):
    trainer = build_trainer(args)
    spd = max(1, args.steps_per_dispatch)
    print(f"Training {args.model} for {args.epochs} x {args.iters} steps")
    t_start = time.time()
    # Test cadence: fire test() every `test_every` optimizer steps (first
    # at step 1, like the reference's step_start eval). A monotone
    # next-test counter replaces modulo arithmetic, which misfired on
    # ragged final windows; a dispatch window crossing several cadence
    # points fires test() once (it evaluates current params — repeating
    # it at the same step would be identical).
    next_test_at = 1  # reference runs test at the first step (step_start)
    for epoch in range(args.epochs):
        t_epoch = time.time()
        it = 0
        while it < args.iters:
            if spd > 1:
                n = min(spd, args.iters - it)
                metrics = trainer.train_steps(n)
                it += n
            else:
                metrics = trainer.train_step()
                it += 1
            done = epoch * args.iters + it  # global optimizer steps done
            if done >= next_test_at:
                trainer.test()
                while next_test_at <= done:
                    next_test_at += args.test_every
        trainer.snapshot()
        print(
            f"epoch {epoch}: {time.time() - t_epoch:.1f}s last={metrics}"
        )
    print(f"total {time.time() - t_start:.1f}s")
    trainer.close()


def cmd_infer(args):
    import numpy as np

    from segmentation_tpu.data import load_images

    args.mode = "INFERENCE"
    trainer = build_trainer(args)
    paths = sorted(
        os.path.join(args.image_dir, f)
        for f in os.listdir(args.image_dir)
        if f.endswith(args.image_ext)
    )
    imgs = load_images(paths, args.batch_size, args.crop_size, seed=args.seed)
    if args.bayesian:
        mean, var, output = trainer.infer_bayesian(
            imgs, args.mc_samples,
            samples_per_pass=args.mc_samples_per_pass,
            fast=getattr(args, "mc_fast", "auto"),
        )
        outputs = {"mean": mean, "var": var, "mask": output}
    elif args.int8:
        # calibrated int8 serving (models/unet_int8): quantize the
        # restored weights, calibrate activation scales on the inference
        # images themselves, and run the packed-head argmax path
        if args.model != "unet":
            raise SystemExit("--int8 serving supports --model unet")
        import jax
        import jax.numpy as jnp

        from segmentation_tpu.models.unet_int8 import UNetS2DInt8

        q = UNetS2DInt8(trainer.mcfg)
        params = jax.device_get(trainer.state.params)
        calib = [jnp.asarray(imgs[: min(8, len(imgs))])]
        prepared = q.prepare(params, calib_batches=calib)
        # prepared rides the closure: the quant dispatch reads the
        # calibrated scales as static values at trace time
        mask = np.asarray(
            jax.jit(lambda x: q.apply_argmax(prepared, x))(
                jnp.asarray(imgs)
            )
        )
        outputs = {"mask": mask[..., None]}
    else:
        y_hat_sig, output = trainer.infer(imgs)
        outputs = {"prob": y_hat_sig, "mask": output}
    os.makedirs(args.out_dir, exist_ok=True)
    try:
        import cv2

        for i in range(len(imgs)):
            cv2.imwrite(
                os.path.join(args.out_dir, f"{i:04d}_mask.png"),
                (outputs["mask"][i, :, :, 0]
                 * (255 // max(1, args.n_classes - 1))).astype(np.uint8),
            )
            if "var" in outputs:
                v = outputs["var"][i].mean(-1)
                v = (255 * v / max(v.max(), 1e-8)).astype(np.uint8)
                cv2.imwrite(
                    os.path.join(args.out_dir, f"{i:04d}_uncertainty.png"), v
                )
    except ImportError:
        np.savez(os.path.join(args.out_dir, "outputs.npz"), **outputs)
    print(f"wrote {len(imgs)} outputs to {args.out_dir}")


def cmd_bench(args):
    import runpy

    runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "..", "bench.py"),
        run_name="__main__",
    )


def main(argv=None):
    parser = argparse.ArgumentParser("segmentation_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="train a model")
    _add_common(p_train)
    p_train.add_argument("--epochs", type=int, default=10)
    p_train.add_argument("--iters", type=int, default=1000)
    p_train.add_argument("--test-every", type=int, default=100)
    p_train.set_defaults(fn=cmd_train)

    p_infer = sub.add_parser("infer", help="run inference on a folder")
    _add_common(p_infer)
    p_infer.add_argument("--out-dir", default="./pred")
    p_infer.add_argument("--mc-samples", type=int, default=16)
    p_infer.add_argument(
        "--mc-samples-per-pass", type=int, default=1,
        help="MC samples batched per forward pass (must divide "
        "--mc-samples); >1 rides samples on the batch axis",
    )
    p_infer.add_argument(
        "--mc-fast", choices=("auto", "off"), default="auto",
        help="route U-Net MC-dropout through the packed serving layout "
        "(same posterior estimator; 'off' forces the standard path)",
    )
    p_infer.set_defaults(fn=cmd_infer)

    p_bench = sub.add_parser("bench", help="run the headline benchmark")
    p_bench.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
