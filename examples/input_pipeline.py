"""Input-pipeline benchmark harness.

Rebuild of reference examples/input_pipeline.py:82-94: time batches through
the decode+joint-crop pipeline, report crops/sec and MB/s, and optionally
dump decoded crops to ./debug for visual verification. Compares the Python
threaded loader against the native C++ loader when built.

  python examples/input_pipeline.py --image-dir data/features \
      --mask-dir data/labels --batches 20 --dump-debug
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_loader(name, ds, batches):
    ds.get_batch()  # warm-up / buffer fill
    t0 = time.perf_counter()
    n_bytes = 0
    n_imgs = 0
    last = None
    for _ in range(batches):
        last = ds.get_batch()
        n_imgs += len(last["image"])
        n_bytes += sum(a.nbytes for a in last.values())
    dt = time.perf_counter() - t0
    print(
        f"{name}: {n_imgs / dt:10.1f} crops/s   {n_bytes / dt / 1e6:8.1f} MB/s"
    )
    return last


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--mask-dir", default=None)
    ap.add_argument("--batch-size", type=int, default=48)
    ap.add_argument("--crop-size", type=int, default=512)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--dump-debug", action="store_true")
    args = ap.parse_args()

    from segmentation_tpu.data import ImageDataSet, ImageMaskDataSet
    from segmentation_tpu.data import native

    kwargs = dict(
        batch_size=args.batch_size, crop_size=args.crop_size,
        threads=args.threads, seed=5555,
    )
    if args.mask_dir:
        py_ds = ImageMaskDataSet(args.image_dir, args.mask_dir, **kwargs)
    else:
        py_ds = ImageDataSet(args.image_dir, **kwargs)
    last = bench_loader("python loader", py_ds, args.batches)
    py_ds.stop()

    if native.available():
        if args.mask_dir:
            nat = native.NativeImageMaskDataSet(
                args.image_dir, args.mask_dir, **kwargs
            )
        else:
            nat = native.NativeImageDataSet(args.image_dir, **kwargs)
        last = bench_loader("native loader", nat, args.batches)
        nat.close()
        if args.mask_dir:
            nat8 = native.NativeImageMaskDataSet(
                args.image_dir, args.mask_dir, uint8_images=True, **kwargs
            )
        else:
            nat8 = native.NativeImageDataSet(
                args.image_dir, uint8_images=True, **kwargs
            )
        bench_loader("native loader (uint8 staging)", nat8, args.batches)
        nat8.close()
    else:
        print(f"native loader unavailable: {native.build_error()}")

    if args.dump_debug and last is not None:
        os.makedirs("./debug", exist_ok=True)
        try:
            import cv2

            for i, img in enumerate(last["image"][:8]):
                cv2.imwrite(
                    f"./debug/crop_{i}.png",
                    (img[:, :, ::-1] * 255).astype(np.uint8),
                )
                if "mask" in last:
                    cv2.imwrite(
                        f"./debug/mask_{i}.png",
                        (last["mask"][i, :, :, 0] * 255).astype(np.uint8),
                    )
            print("wrote debug crops to ./debug")
        except ImportError:
            pass


if __name__ == "__main__":
    main()
