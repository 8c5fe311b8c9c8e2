"""One-hot mask encoding verification.

Rebuild of reference examples/onehot_image.py: encode a mask to one-hot and
write each class plane as an image for visual verification (the property is
also locked by tests/test_data_pipeline.py::test_one_hot_mask_semantics).

  python examples/onehot_image.py --mask path/to/mask.png --n-classes 2
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mask", default=None)
    ap.add_argument("--n-classes", type=int, default=2)
    ap.add_argument("--out-dir", default="./debug")
    args = ap.parse_args()

    from segmentation_tpu.data import decode_image, one_hot_mask

    if args.mask:
        mask = decode_image(args.mask, grayscale=True)[None]
        if mask.max() > args.n_classes - 1:
            mask = mask // 255  # 0/255 binary convention
    else:
        print("no --mask: using a synthetic 3-class disc")
        yy, xx = np.mgrid[0:64, 0:64]
        d2 = (yy - 32) ** 2 + (xx - 32) ** 2
        mask = np.zeros((1, 64, 64, 1), np.uint8)
        mask[0, d2 < 400, 0] = 1
        mask[0, d2 < 100, 0] = 2
        args.n_classes = 3

    oh = np.asarray(one_hot_mask(mask, args.n_classes))
    print(f"mask {mask.shape} -> one-hot {oh.shape}")
    assert (oh.sum(-1) == 1).all(), "one-hot planes must partition the mask"
    os.makedirs(args.out_dir, exist_ok=True)
    try:
        import cv2

        for c in range(args.n_classes):
            cv2.imwrite(
                os.path.join(args.out_dir, f"class_{c}.png"),
                (oh[0, :, :, c] * 255).astype(np.uint8),
            )
        print(f"wrote {args.n_classes} class planes to {args.out_dir}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
