"""Streaming datasets — the input-pipeline layer (reference L1).

Replaces the TF queue-runner pipelines (reference utils/datasets.py) with a
host-side threaded decode/crop worker pool feeding a bounded shuffle buffer,
plus optional device-side fused augmentation (segmentation_tpu.data.augment)
and double-buffered device prefetch (segmentation_tpu.data.pipeline).

Contract parity with the reference:
  - sorted-glob image/mask pairing (utils/datasets.py:112-115) with an
    explicit pairing check (same stem count) instead of silent misalignment
  - paired shuffling: ONE permutation drives both files of a pair — the
    rebuild of the same-seed twin-queue trick (utils/datasets.py:136-143)
  - knobs: batch_size, crop_size, capacity, min_holding, threads, seed,
    image_ext/mask_ext (utils/datasets.py:94-110)
  - attributes: batch_size, has_masks, use_feed, n_classes; methods
    get_batch() (utils/datasets.py:194-196); set_tf_sess becomes a no-op
    kept for API familiarity
  - eager loader load_images(paths, batchsize, crop_size)
    (utils/datasets.py:19-45)
  - MNISTDataSet(source_dir, batch_size) (utils/datasets.py:48-85)

Where the reference's shuffle_batch could silently de-pair images and masks
under multi-threading (it relied on identical queue seeds), this pipeline
decodes each (image, mask) pair in the same task, so pairing cannot break —
a determinism test locks the batch stream for a fixed seed.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from segmentation_tpu.data.augment import host_joint_random_crop
from segmentation_tpu.data.decode import decode_image


def load_images(paths: Sequence[str], batchsize: int, crop_size: int,
                seed: Optional[int] = None) -> np.ndarray:
    """Eager batch loader for inference (reference utils/datasets.py:19-45):
    random-choice files, RGB decode, per-image random crop, stack, /255."""
    rng = np.random.default_rng(seed)
    chosen = rng.choice(list(paths), batchsize)
    out = []
    for p in chosen:
        img = decode_image(p)
        img, _ = host_joint_random_crop(rng, img, None, crop_size)
        out.append(img)
    return np.stack(out).astype(np.float32) / 255.0


def _resize_by_ratio(img: np.ndarray, mask: Optional[np.ndarray],
                     ratio: float):
    """Decode-time downscale: crop first, then resize by ``ratio``
    (reference utils/datasets.py:158-162 — commented out there, but the
    knob is part of the dataset contract at :104). Images resize
    bilinearly, masks nearest (labels must not blend)."""
    if ratio == 1.0:
        return img, mask
    h, w = img.shape[:2]
    oh, ow = max(1, int(round(h * ratio))), max(1, int(round(w * ratio)))
    mask_had_channel = mask is not None and mask.ndim == 3
    try:
        import cv2

        img = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        if mask is not None:
            mask = cv2.resize(mask, (ow, oh),
                              interpolation=cv2.INTER_NEAREST)
    except ImportError:
        from PIL import Image

        img = np.asarray(
            Image.fromarray(img).resize((ow, oh), Image.BILINEAR)
        )
        if mask is not None:
            mask = np.asarray(
                Image.fromarray(np.squeeze(mask)).resize(
                    (ow, oh), Image.NEAREST
                )
            )
    if mask_had_channel and mask.ndim == 2:  # cv2/PIL drop the [...,1] dim
        mask = mask[..., None]
    return img, mask


class _ThreadedPairLoader:
    """Worker pool: draws (image, mask) path pairs in paired-shuffled order,
    decodes + crops on the host, and fills a bounded buffer.

    ``capacity`` bounds the buffer (the shuffle_batch capacity knob,
    reference utils/datasets.py:166-171); ``min_holding`` is the warm-up
    fill level before the first batch is served (min_after_dequeue)."""

    def __init__(
        self,
        image_names: List[str],
        mask_names: Optional[List[str]],
        crop_size: int,
        capacity: int,
        min_holding: int,
        threads: int,
        seed: int,
        augment_flip: bool,
        grayscale_mask: bool = True,
        ratio: float = 1.0,
    ):
        self.image_names = image_names
        self.mask_names = mask_names
        self.crop_size = crop_size
        self.capacity = max(capacity, 2)
        self.min_holding = min(min_holding, self.capacity // 2)
        self.threads = max(1, threads)
        self.seed = seed
        self.augment_flip = augment_flip
        self.grayscale_mask = grayscale_mask
        self.ratio = ratio

        self._buffer: "queue.Queue" = queue.Queue(maxsize=self.capacity)
        self._stop = threading.Event()
        self._workers: List[threading.Thread] = []
        self._started = False
        # Global sample counter drives the paired-shuffled order: epoch e
        # uses permutation(seed + e); index i within it is claimed by
        # whichever worker increments the counter — pairing is intrinsic
        # because one task decodes both files.
        self._counter = 0
        self._counter_lock = threading.Lock()

    # -- order ---------------------------------------------------------------
    def _pair_at(self, global_idx: int):
        n = len(self.image_names)
        epoch, i = divmod(global_idx, n)
        perm = np.random.default_rng(self.seed + epoch).permutation(n)
        j = int(perm[i])
        return (
            self.image_names[j],
            self.mask_names[j] if self.mask_names is not None else None,
        )

    def _next_index(self) -> int:
        with self._counter_lock:
            idx = self._counter
            self._counter += 1
        return idx

    # -- workers -------------------------------------------------------------
    def _work(self, worker_id: int):
        while not self._stop.is_set():
            idx = self._next_index()
            img_path, mask_path = self._pair_at(idx)
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, idx])
            )
            try:
                img = decode_image(img_path)
                mask = (
                    decode_image(mask_path, grayscale=self.grayscale_mask)
                    if mask_path is not None
                    else None
                )
                img, mask = host_joint_random_crop(
                    rng, img, mask, self.crop_size, flip=self.augment_flip
                )
                img, mask = _resize_by_ratio(img, mask, self.ratio)
            except Exception as e:  # unreadable file → sentinel keeps the
                # global-order reorder buffer gap-free
                print(f"[data] worker {worker_id}: skipping {img_path}: {e}")
                img, mask = None, None
            item = (idx, img, mask)
            while not self._stop.is_set():
                try:
                    self._buffer.put(item, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def start(self):
        if self._started:
            return
        self._started = True
        for t in range(self.threads):
            th = threading.Thread(
                target=self._work, args=(t,), daemon=True,
                name=f"seg-data-{t}",
            )
            th.start()
            self._workers.append(th)

    def stop(self):
        self._stop.set()
        # drain so workers blocked on put() can exit
        try:
            while True:
                self._buffer.get_nowait()
        except queue.Empty:
            pass

    def take(self, n: int):
        """Take the NEXT n samples in global paired-shuffled order. A
        reorder buffer absorbs worker interleaving, so the served stream is
        bitwise-deterministic for a fixed seed regardless of thread timing
        (the reference had no such guarantee — its shuffle_batch order was
        whatever the runner threads produced)."""
        if not self._started:
            self.start()
        if not hasattr(self, "_reorder"):
            self._reorder = {}
            self._next_serve = 0
        out = []
        while len(out) < n:
            while self._next_serve not in self._reorder:
                idx, img, mask = self._buffer.get()
                self._reorder[idx] = (img, mask)
            img, mask = self._reorder.pop(self._next_serve)
            if img is not None:  # skip decode-failure sentinels
                out.append((self._next_serve, img, mask))
            self._next_serve += 1
        return out


class ImageMaskDataSet:
    """Paired image/mask streaming dataset
    (reference utils/datasets.py:94-197)."""

    has_masks = True
    use_feed = False

    def __init__(
        self,
        image_dir: str,
        mask_dir: str,
        image_names: Optional[Sequence[str]] = None,
        mask_names: Optional[Sequence[str]] = None,
        n_classes: int = 2,
        batch_size: int = 96,
        crop_size: int = 256,
        ratio: float = 1.0,
        capacity: int = 5000,
        image_ext: str = "jpg",
        mask_ext: str = "png",
        seed: int = 5555,
        threads: int = 4,
        min_holding: int = 1250,
        augment_flip: bool = False,
        mask_divisor: Optional[int] = 255,
    ):
        if image_names is None:
            image_names = sorted(
                glob.glob(os.path.join(image_dir, f"*.{image_ext}"))
            )
        if mask_names is None:
            mask_names = sorted(
                glob.glob(os.path.join(mask_dir, f"*.{mask_ext}"))
            )
        image_names = list(image_names)
        mask_names = list(mask_names)
        if not image_names:
            raise ValueError(f"no *.{image_ext} files in {image_dir}")
        if len(image_names) != len(mask_names):
            raise ValueError(
                f"{len(image_names)} images vs {len(mask_names)} masks — "
                "sorted-glob pairing requires equal counts"
            )
        # pairing sanity: warn when sorted stems diverge (the reference
        # paired purely by sort order and could silently mis-pair)
        mismatched = sum(
            1
            for a, b in zip(image_names, mask_names)
            if os.path.splitext(os.path.basename(a))[0]
            != os.path.splitext(os.path.basename(b))[0]
        )
        if mismatched:
            print(
                f"[data] WARNING: {mismatched}/{len(image_names)} image/mask "
                "stems differ — verify the sorted-glob pairing is intended"
            )
        self.image_names = image_names
        self.mask_names = mask_names
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.ratio = ratio
        self.n_classes = n_classes
        # 0/255 binary masks divide to {0,1} (reference utils/datasets.py:179
        # divides masks by 255); None keeps raw class indices.
        self.mask_divisor = mask_divisor

        self._loader = _ThreadedPairLoader(
            image_names,
            mask_names,
            crop_size,
            capacity,
            min_holding,
            threads,
            seed,
            augment_flip,
            ratio=ratio,
        )

    def set_tf_sess(self, sess):  # API-familiarity no-op
        return

    def start(self):
        self._loader.start()

    def stop(self):
        self._loader.stop()

    def get_batch(self) -> Dict[str, np.ndarray]:
        items = self._loader.take(self.batch_size)
        imgs = np.stack([im for _, im, _ in items]).astype(np.float32) / 255.0
        masks = np.stack([mk for _, _, mk in items]).astype(np.int32)
        if self.mask_divisor:
            masks = masks // self.mask_divisor
        return {
            "image": imgs,
            "mask": np.clip(masks, 0, self.n_classes - 1).astype(np.uint8),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self.get_batch()


class ImageDataSet:
    """Image-only streaming dataset (reference utils/datasets.py:204-273)."""

    has_masks = False
    use_feed = False

    def __init__(
        self,
        image_dir: str,
        n_classes: int = 2,
        batch_size: int = 96,
        crop_size: int = 256,
        ratio: float = 1.0,
        capacity: int = 2000,
        image_ext: str = "jpg",
        seed: int = 5555,
        threads: int = 4,
        min_holding: int = 250,
        augment_flip: bool = False,
    ):
        image_names = sorted(
            glob.glob(os.path.join(image_dir, f"*.{image_ext}"))
        )
        if not image_names:
            raise ValueError(f"no *.{image_ext} files in {image_dir}")
        self.image_names = image_names
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.n_classes = n_classes
        self.ratio = ratio
        self._loader = _ThreadedPairLoader(
            image_names, None, crop_size, capacity, min_holding, threads,
            seed, augment_flip, ratio=ratio,
        )

    def set_tf_sess(self, sess):
        return

    def start(self):
        self._loader.start()

    def stop(self):
        self._loader.stop()

    def get_batch(self) -> Dict[str, np.ndarray]:
        items = self._loader.take(self.batch_size)
        imgs = np.stack([im for _, im, _ in items]).astype(np.float32) / 255.0
        return {"image": imgs}

    def __iter__(self):
        while True:
            yield self.get_batch()


class MNISTDataSet:
    """MNIST feed dataset (reference utils/datasets.py:48-85).

    Sources, in order: ``{source_dir}/mnist.npz`` (keras layout), a torch/
    torchvision cache if present, then the sklearn 8×8 digits upscaled to
    28×28 as an offline fallback (this container has no network egress; the
    reference downloaded via the TF tutorial helper, utils/datasets.py:55).
    """

    has_masks = False
    use_feed = True

    def __init__(self, source_dir: str, batch_size: int, n_classes: int = 10,
                 mode: str = "TRAIN", seed: int = 0):
        self.batch_size = batch_size
        self.n_classes = n_classes
        self.mode = mode
        self._rng = np.random.default_rng(seed)
        self.images, self.labels = self._load(source_dir, mode)

    @staticmethod
    def _load(source_dir, mode):
        npz = os.path.join(source_dir or ".", "mnist.npz")
        if os.path.exists(npz):
            with np.load(npz) as d:
                if mode == "TRAIN":
                    x, y = d["x_train"], d["y_train"]
                else:
                    x, y = d["x_test"], d["y_test"]
            return x[..., None].astype(np.uint8), y.astype(np.int32)
        # offline fallback: sklearn digits (1797 8×8 images), upscaled
        try:
            from sklearn.datasets import load_digits

            digits = load_digits()
            imgs = digits.images / digits.images.max()  # [N, 8, 8] in [0,1]
            imgs = np.kron(imgs, np.ones((1, 4, 4)))[:, 2:-2, 2:-2]  # 28×28
            imgs = np.pad(imgs, ((0, 0), (0, 0), (0, 0)))
            x = (imgs * 255).astype(np.uint8)[..., None]
            y = digits.target.astype(np.int32)
            cut = int(0.9 * len(x))
            if mode == "TRAIN":
                return x[:cut], y[:cut]
            return x[cut:], y[cut:]
        except Exception:
            pass
        # last resort: synthetic blobs
        from segmentation_tpu.data.synthetic import SyntheticImages

        ds = SyntheticImages(batch_size=4096, hw=(28, 28), channels=1)
        x = (ds.get_batch()["image"] * 255).astype(np.uint8)
        y = np.zeros((len(x),), np.int32)
        return x, y

    def set_tf_sess(self, sess):
        return

    def _reshape_batch(self, vect_x: np.ndarray) -> np.ndarray:
        """[B, 784] → [B, 28, 28, 1] (reference utils/datasets.py:77-80)."""
        return np.reshape(vect_x, (self.batch_size, 28, 28, 1))

    def next_batch(self, n: Optional[int] = None):
        n = n or self.batch_size
        idx = self._rng.integers(0, len(self.images), n)
        x = self.images[idx].astype(np.float32) / 255.0
        return x, self.labels[idx]

    def get_batch(self) -> Dict[str, np.ndarray]:
        x, y = self.next_batch()
        return {"image": x, "label": y}

    def __iter__(self):
        while True:
            yield self.get_batch()
