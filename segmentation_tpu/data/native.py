"""ctypes binding for the native C++ data-loading runtime (csrc/dataloader.cc).

``NativeImageMaskDataSet`` is a drop-in for the Python
``ImageMaskDataSet`` (same constructor knobs, same get_batch() dict
contract) with decode + joint-crop + normalize + batch assembly running in
C++ worker threads off the GIL. Build happens on demand via csrc/Makefile;
import degrades gracefully (``available()`` is False) when no toolchain or
image libraries exist.
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.abspath(os.path.join(_CSRC, "build", "libsegdl.so"))
_lib = None
_build_error: Optional[str] = None

# The C ABI version this binding speaks (csrc/dataloader.cc kVersion). A
# stale build/libsegdl.so from an older checkout would otherwise load and
# fail later with an opaque missing-symbol error.
_ABI_VERSION = 3


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    # Version gate FIRST: every symbol below may be missing/different on a
    # stale .so. getattr on a CDLL raises AttributeError for absent symbols.
    ver = lib.sdl_version()
    if ver != _ABI_VERSION:
        raise RuntimeError(
            f"libsegdl.so ABI version {ver} != expected {_ABI_VERSION} "
            "(stale build)"
        )
    lib.sdl_create.restype = ctypes.c_void_p
    lib.sdl_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.sdl_next_batch.restype = ctypes.c_int
    lib.sdl_next_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.sdl_next_batch_u8.restype = ctypes.c_int
    lib.sdl_next_batch_u8.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.sdl_stop.argtypes = [ctypes.c_void_p]
    lib.sdl_destroy.argtypes = [ctypes.c_void_p]
    return lib


def _make(force: bool = False) -> None:
    cmd = ["make", "-C", os.path.abspath(_CSRC)]
    if force:
        cmd.append("-B")
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if not os.path.exists(_SO):
            _make()
        try:
            lib = _bind(ctypes.CDLL(_SO))
        except (RuntimeError, AttributeError):
            # Stale .so (old ABI): rebuild from source and load the fresh
            # binary under a unique path — dlopen caches by pathname, so
            # re-CDLL'ing the same file could return the old mapping.
            import shutil
            import tempfile

            _make(force=True)
            tmp = tempfile.NamedTemporaryFile(
                suffix=".so", prefix="libsegdl_", delete=False
            )
            tmp.close()
            shutil.copy2(_SO, tmp.name)
            lib = _bind(ctypes.CDLL(tmp.name))
        _lib = lib
    except Exception as e:  # no toolchain / libs — Python loader fallback
        _build_error = str(e)
        if isinstance(e, subprocess.CalledProcessError):
            _build_error += "\n" + (e.stderr or "")[-2000:]
    return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeImageMaskDataSet:
    """C++-backed paired image/mask streaming dataset."""

    has_masks = True
    use_feed = False

    def __init__(
        self,
        image_dir: str,
        mask_dir: Optional[str] = None,
        image_names: Optional[Sequence[str]] = None,
        mask_names: Optional[Sequence[str]] = None,
        n_classes: int = 2,
        batch_size: int = 96,
        crop_size: int = 256,
        capacity: int = 5000,
        image_ext: str = "jpg",
        mask_ext: str = "png",
        seed: int = 5555,
        threads: int = 4,
        min_holding: int = 1250,  # accepted for parity; capacity governs
        augment_flip: bool = False,
        mask_divisor: Optional[int] = 255,
        channels: int = 3,
        uint8_images: bool = False,
    ):
        """``uint8_images=True`` serves raw cropped bytes instead of
        normalized float32 — 4× less host→device transfer; the trainers
        normalize (/255) on device when they see a uint8 image batch."""
        lib = _load()
        if lib is None:
            raise RuntimeError(
                f"native loader unavailable: {_build_error}"
            )
        if image_names is None:
            image_names = sorted(
                glob.glob(os.path.join(image_dir, f"*.{image_ext}"))
            )
        self.has_masks = mask_dir is not None or mask_names is not None
        if self.has_masks and mask_names is None:
            mask_names = sorted(
                glob.glob(os.path.join(mask_dir, f"*.{mask_ext}"))
            )
        image_names = list(image_names)
        mask_names = list(mask_names or [])
        if not image_names:
            raise ValueError(f"no *.{image_ext} files in {image_dir}")
        if self.has_masks and len(mask_names) != len(image_names):
            raise ValueError(
                f"{len(image_names)} images vs {len(mask_names)} masks"
            )
        self.image_names = image_names
        self.mask_names = mask_names
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.n_classes = n_classes
        self.channels = channels
        self.mask_divisor = mask_divisor

        self._lib = lib
        self._handle = lib.sdl_create(
            "\n".join(image_names).encode(),
            "\n".join(mask_names).encode(),
            batch_size, crop_size, threads, seed,
            min(capacity, 4 * batch_size + 64), int(augment_flip), channels,
            int(not uint8_images),  # want_f32: workers pre-convert /255
        )
        if not self._handle:
            raise RuntimeError("sdl_create failed")
        self.uint8_images = uint8_images
        self._img_buf = np.empty(
            (batch_size, crop_size, crop_size, channels),
            np.uint8 if uint8_images else np.float32,
        )
        self._mask_buf = np.empty(
            (batch_size, crop_size, crop_size, 1), np.uint8
        )

    def set_tf_sess(self, sess):
        return

    def get_batch(self) -> Dict[str, np.ndarray]:
        if self.uint8_images:
            rc = self._lib.sdl_next_batch_u8(
                self._handle,
                self._img_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self._mask_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
        else:
            rc = self._lib.sdl_next_batch(
                self._handle,
                self._img_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._mask_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
        if rc != 0:
            detail = (
                " (a full epoch of consecutive decode failures — every "
                "image is undecodable or smaller than crop_size)"
                if rc == -3 else ""
            )
            raise RuntimeError(f"sdl_next_batch failed rc={rc}{detail}")
        out = {"image": self._img_buf.copy()}
        if self.has_masks:
            m = self._mask_buf.astype(np.int32)
            if self.mask_divisor:
                m = m // self.mask_divisor
            out["mask"] = np.clip(m, 0, self.n_classes - 1).astype(np.uint8)
        return out

    def stop(self):
        if self._handle:
            self._lib.sdl_stop(self._handle)

    def close(self):
        if self._handle:
            self._lib.sdl_destroy(self._handle)
            self._handle = None

    def __iter__(self):
        while True:
            yield self.get_batch()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeImageDataSet(NativeImageMaskDataSet):
    """C++-backed image-only dataset (ImageDataSet counterpart)."""

    has_masks = False

    def __init__(self, image_dir: str, **kwargs):
        kwargs.pop("mask_dir", None)
        super().__init__(image_dir, mask_dir=None, **kwargs)

    def get_batch(self) -> Dict[str, np.ndarray]:
        null_mask = ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
        if self.uint8_images:
            rc = self._lib.sdl_next_batch_u8(
                self._handle,
                self._img_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                null_mask,
            )
        else:
            rc = self._lib.sdl_next_batch(
                self._handle,
                self._img_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                null_mask,
            )
        if rc != 0:
            detail = (
                " (a full epoch of consecutive decode failures — every "
                "image is undecodable or smaller than crop_size)"
                if rc == -3 else ""
            )
            raise RuntimeError(f"sdl_next_batch failed rc={rc}{detail}")
        return {"image": self._img_buf.copy()}
