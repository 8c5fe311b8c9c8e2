"""Visualization helpers.

``vis_filters`` realizes the reference's empty stub
(reference utils/utilities.py:6-8): tile a conv kernel's filters into one
image grid for TensorBoard / file output.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np


def vis_filters(w: np.ndarray, pad: int = 1) -> np.ndarray:
    """[kh, kw, cin, cout] kernel → [grid_h, grid_w, {1,3}] float image in
    [0, 1]: one tile per output filter (input channels averaged unless 3)."""
    w = np.asarray(w, np.float32)
    kh, kw, cin, cout = w.shape
    if cin == 3:
        tiles = np.transpose(w, (3, 0, 1, 2))  # [cout, kh, kw, 3]
    else:
        tiles = np.mean(w, axis=2).transpose(2, 0, 1)[..., None]
    lo, hi = tiles.min(), tiles.max()
    tiles = (tiles - lo) / max(hi - lo, 1e-8)
    n = tiles.shape[0]
    cols = int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    c = tiles.shape[-1]
    grid = np.zeros(
        (rows * (kh + pad) + pad, cols * (kw + pad) + pad, c), np.float32
    )
    for i in range(n):
        r, col = divmod(i, cols)
        y = pad + r * (kh + pad)
        x = pad + col * (kw + pad)
        grid[y : y + kh, x : x + kw] = tiles[i]
    return grid


def save_filter_grid(w, path: str) -> Optional[str]:
    grid = vis_filters(w)
    try:
        import cv2

        img = (grid * 255).astype(np.uint8)
        if img.shape[-1] == 1:
            img = img[..., 0]
        cv2.imwrite(path, img)
        return path
    except ImportError:
        np.save(path + ".npy", grid)
        return path + ".npy"
