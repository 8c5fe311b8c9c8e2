"""Observability: TensorBoard summaries + structured step logging.

Replaces reference models/basemodel.py:97-98, 465-473 and the per-model
summary ops (§2 #18): scalars for every loss term, image panels for test
inputs/outputs and GAN dreams, histograms of variables and gradients.

Fixes the reference's known warts: summaries are computed FROM the jitted
step's metric outputs (no second sess.run re-executing the graph —
reference models/basemodel.py:465-473 recomputed everything), and writing is
rate-limited by ``summary_iter`` inside the writer rather than by caller
discipline.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class SummaryWriter:
    """Thin wrapper over tensorboardX with a JSONL mirror.

    ``None`` log_dir → no-op writer (the reference allowed log_dir=None,
    models/basemodel.py:97).
    """

    def __init__(self, log_dir: Optional[str], summary_iter: int = 25):
        self.log_dir = log_dir
        self.summary_iter = max(1, summary_iter)
        self._tb = None
        self._jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            try:
                from tensorboardX import SummaryWriter as TBWriter

                self._tb = TBWriter(log_dir)
            except Exception:
                self._tb = None
            self._jsonl = open(
                os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1
            )

    def should_write(self, step: int) -> bool:
        return self.log_dir is not None and step % self.summary_iter == 0

    def scalars(self, step: int, values: Dict[str, float], force: bool = False):
        if self.log_dir is None or (not force and not self.should_write(step)):
            return
        record = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            v = float(np.asarray(v))
            record[k] = v
            if self._tb:
                self._tb.add_scalar(k, v, step)
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")

    def images(self, step: int, tag: str, batch: np.ndarray, max_outputs: int = 3):
        """[N,H,W,C] float batch → image panels (reference tf.summary.image,
        models/basemodel.py:424-426)."""
        if self._tb is None:
            return
        batch = np.asarray(batch)[:max_outputs]
        batch = np.clip(batch, 0.0, 1.0)
        c = batch.shape[-1]
        if c == 1:
            batch = np.repeat(batch, 3, axis=-1)
        elif c == 2:  # binary-seg prob maps: show the foreground plane
            batch = np.repeat(batch[..., -1:], 3, axis=-1)
        elif c > 4:  # class-prob stacks: first three planes as RGB
            batch = batch[..., :3]
        for i, img in enumerate(batch):
            self._tb.add_image(
                f"{tag}/{i}", img.transpose(2, 0, 1), step
            )

    def histogram(self, step: int, tag: str, values: np.ndarray):
        """GAN-mode var/grad histograms (reference models/gan.py:148-156)."""
        if self._tb is None:
            return
        self._tb.add_histogram(tag, np.asarray(values).ravel(), step)

    def histograms_from_tree(self, step: int, prefix: str, tree):
        import jax

        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = jax.tree_util.keystr(kp).strip("'[]").replace("'][' ", "/")
            self.histogram(step, f"{prefix}/{name}", np.asarray(leaf))

    def flush(self):
        if self._tb:
            self._tb.flush()

    def close(self):
        if self._tb:
            self._tb.close()
        if self._jsonl:
            self._jsonl.close()
