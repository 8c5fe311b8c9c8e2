"""Checkpoint / resume.

Contract preserved from the reference (reference models/basemodel.py:112-136,
494-501 and SURVEY §5): a directory of named checkpoints
``{save_dir}/{model_name}.ckpt-{global_step}``, keep-N rotation (N=1 default),
restore-newest via directory scan or an explicit ``load_snapshot_from`` path,
resume restores the persisted step counter, restore failure falls through to
fresh training with a warning.

Improvements over the reference: writes are atomic (tmp file + rename),
multi-host runs have exactly one writer (process 0) with a cross-host
barrier before rotation, and sharded/committed device arrays are gathered
safely via ``jax.device_get``. Storage format is a single ``.npz`` holding
the flattened param/state/opt-state pytrees plus a JSON manifest of the
tree structure — no framework-version lock-in.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

_CKPT_RE = re.compile(r"^(?P<name>.+)\.ckpt-(?P<step>\d+)\.npz$")


def _flatten(tree) -> Tuple[Dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    flat = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(leaves)}
    return flat, treedef


def save(
    save_dir: str,
    name: str,
    step: int,
    tree: Any,
    max_to_keep: int = 1,
) -> str:
    """Atomically write ``{save_dir}/{name}.ckpt-{step}.npz`` and rotate.

    Multi-host safe: on a pod slice (``jax.process_count() > 1``) only
    process 0 gathers the (replicated) state and writes — every other host
    skips both the ``device_get`` gather and the tmp+rename, so shared
    storage sees exactly one writer. All processes then barrier so no host
    returns (and e.g. exits, or proceeds to restore-on-preemption) before
    the checkpoint exists; rotation runs on process 0 AFTER the barrier,
    so stale checkpoints are only deleted once every host has observed the
    new one. Single-process runs take the plain path with no collective.
    """
    final = os.path.join(save_dir, f"{name}.ckpt-{int(step)}.npz")
    pc = jax.process_count()
    is_writer = pc == 1 or jax.process_index() == 0

    if is_writer:
        os.makedirs(save_dir, exist_ok=True)
        flat, treedef = _flatten(tree)
        # Manifest stores the keypath structure for robust restore.
        paths = [
            jax.tree_util.keystr(kp)
            for kp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
        ]
        manifest = json.dumps({"step": int(step), "paths": paths})

        fd, tmp = tempfile.mkstemp(dir=save_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, __manifest__=manifest, **flat)
            os.replace(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    if pc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt:{name}:{int(step)}")

    if is_writer:
        _rotate(save_dir, name, max_to_keep, step=int(step))
    return final


def _rotate(save_dir: str, name: str, max_to_keep: int,
            step: Optional[int] = None):
    """Prune to the ``max_to_keep`` highest-step checkpoints at or below
    the step just saved. Checkpoints numbered ABOVE the current step are
    stale leftovers from a previous run of this directory (the trainer's
    step is monotonic) — they are deleted too, or they would shadow the
    new save and a restart would silently resume the old state."""
    ckpts = list_checkpoints(save_dir, name)
    if step is not None:
        for path, s in ckpts:
            if s > step:
                try:
                    os.unlink(path)
                except OSError:
                    pass
        ckpts = [(p, s) for p, s in ckpts if s <= step]
    for path, _ in ckpts[:-max_to_keep] if max_to_keep > 0 else []:
        try:
            os.unlink(path)
        except OSError:
            pass


def list_checkpoints(save_dir: str, name: Optional[str] = None) -> List[Tuple[str, int]]:
    """All checkpoints in ``save_dir`` sorted by step ascending."""
    if not os.path.isdir(save_dir):
        return []
    out = []
    for fn in os.listdir(save_dir):
        m = _CKPT_RE.match(fn)
        if m and (name is None or m.group("name") == name):
            out.append((os.path.join(save_dir, fn), int(m.group("step"))))
    out.sort(key=lambda t: t[1])
    return out


def latest_checkpoint(save_dir: str, name: Optional[str] = None) -> Optional[str]:
    ckpts = list_checkpoints(save_dir, name)
    return ckpts[-1][0] if ckpts else None


def restore(path: str, tree_like: Any) -> Tuple[Any, int]:
    """Restore a pytree with the structure of ``tree_like`` from ``path``.
    Returns (tree, step). Raises on structural mismatch (caller decides
    whether to fall through to fresh training, per the reference contract)."""
    with np.load(path, allow_pickle=False) as data:
        manifest = json.loads(str(data["__manifest__"]))
        leaves, treedef = jax.tree_util.tree_flatten(tree_like)
        n = len(leaves)
        stored = [data[f"leaf_{i}"] for i in range(n)]
        if f"leaf_{n}" in data.files:
            raise ValueError(
                f"checkpoint {path} has more leaves than the target tree"
            )
        new_leaves = []
        for i, (old, new) in enumerate(zip(leaves, stored)):
            if tuple(np.shape(old)) != tuple(new.shape):
                raise ValueError(
                    f"checkpoint {path} leaf {i} ({manifest['paths'][i] if i < len(manifest['paths']) else '?'}): "
                    f"shape {new.shape} != expected {np.shape(old)}"
                )
            new_leaves.append(
                np.asarray(new, dtype=old.dtype) if hasattr(old, "dtype") else new
            )
        return jax.tree_util.tree_unflatten(treedef, new_leaves), int(
            manifest["step"]
        )


def restore_latest(
    save_dir: str, name: str, tree_like: Any
) -> Optional[Tuple[Any, int]]:
    path = latest_checkpoint(save_dir, name)
    if path is None:
        return None
    return restore(path, tree_like)
