"""Checkpoint + summary unit tests (SURVEY §5 aux subsystems)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_tpu.utils import checkpoint as ckpt
from segmentation_tpu.utils.summary import SummaryWriter


def tree():
    return {
        "a/w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "a/b": jnp.zeros((3,)),
        "nested": {"x": jnp.ones((2,))},
    }


def test_save_restore_roundtrip(tmp_path):
    t = tree()
    path = ckpt.save(str(tmp_path), "m", 7, t)
    assert path.endswith("m.ckpt-7.npz")
    restored, step = ckpt.restore(path, tree())
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored["a/w"]), np.asarray(t["a/w"]))
    np.testing.assert_array_equal(
        np.asarray(restored["nested"]["x"]), np.ones((2,))
    )


def test_rotation_keeps_n(tmp_path):
    for s in (1, 2, 3):
        ckpt.save(str(tmp_path), "m", s, tree(), max_to_keep=2)
    steps = [s for _, s in ckpt.list_checkpoints(str(tmp_path), "m")]
    assert steps == [2, 3]


def test_latest_and_named(tmp_path):
    ckpt.save(str(tmp_path), "unet", 5, tree())
    ckpt.save(str(tmp_path), "fcn", 9, tree())
    assert ckpt.latest_checkpoint(str(tmp_path), "unet").endswith("-5.npz")
    assert ckpt.latest_checkpoint(str(tmp_path), "fcn").endswith("-9.npz")


def test_shape_mismatch_raises(tmp_path):
    path = ckpt.save(str(tmp_path), "m", 1, tree())
    bad = tree()
    bad["a/w"] = jnp.zeros((4, 4))
    with pytest.raises(ValueError):
        ckpt.restore(path, bad)


def test_restore_latest_missing_returns_none(tmp_path):
    assert ckpt.restore_latest(str(tmp_path), "nope", tree()) is None


def test_summary_writer_scalars_and_cadence(tmp_path):
    w = SummaryWriter(str(tmp_path), summary_iter=5)
    for step in range(11):
        w.scalars(step, {"loss": 1.0 / (step + 1)})
    w.scalars(3, {"forced": 1.0}, force=True)
    w.close()
    lines = [
        json.loads(line)
        for line in open(os.path.join(tmp_path, "metrics.jsonl"))
    ]
    steps = [r["step"] for r in lines if "loss" in r]
    assert steps == [0, 5, 10]  # summary_iter cadence
    assert any("forced" in r for r in lines)


def test_summary_writer_none_logdir_noop():
    w = SummaryWriter(None)
    w.scalars(0, {"x": 1.0})  # must not raise
    w.images(0, "t", np.zeros((1, 4, 4, 1)))
    w.close()


def test_vis_filters_grid():
    from segmentation_tpu.utils.vis import vis_filters

    w = np.random.default_rng(0).normal(size=(3, 3, 8, 10))
    grid = vis_filters(w)
    assert grid.ndim == 3 and grid.shape[-1] == 1
    assert grid.min() >= 0.0 and grid.max() <= 1.0
    w3 = np.random.default_rng(1).normal(size=(5, 5, 3, 4))
    grid3 = vis_filters(w3)
    assert grid3.shape[-1] == 3


def test_save_prunes_stale_higher_step(tmp_path):
    """A save dir holding a STALE higher-step snapshot (previous run of
    the same directory) must not shadow the new save — found live when a
    6-iter run into a reused dir left only the old ckpt-10 behind and
    inference silently restored it."""
    from segmentation_tpu.utils import checkpoint as ckpt

    tree = {"w": np.zeros((2,), np.float32)}
    ckpt.save(str(tmp_path), "m", 10, tree, max_to_keep=1)
    path = ckpt.save(str(tmp_path), "m", 6, tree, max_to_keep=1)
    names = sorted(os.listdir(tmp_path))
    assert names == [os.path.basename(path)] == ["m.ckpt-6.npz"]
    assert ckpt.latest_checkpoint(str(tmp_path), "m") == path
