"""Multi-host data path: two REAL jax.distributed CPU processes.

SURVEY §5 "distributed communication backend" / §7.6: each host feeds its
local slice of the global batch; ``assemble_global_batch`` stitches them
into one global jax.Array; a jitted reduction over that Array must see
every host's rows exactly once. The reference has no analog (one session,
one device — reference examples/example_fcn.py:30-31), so the contract
here is the pod-slice input-sharding design, validated end-to-end with a
subprocess pair over a loopback coordinator.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ.pop("JAX_PLATFORMS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    pid = int(sys.argv[1])
    coord = sys.argv[2]

    from segmentation_tpu.parallel import hosts

    hosts.initialize_multihost(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    from segmentation_tpu.core import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(mesh_lib.MeshSpec(data=4))

    # --- host_shard_paths: disjoint, exhaustive, pairing preserved -------
    names = [f"img{i:02d}" for i in range(10)]
    masks = [f"msk{i:02d}" for i in range(10)]
    mine, mym = hosts.host_shard_paths(names, masks)
    assert len(mine) == 5 and all(
        a[3:] == b[3:] for a, b in zip(mine, mym)
    )

    # --- global batch assembly ------------------------------------------
    # Local batch: 4 rows per host, value = 100*process_index + row.
    local = {
        "image": (100 * pid + np.arange(4, dtype=np.float32))[
            :, None, None, None
        ]
        * np.ones((4, 2, 2, 3), np.float32),
        "label": 100 * pid + np.arange(4, dtype=np.float32),
    }
    # Route through the trainer-facing entry point (shard_batch delegates
    # to assemble_global_batch when process_count > 1).
    g = mesh_lib.shard_batch(mesh, local)
    assert g["image"].shape == (8, 2, 2, 3), g["image"].shape
    assert g["label"].shape == (8,)

    s = jax.jit(lambda t: (t["image"].sum(), t["label"].sum()))(g)
    want_label = sum(100 * p + r for p in range(2) for r in range(4))
    np.testing.assert_allclose(float(s[1]), want_label)
    np.testing.assert_allclose(float(s[0]), want_label * 2 * 2 * 3)

    # local_batch_size arithmetic + loud-failure contract
    assert hosts.local_batch_size(8) == 4
    try:
        hosts.local_batch_size(9)
    except ValueError:
        pass
    else:
        raise AssertionError("local_batch_size(9) must raise")

    # --- multi-host-safe checkpointing: single writer + barrier ----------
    # Each process offers a DIFFERENT tree; only process 0's may land on
    # disk. Both processes pass the same shared save_dir.
    from segmentation_tpu.utils import checkpoint as ckpt_lib

    save_dir = sys.argv[3]
    tree = {"w": np.full((4,), float(pid), np.float32)}
    # Process 1 must not even gather: poison its _flatten to prove the
    # non-writer path never serializes.
    if pid != 0:
        def _boom(t):
            raise AssertionError("non-zero process must not gather/write")
        ckpt_lib._flatten = _boom
    path = ckpt_lib.save(save_dir, "mh", step=7, tree=tree, max_to_keep=1)
    # Barrier inside save() guarantees the file exists on every host now.
    assert os.path.exists(path), path
    restored, step = ckpt_lib.restore(path, {"w": np.zeros(4, np.float32)})
    assert step == 7
    np.testing.assert_allclose(restored["w"], 0.0)  # process 0's values
    # Second save rotates: exactly one checkpoint remains, the new one.
    tree2 = {"w": np.full((4,), 10.0 + pid, np.float32)}
    if pid == 0:
        ckpt_lib.save(save_dir, "mh", step=8, tree=tree2, max_to_keep=1)
    else:
        ckpt_lib.save(save_dir, "mh", step=8, tree=None, max_to_keep=1)
    # Rotation runs on process 0 after save()'s internal barrier; sync once
    # more so process 1's listing can't race the unlink.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("after_rotate")
    ckpts = ckpt_lib.list_checkpoints(save_dir, "mh")
    assert [s for _, s in ckpts] == [8], ckpts

    print(f"MULTIHOST_OK {pid}")
    """
)


@pytest.mark.slow
def test_two_process_global_batch(tmp_path):
    port = socket.socket().getsockname()  # find a free port
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Drop the parent test-process env that would pin 8 devices.
    env.pop("XLA_FLAGS", None)
    ckpt_dir = str(tmp_path / "ckpts")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), coord, ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out


def test_initialize_multihost_fails_loudly(monkeypatch):
    """A misconfigured coordinator must raise (chained), not degrade
    silently to single-process training. (A real dead-coordinator connect
    aborts the embedding process inside jax.distributed, so the contract
    is pinned against a simulated failure; the real success path runs in
    the subprocess test above.)"""
    import jax

    from segmentation_tpu.parallel import hosts

    def boom(**kw):
        raise RuntimeError("barrier timed out")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError) as ei:
        hosts.initialize_multihost(
            coordinator_address="127.0.0.1:1", num_processes=2, process_id=1
        )
    assert "refusing to degrade" in str(ei.value)
    assert "barrier timed out" in str(ei.value.__cause__)

    # an already-initialized runtime is not an error (idempotent re-entry)
    def already(**kw):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    hosts.initialize_multihost(coordinator_address="x", num_processes=2)


def test_maybe_initialize_noop_when_unconfigured(monkeypatch):
    from segmentation_tpu.parallel import hosts

    for v in hosts._COORD_ENV_VARS:
        monkeypatch.delenv(v, raising=False)
    assert hosts.maybe_initialize_multihost() is False


def test_assemble_force_single_process():
    """force=True exercises make_array_from_process_local_data even in a
    single-process run (the dryrun branch)."""
    from segmentation_tpu.core import mesh as mesh_lib
    from segmentation_tpu.parallel import hosts

    mesh = mesh_lib.make_mesh(mesh_lib.MeshSpec(data=8))
    x = np.arange(16, dtype=np.float32).reshape(16, 1) * np.ones(
        (16, 3), np.float32
    )
    g = hosts.assemble_global_batch(mesh, {"x": x}, force=True)
    assert g["x"].shape == (16, 3)
    np.testing.assert_allclose(np.asarray(g["x"]), x)
