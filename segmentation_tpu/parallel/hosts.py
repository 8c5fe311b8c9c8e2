"""Multi-host utilities: input-pipeline sharding over DCN.

The reference is strictly single-process — one tf.Session, one GPU
(reference examples/example_fcn.py:30-31). On a TPU pod slice the input
pipeline must instead run once per host: each host decodes only its slice
of the file list (``host_shard_paths``), and the per-host batches are
assembled into ONE global jax.Array batch-sharded over the full mesh via
``jax.make_array_from_process_local_data`` (``assemble_global_batch``) —
no host ever materializes the global batch, and the assembly rides DCN
only where the mesh's device order demands it.

``core.mesh.shard_batch`` routes through ``assemble_global_batch``
automatically when ``jax.process_count() > 1``, so trainers and the
DevicePrefetcher are multi-host-transparent: feed them the LOCAL batch
(global_batch / process_count samples) and the jitted step sees the
global batch.

Validated by tests/test_multihost.py (two real jax.distributed CPU
processes) and the process-local-assembly branch of
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_shard_paths(
    image_names: Sequence[str],
    mask_names: Optional[Sequence[str]] = None,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[List[str], Optional[List[str]]]:
    """Deterministic round-robin split of the (sorted) file list across
    hosts. Pairing is preserved because the same indices select from both
    lists."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    idx = list(range(pi, len(image_names), pc))
    imgs = [image_names[i] for i in idx]
    masks = [mask_names[i] for i in idx] if mask_names is not None else None
    return imgs, masks


def local_batch_size(global_batch: int, process_count: Optional[int] = None
                     ) -> int:
    """Per-host batch size for a given global batch."""
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{pc} processes"
        )
    return global_batch // pc


def assemble_global_batch(mesh: Mesh, tree, *, force: bool = False):
    """Per-host local batch pytree → global jax.Arrays, batch-sharded over
    ``mesh``'s 'data' axis.

    Each process contributes ``local_n = global_n / process_count`` leading
    rows; ``jax.make_array_from_process_local_data`` stitches the
    process-local shards into one global Array without any host seeing the
    full batch. Requires the mesh 'data' axis to span a multiple of
    process_count devices so every process's rows land on its own
    addressable devices (the standard pod-slice layout from
    ``jax.make_mesh``).

    ``force=True`` exercises the process-local assembly path even in a
    single-process run (used by the multichip dryrun).
    """
    pc = jax.process_count()
    if pc == 1 and not force:
        from segmentation_tpu.core import mesh as mesh_lib

        return mesh_lib.shard_batch(mesh, tree)

    data_ax = mesh.shape.get("data", 1)
    if data_ax % pc:
        raise ValueError(
            f"mesh 'data' axis ({data_ax}) not divisible by process count "
            f"({pc}); per-host batch rows cannot map to addressable devices"
        )

    def _put(x):
        x = np.asarray(x)
        spec = P("data", *([None] * (x.ndim - 1))) if x.ndim else P()
        sharding = NamedSharding(mesh, spec)
        global_shape = (x.shape[0] * pc, *x.shape[1:])
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree_util.tree_map(_put, tree)


_COORD_ENV_VARS = (
    # jax.distributed auto-detection environments + the explicit knob
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def initialize_multihost(**kwargs) -> None:
    """``jax.distributed.initialize`` that FAILS LOUDLY.

    A real multi-host misconfiguration must never degrade to silent
    single-process training (the round-2 bug): any failure here is raised,
    chained to the root cause. Call this only when a multi-process run is
    intended — use ``maybe_initialize_multihost`` for drivers that serve
    both cases.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise RuntimeError(
            f"multi-host initialization failed (kwargs={kwargs}); refusing "
            "to degrade to single-process training"
        ) from e


def maybe_initialize_multihost(**kwargs) -> bool:
    """Initialize multi-host iff a coordinator is configured (explicit
    kwargs or one of the standard coordinator env vars). Returns True when
    a multi-process runtime was initialized. Misconfigured multi-host
    still fails loudly; only the fully-unconfigured case no-ops."""
    configured = bool(kwargs) or any(
        os.environ.get(v) for v in _COORD_ENV_VARS
    )
    if not configured:
        return False
    initialize_multihost(**kwargs)
    return True
