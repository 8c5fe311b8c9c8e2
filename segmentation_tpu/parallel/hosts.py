"""Multi-host utilities: input-pipeline sharding over DCN.

Each host decodes only its slice of the file list (round-robin by process
index, keeping image/mask pairs together); per-host batches concatenate into
the global batch via jax.make_array_from_process_local_data. Single-process
environments degrade to the identity.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax


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


def initialize_multihost(**kwargs):
    """jax.distributed.initialize passthrough (no-op if single process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        print(f"[parallel] multihost init skipped: {e}")
