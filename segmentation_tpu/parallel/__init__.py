"""Distributed layer: data parallelism + 2-D spatial partitioning.

Data parallelism is expressed declaratively — trainers place batches with
``core.mesh.batch_sharding`` and XLA inserts the gradient psums over ICI
(there is no hand-written allreduce; SURVEY §2.10 records the decision that
no TP/PP/EP is warranted at these model sizes). This package holds the parts
that DO need explicit SPMD: halo-exchanged spatial partitioning for
whole-slide inference, and multi-host input sharding helpers.
"""

from segmentation_tpu.parallel.spatial import (
    halo_exchange_2d,
    spatial_apply,
    spatial_apply_valid,
    spatial_infer_bayesian,
    spatial_infer_bayesian_valid,
    valid_halo,
)
from segmentation_tpu.parallel.hosts import host_shard_paths

__all__ = [
    "halo_exchange_2d",
    "spatial_apply",
    "spatial_apply_valid",
    "spatial_infer_bayesian",
    "spatial_infer_bayesian_valid",
    "valid_halo",
    "host_shard_paths",
]
