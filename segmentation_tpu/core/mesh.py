"""Device mesh construction and named-sharding helpers.

The reference has no multi-device story at all (SURVEY §2.10: one tf.Session,
one GPU, reference examples/example_fcn.py:30-31). The TPU rebuild's
"distributed backend" is this module: a ``jax.sharding.Mesh`` over the ICI
fabric with named axes

  ``data``  — batch data-parallelism (grad psum inserted by XLA under jit)
  ``sph``/``spw`` — 2-D spatial partitioning of H/W for giant-tile inference
                    (the vision-domain analog of sequence/context parallelism,
                    realized as halo-exchanged convolution; see
                    segmentation_tpu.parallel.spatial)

All shardings are expressed as ``NamedSharding(mesh, PartitionSpec(...))`` so
XLA inserts the collectives; nothing here talks to transports directly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. Axes with size 1 still exist (cheap, keeps the
    jitted step's sharding rules uniform across 1-chip and pod-slice runs)."""

    data: int = -1  # -1: all remaining devices
    sph: int = 1
    spw: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int, int]:
        spatial = self.sph * self.spw
        if self.data == -1:
            if n_devices % spatial:
                raise ValueError(
                    f"{n_devices} devices not divisible by spatial {spatial}"
                )
            return (n_devices // spatial, self.sph, self.spw)
        if self.data * spatial != n_devices:
            raise ValueError(
                f"mesh {self.data}x{self.sph}x{self.spw} != {n_devices} devices"
            )
        return (self.data, self.sph, self.spw)


def make_mesh(
    spec: MeshSpec = MeshSpec(),
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str, str] = ("data", "sph", "spw"),
) -> Mesh:
    """Build the framework mesh.

    Device order matters for ICI locality: ``jax.make_mesh`` (when available)
    lets XLA pick a physical layout where neighboring mesh coordinates are
    ICI neighbors, so halo ppermutes and grad psums ride ICI not DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = spec.resolve(len(devices))
    # Auto axis types: sharding propagates through jit via GSPMD (XLA
    # inserts the collectives — the framework's design contract). jax 0.9's
    # make_mesh defaults to Explicit, whose type-level inference rejects
    # strided/rematerialized convs and replicated/sharded elementwise mixes.
    types = (jax.sharding.AxisType.Auto,) * len(axis_names)
    try:
        if devices == list(jax.devices()):
            return jax.make_mesh(shape, axis_names, axis_types=types)
    except Exception:
        pass
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names, axis_types=types)


def single_device_mesh() -> Mesh:
    return make_mesh(MeshSpec(data=1, sph=1, spw=1), devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC training batch: shard N over 'data' only. Spatial axes are
    reserved for the explicit shard_map giant-tile path
    (segmentation_tpu.parallel.spatial) — training-time spatial sharding
    would break bottleneck flattens (autoencoder) for no benefit at these
    model sizes (SURVEY §2.10 decision record)."""
    return NamedSharding(mesh, P("data", None, None, None))


def vector_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[N, D] tensor (latents, labels): shard N over 'data' only."""
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Giant single-image tile [N, H, W, C]: shard H and W across the mesh's
    spatial axes (batch replicated or sharded as well)."""
    return NamedSharding(mesh, P("data", "sph", "spw", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_warned_replicated_batch = False


def shard_batch(mesh: Mesh, tree):
    """Place a host pytree of batch arrays onto the mesh, batch-sharded.
    Batches not divisible by the 'data' axis are replicated instead (small
    debug batches; production batch sizes are multiples of the mesh). The
    fallback warns once — on a real mesh it is a silent n-fold slowdown.

    Multi-host runs are transparent: with ``jax.process_count() > 1`` the
    tree is the PER-HOST local batch and assembly goes through
    ``parallel.hosts.assemble_global_batch`` (DCN-aware global stitching)."""
    if jax.process_count() > 1:
        from segmentation_tpu.parallel import hosts

        return hosts.assemble_global_batch(mesh, tree)
    sh = batch_sharding(mesh)
    vec = vector_batch_sharding(mesh)
    data_size = mesh.shape.get("data", 1)

    def _put(x):
        global _warned_replicated_batch
        if isinstance(x, jax.Array) and not x.is_deleted():
            # Already a device array (e.g. DevicePrefetcher output):
            # device_put moves/reshard only if needed — never bounce
            # through host numpy.
            s = sh if x.ndim == 4 else (vec if x.ndim >= 1 else None)
            if s is not None and x.ndim >= 1 and x.shape[0] % max(
                1, data_size
            ) == 0:
                return x if x.sharding == s else jax.device_put(x, s)
            return x
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % max(1, data_size) == 0:
            s = sh if x.ndim == 4 else vec
        else:
            if data_size > 1 and not _warned_replicated_batch:
                _warned_replicated_batch = True
                import warnings

                warnings.warn(
                    f"batch dim {x.shape[0]} not divisible by data-parallel "
                    f"axis {data_size}; replicating the batch on every "
                    f"device ({data_size}x redundant compute). Use a batch "
                    f"size that is a multiple of the mesh 'data' axis.",
                    stacklevel=3,
                )
            s = replicated(mesh)
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(_put, tree)


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)
