"""Spatial-partitioned inference cost on REAL hardware, 1-chip mesh.

VERDICT r4 item 8: the halo-exchange path's exactness is asserted in
the 8-virtual-device dryrun, but nothing measures its SPEED outside CPU
tests. This runs the degenerate 1×1 device mesh on the real chip —
halo exchange collapses to self-permutes — so the row isolates the
partitioning machinery's overhead (halo pad, shard_map seams, crop)
from any actual ICI traffic:

  monolithic     — jit(UNet.apply) on the full 1024² tile
  spatial_1x1    — parallel.spatial.spatial_apply_valid, mesh (1, 1)

and asserts the two agree (the spatial path's contract is exact
equality up to float reassociation).

Usage: python benchmarks/spatial_1chip.py [hw] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(hw=1024, batch=1):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.core.mesh import MeshSpec, make_mesh
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.nn import module as hk
    from segmentation_tpu.parallel.spatial import spatial_apply_valid

    print(f"[{time.strftime('%H:%M:%S')}] {jax.devices()[0]} "
          f"hw={hw} B={batch}", flush=True)
    cfg = ModelConfig(name="unet", n_classes=2, input_dims=(hw, hw),
                      n_kernels=32)
    model = UNet(cfg)
    fwd = hk.transform(lambda x: model(x))
    params, state = fwd.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3), jnp.bfloat16),
        train=False,
    )
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, params)

    x = jax.jit(lambda k: jax.random.uniform(
        k, (batch, hw, hw, 3), jnp.bfloat16))(jax.random.PRNGKey(1))
    x.block_until_ready()

    def apply_fn(p, st, xx):
        out, _ = fwd.apply(p, st, jax.random.PRNGKey(0), xx, train=False)
        return out

    @jax.jit
    def mono(xx):
        return apply_fn(params, state, xx)

    def bench(fn, xx, reps=3):
        y = fn(xx)
        float(jax.tree_util.tree_leaves(y)[0].sum())
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(2):
                y = fn(xx)
            float(jax.tree_util.tree_leaves(y)[0].sum())
            best = min(best, (time.perf_counter() - t0) / 2)
        return best * 1e3, y

    t_mono, y_mono = bench(mono, x)
    print(f"monolithic   {t_mono:8.1f} ms/call "
          f"({batch / t_mono * 1e3:6.2f} tiles/s)", flush=True)

    mesh = make_mesh(MeshSpec(data=1, sph=1, spw=1))
    sp = spatial_apply_valid(
        apply_fn, params, state, mesh, model.output_hw, levels=4,
    )
    t_sp, y_sp = bench(sp, x)
    print(f"spatial_1x1  {t_sp:8.1f} ms/call "
          f"({batch / t_sp * 1e3:6.2f} tiles/s)", flush=True)
    d = float(jnp.max(jnp.abs(
        y_mono.astype(jnp.float32) - y_sp.astype(jnp.float32))))
    print(f"max |mono - spatial| = {d:.3e}  "
          f"overhead {100 * (t_sp / t_mono - 1):+.1f}%", flush=True)
    assert d < 1e-1, d
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
