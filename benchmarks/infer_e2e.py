"""End-to-end s2d U-Net inference: Pallas conv path vs XLA conv path.

One process, one compile each; 10 queued dispatches timed to the final
host checksum (per-dispatch tunnel latency overlaps device work).

Usage: python benchmarks/infer_e2e.py [batch] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=128, reps=10):
    import jax
    import jax.numpy as jnp

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models import unet_fast
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.nn import module as hk

    print(f"[{time.strftime('%H:%M:%S')}] init {jax.devices()[0]}",
          flush=True)
    mcfg = ModelConfig(input_dims=(512, 512), n_kernels=32)
    model = UNet(mcfg)
    fwd = hk.transform(lambda x: model(x))
    params, _ = fwd.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16),
        train=False,
    )

    def bf16(t):
        return jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, t,
        )

    fast = unet_fast.UNetS2DInference(mcfg)
    prepared = bf16(fast.prepare(bf16(params)))
    x = jax.jit(
        lambda k: jax.random.uniform(k, (batch, 512, 512, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    x.block_until_ready()

    results = {}
    outs = {}
    for mode in ("pallas", "xla"):
        unet_fast._PALLAS_CONV = "auto" if mode == "pallas" else "0"

        @jax.jit
        def infer(xx):
            # serving path (same as bench.py headline): packed 1x1 head +
            # argmax, uint8 unpack
            mask = fast.apply_argmax(prepared, xx)
            return jnp.sum(mask.astype(jnp.int32))

        print(f"compiling {mode}...", flush=True)
        outs[mode] = float(infer(x))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = infer(x)
        float(out)
        dt = (time.perf_counter() - t0) / reps
        ips = batch / dt
        results[mode] = dt
        print(f"{mode:8s} {dt * 1e3:7.2f} ms/step  {ips:8.1f} img/s",
              flush=True)
    # argmax-count checksum: near-identical up to bf16 tie flips
    tot = batch * 512 * 512
    drift = abs(outs["pallas"] - outs["xla"]) / tot
    print(f"checksum drift {drift:.2e} ({outs})")
    assert drift < 1e-3, outs
    print(f"speedup: {results['xla'] / results['pallas']:.3f}x")
    print("DONE")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
