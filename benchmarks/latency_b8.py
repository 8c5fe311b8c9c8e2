"""Small-batch serving latency attribution (directive r4#8).

The recorded 36.1 ms @B=8 (`unet512_infer_latency_ms_b8`) is one
host-observed dispatch: through the axon tunnel every dispatch
round-trip costs ~30 ms (the 'null dispatch' every scan-loop probe
calibrates against), so the number is ~30 ms fixed tunnel + device
work. This probe separates the two:

  null        — host-observed latency of a trivial jitted op (the
                tunnel + dispatch floor; no kernel work can remove it)
  b8 host     — host-observed latency of one B=8 apply_argmax dispatch
                (what bench.py records today)
  b8 device   — per-step device latency from a K-step serial scan
                (optimization_barrier-chained, so steps cannot overlap:
                this is the true single-request device latency)
  b128 device — same at B=128, for the parallelism-scaling check

If (b8 host − null) ≈ b8 device, the B=8 program loses nothing to
small-batch parallelism — the 36 ms is a measurement-environment
artifact, not a serving property.

Usage: python benchmarks/latency_b8.py [reps]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(reps=10):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.models.unet_int8 import UNetS2DInt8
    from segmentation_tpu.models.unet_fast import UNetS2DInference
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
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, t,
    )
    params = bf16(params)
    calib = [jax.jit(
        lambda k: jax.random.uniform(k, (8, 512, 512, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(7))]
    q = UNetS2DInt8(mcfg, padflat=True)
    prep = bf16(q.prepare(params, calib_batches=calib))

    # --- null dispatch (tunnel floor) -----------------------------------
    @jax.jit
    def _n(z):
        return z + 1.0

    float(_n(jnp.float32(0)))
    nt = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(_n(jnp.float32(0)))
        nt.append(time.perf_counter() - t0)
    null = min(nt)
    print(f"null dispatch        {null * 1e3:8.2f} ms", flush=True)

    # --- host-observed one-dispatch latency (bench.py's b8 number) ------
    @jax.jit
    def infer_sum(x):
        return q.apply_argmax(prep, x).sum()

    for batch in (8,):
        x = jax.jit(
            lambda k: jax.random.uniform(
                k, (batch, 512, 512, 3), jnp.bfloat16)
        )(jax.random.PRNGKey(1))
        float(infer_sum(x))
        lat = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(infer_sum(x))
            lat.append(time.perf_counter() - t0)
        host = min(lat)
        print(f"b{batch} host (1 disp)   {host * 1e3:8.2f} ms "
              f"(minus null: {(host - null) * 1e3:.2f})", flush=True)
        x.delete()

    # --- device per-step latency: serial K-step scan --------------------
    def device_latency(batch, iters=20):
        x = jax.jit(
            lambda k: jax.random.uniform(
                k, (batch, 512, 512, 3), jnp.bfloat16)
        )(jax.random.PRNGKey(2))

        @jax.jit
        def run(xx):
            def body(carry, _):
                c, a = carry
                a = lax.optimization_barrier(a)
                m = q.apply_argmax(prep, a)
                # fold the result into the carry so step i+1 depends on
                # step i finishing (true serial latency, no overlap)
                c = c + m.ravel()[0].astype(jnp.float32) * 1e-30
                return (c, a), None

            (c, _), _ = lax.scan(
                body, (jnp.float32(0.0), xx), None, length=iters)
            return c

        float(run(x))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            dt = (time.perf_counter() - t0 - null) / iters
            best = dt if best is None else min(best, dt)
        x.delete()
        return best

    for batch in (8, 32, 128):
        dt = device_latency(batch)
        print(f"b{batch} device/step   {dt * 1e3:8.2f} ms "
              f"({batch / dt:8.1f} img/s)", flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
