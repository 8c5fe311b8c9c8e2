"""pack_levels=3 on the int8 serving path: parity + timing vs pl=2.

The profile (r4) shows ~11.1 ms of XLA mid-level convs; extending the
packed Pallas region to level 3 moves ~6 ms of that onto the padflat
kernels. CPU-interpret shows NaN leakage at pl=3 — suspected interpret
NaN-canary contamination through the deconv's zero-weight interleave
selectors (0*NaN=NaN; real-hardware int8 padding is finite). This probe
answers both questions on hardware: does pl=3 agree with pl=2's masks,
and is it faster?

Usage: python benchmarks/pack3_probe.py [batch] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=128, reps=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.models.unet_int8 import UNetS2DInt8
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

    params = bf16(params)
    x = jax.jit(
        lambda k: jax.random.uniform(k, (batch, 512, 512, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    calib = [jax.jit(
        lambda k: jax.random.uniform(k, (8, 512, 512, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(7))]
    x.block_until_ready()

    masks = {}
    for plv in (2, 3):
        q = UNetS2DInt8(mcfg, padflat=True, pack_levels=plv)
        prep = bf16(q.prepare(params, calib_batches=calib))

        @jax.jit
        def infer(xx, _prep=prep, _q=q):
            return _q.apply_argmax(_prep, xx)

        print(f"compiling int8 pl={plv}...", flush=True)
        t0 = time.perf_counter()
        m = np.asarray(infer(x))
        print(f"  first call {time.perf_counter() - t0:.1f}s", flush=True)
        masks[plv] = m
        # steady-state timing with a host checksum barrier
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = infer(x)
            _ = float(out.sum())
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"int8 pl={plv}: {dt * 1e3:7.2f} ms/step  "
              f"{batch / dt:7.1f} img/s", flush=True)

    agree = float((masks[2] == masks[3]).mean())
    print(f"mask agreement pl3 vs pl2 = {agree:.6f}", flush=True)
    finite3 = bool(np.isfinite(masks[3]).all())
    print(f"pl3 finite: {finite3}", flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
