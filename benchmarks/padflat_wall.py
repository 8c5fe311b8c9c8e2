"""Wall-vs-device probe for the padflat serving path.

The int8_e2e run measured padflat at 107 ms wall while the profiler
(fresh process) saw 64.6 ms device — this script isolates whether the
gap is real per-step overhead or an artifact of section ordering
(resident executables/buffers from earlier sections; the axon tunnel
defers frees). Runs padflat FIRST in a fresh process, then the old int8
path, timing both a queued loop and a sync-per-step loop.

Usage: python benchmarks/padflat_wall.py [batch] [reps]
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

    # ---- models ---------------------------------------------------------
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
    calib = jax.jit(
        lambda k: jax.random.uniform(k, (8, 512, 512, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(7))
    x.block_until_ready()

    q0 = UNetS2DInt8(mcfg, padflat=False)
    print("calibrating...", flush=True)
    prep = bf16(q0.prepare(params, calib_batches=[calib]))

    def timeit(label, fn):
        out = fn(x)  # compile
        out.block_until_ready()
        # queued: enqueue all, one sync
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x)
        float(out.sum())
        dt_q = (time.perf_counter() - t0) / reps
        # sync per step
        t0 = time.perf_counter()
        for _ in range(5):
            float(fn(x).sum())
        dt_s = (time.perf_counter() - t0) / 5
        print(f"{label:16s} queued {dt_q * 1e3:7.2f} ms  "
              f"sync {dt_s * 1e3:7.2f} ms  "
              f"({batch / dt_q:7.1f} img/s queued)", flush=True)
        return dt_q

    # padflat FIRST (fresh process, nothing else resident)
    qpf = UNetS2DInt8(mcfg, padflat=True)
    f_pf = jax.jit(lambda xx: qpf.apply_argmax(prep, xx))
    print("compiling padflat...", flush=True)
    timeit("int8/padflat", f_pf)

    # batch sweep on the padflat path (serving has no optimizer state;
    # bigger batches amortize the fixed per-step overheads)
    for bs in (160, 192, 256):
        try:
            xb = jax.jit(
                lambda k, bs=bs: jax.random.uniform(
                    k, (bs, 512, 512, 3), jnp.bfloat16
                )
            )(jax.random.PRNGKey(1))
            xb.block_until_ready()
            out = f_pf(xb)
            out.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f_pf(xb)
            float(out.sum())
            dt = (time.perf_counter() - t0) / reps
            print(f"int8/padflat B={bs:4d} {dt * 1e3:7.2f} ms  "
                  f"{bs / dt:7.1f} img/s", flush=True)
            del xb, out
        except Exception as e:  # noqa: BLE001
            print(f"int8/padflat B={bs}: FAILED {str(e)[:120]}",
                  flush=True)

    # bf16 padflat (fresh-ish; the pf2 layout is dtype-generic)
    from segmentation_tpu.models.unet_fast import UNetS2DInference

    pfb = UNetS2DInference(mcfg, padflat=True)
    f_b = jax.jit(lambda xx: pfb.apply_argmax(prep, xx))
    print("compiling bf16/padflat...", flush=True)
    timeit("bf16/padflat", f_b)

    # then the old path in the same process (mirrors int8_e2e ordering
    # effects in reverse)
    f_old = jax.jit(lambda xx: q0.apply_argmax(prep, xx))
    print("compiling old...", flush=True)
    timeit("int8/old", f_old)

    # padflat again (now with other executables resident)
    timeit("int8/padflat#2", f_pf)
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
