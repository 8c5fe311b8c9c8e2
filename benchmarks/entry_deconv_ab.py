"""A/B the round-3 serving commits: fused pf2 entry and int8 deconvs.

padflat_wall measured 58.4 ms (int8, B=128) before commits 7e8dbf6
(fused entry) + 8e5ded5 (int8 deconvs) and 61.5 ms after — this isolates
which lever moved, in ONE process (one backend warmup). Both levers are
trace-time env gates, so one prepare serves all four configs.

Usage: python benchmarks/entry_deconv_ab.py [batch] [reps]
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
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.models.unet_int8 import UNetS2DInt8
    from segmentation_tpu.nn import module as hk

    print(f"[{time.strftime('%H:%M:%S')}] init {jax.devices()[0]}",
          flush=True)
    mcfg = ModelConfig(input_dims=(512, 512), n_kernels=32, n_classes=2)
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

    q = UNetS2DInt8(mcfg, padflat=True)
    print("calibrating...", flush=True)
    prep = bf16(q.prepare(params, calib_batches=[calib]))

    def timeit(label, fn):
        out = fn(x)  # compile
        float(out.sum())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x)
        float(out.sum())
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:28s} {dt * 1e3:8.2f} ms  "
              f"({batch / dt:7.1f} img/s)", flush=True)
        return dt

    configs = [
        ("entry=1 deconv=1 (current)", "1", "1"),
        ("entry=0 deconv=1", "0", "1"),
        ("entry=1 deconv=0", "1", "0"),
        ("entry=0 deconv=0 (58.4ms)", "0", "0"),
    ]
    for label, e, d in configs:
        os.environ["SEG_TPU_FUSED_ENTRY"] = e
        os.environ["SEG_TPU_INT8_DECONV"] = d

        def fn(xx, _q=q, _p=prep):
            return _q.apply_argmax(_p, xx)

        print(f"compiling {label}...", flush=True)
        timeit(label, jax.jit(fn))
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
