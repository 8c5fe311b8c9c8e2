"""End-to-end int8-resident Pallas serving vs bf16, 512² U-Net.

Calibrates the PTQ scales on-device, then times the serving path
(apply_argmax) and reports mask agreement vs the bf16 reference.

Usage: python benchmarks/int8_e2e.py [batch] [reps]
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
    from segmentation_tpu.models import unet_fast
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
    calib = jax.jit(
        lambda k: jax.random.uniform(k, (8, 512, 512, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(7))
    x.block_until_ready()

    # --- bf16 reference (XLA path: measured fastest bf16) ---------------
    unet_fast._PALLAS_CONV = "0"
    fast = unet_fast.UNetS2DInference(mcfg)
    prep_f = bf16(fast.prepare(params))

    @jax.jit
    def infer_f(xx):
        return fast.apply_argmax(prep_f, xx)

    print("compiling bf16...", flush=True)
    mask_f = np.asarray(infer_f(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = infer_f(x)
    float(out.sum())
    dt_f = (time.perf_counter() - t0) / reps
    print(f"bf16/xla      {dt_f * 1e3:7.2f} ms/step "
          f"{batch / dt_f:8.1f} img/s", flush=True)

    # --- int8 resident Pallas (4-D flat vs padded-flat) ------------------
    unet_fast._PALLAS_CONV = "auto"
    q = UNetS2DInt8(mcfg, padflat=False)
    print("calibrating...", flush=True)
    prep_q = bf16(q.prepare(params, calib_batches=[calib]))

    dt_best = None
    for label, model_q in (
        ("int8/pallas", q),
        ("int8/padflat", UNetS2DInt8(mcfg, padflat=True)),
    ):
        infer_q = jax.jit(
            lambda xx, m=model_q: m.apply_argmax(prep_q, xx)
        )
        print(f"compiling {label}...", flush=True)
        mask_q = np.asarray(infer_q(x))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = infer_q(x)
        float(out.sum())
        dt_q = (time.perf_counter() - t0) / reps
        agree = float((mask_q == mask_f).mean())
        print(f"{label:13s} {dt_q * 1e3:7.2f} ms/step "
              f"{batch / dt_q:8.1f} img/s  agree={agree:.6f}", flush=True)
        assert agree > 0.985, (label, agree)
        dt_best = dt_q if dt_best is None else min(dt_best, dt_q)

    # --- bf16 padded-flat -------------------------------------------------
    pfb = unet_fast.UNetS2DInference(mcfg, padflat=True)
    infer_pfb = jax.jit(lambda xx: pfb.apply_argmax(prep_f, xx))
    print("compiling bf16/padflat...", flush=True)
    mask_b = np.asarray(infer_pfb(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = infer_pfb(x)
    float(out.sum())
    dt_b = (time.perf_counter() - t0) / reps
    agree_b = float((mask_b == mask_f).mean())
    print(f"bf16/padflat  {dt_b * 1e3:7.2f} ms/step "
          f"{batch / dt_b:8.1f} img/s  agree={agree_b:.6f}", flush=True)

    print(f"speedup best-int8 vs bf16/xla: {dt_f / dt_best:.3f}x")
    print("DONE")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
