"""Fast-layout MC-dropout vs the standard hk path (BASELINE config #5).

Measures S=8 MC samples over B=2 1024² tiles (tiles/s counts each tile
once), sweeping samples_per_pass, for:
  hk      — UNetS2D via hk.transform + mc_sample (round-3 shipped path)
  fast    — UNetS2DInference padflat with explicit mc_keys
            (training.bayesian.mc_sample_fast)

Usage: python benchmarks/mc_fast_bench.py [S] [Bmc]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(S=8, Bmc=2):
    import jax
    import jax.numpy as jnp

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.models.unet_fast import (
        UNetS2D,
        UNetS2DInference,
    )
    from segmentation_tpu.nn import module as hk
    from segmentation_tpu.training.bayesian import mc_sample, mc_sample_fast

    print(f"[{time.strftime('%H:%M:%S')}] init {jax.devices()[0]}",
          flush=True)
    mcfg = ModelConfig(
        name="unet", n_classes=2, input_dims=(1024, 1024), n_kernels=32,
        bayesian=True, dropout_rate=0.5,
    )

    def bf16(t):
        return jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, t,
        )

    xb = jax.jit(
        lambda key: jax.random.uniform(key, (Bmc, 1024, 1024, 3),
                                       jnp.bfloat16)
    )(jax.random.PRNGKey(4))
    xb.block_until_ready()

    # --- hk path (round-3 shipped formulation) --------------------------
    bmodel = UNetS2D(mcfg)
    bfwd = hk.transform(lambda x: bmodel(x))
    bparams, bstate = bfwd.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 192, 192, 3), jnp.bfloat16),
        train=False,
    )
    bparams = bf16(bparams)

    def make_hk(sp):
        @jax.jit
        def mc(x, rng):
            def apply_fn(p, ms, k, xx, train):
                return bfwd.apply(p, ms, k, xx, train=train)

            s = mc_sample(apply_fn, bparams, bstate, rng, x, S, sp)
            return jnp.mean(s, 0).sum() + jnp.var(s, 0).sum()

        return mc

    # --- fast path -------------------------------------------------------
    um = UNet(mcfg, levels=4)
    ufwd = hk.transform(lambda x: um(x))
    uparams, _ = ufwd.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 192, 192, 3), jnp.bfloat16),
        train=False,
    )
    fast = UNetS2DInference(mcfg)
    prep = bf16(fast.prepare(jax.device_get(uparams)))

    def make_fast(sp):
        @jax.jit
        def mc(x, rng):
            s = mc_sample_fast(fast, prep, rng, x, S, sp)
            return jnp.mean(s, 0).sum() + jnp.var(s, 0).sum()

        return mc

    for label, maker, sps in (
        ("hk", make_hk, (4,)),
        ("fast", make_fast, (1, 2, 4, 8)),
    ):
        for sp in sps:
            try:
                mc = maker(sp)
                float(mc(xb, jax.random.PRNGKey(7)))  # compile+warm
                reps = 3
                t0 = time.perf_counter()
                for r in range(reps):
                    float(mc(xb, jax.random.PRNGKey(8 + r)))
                dt = (time.perf_counter() - t0) / reps
                print(f"{label:5s} sp={sp}  {dt * 1e3:8.1f} ms  "
                      f"{Bmc / dt:6.2f} tiles/s", flush=True)
            except Exception as e:
                print(f"{label:5s} sp={sp}  FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
