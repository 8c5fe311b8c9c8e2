"""Isolate the 1024² fast-layout compile failure (VERDICT r5 trail).

The packed MC graph at 1024² crashes the AOT compile helper (HTTP 500,
exit 1 — BENCH_DETAILS round 5). This probes the formulation ladder,
least to most program, to find the largest one that compiles:

  plain      — apply_argmax, B=2 (the non-MC 1024² serving program)
  one_pass   — apply with mc_keys, B=2 (one stochastic forward)
  one_pass8  — apply with mc_keys, B=8 (sp=4 batch-tiled body)
  map_sp1    — mc_sample_fast S=8 sp=1 (lax.map over 8 passes)
  map_sp4    — mc_sample_fast S=8 sp=4 (the bench formulation that dies)
  loop8      — 8 keyed one_pass dispatches + host moments (no lax.map;
               measures what a Python-loop route would actually deliver)

Usage: python benchmarks/mc1024_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet_fast import UNetS2D, UNetS2DInference
    from segmentation_tpu.nn import module as hk
    from segmentation_tpu.training.bayesian import mc_sample_fast

    print(f"[{time.strftime('%H:%M:%S')}] {jax.devices()[0]}", flush=True)
    bcfg = ModelConfig(name="unet", n_classes=2, input_dims=(1024, 1024),
                       n_kernels=32, bayesian=True)
    bmodel = UNetS2D(bcfg)
    bfwd = hk.transform(lambda x: bmodel(x))
    bparams, _ = bfwd.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 192, 192, 3), jnp.bfloat16),
        train=False,
    )
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, t)
    fast = UNetS2DInference(bcfg)
    prep = bf16(fast.prepare(jax.device_get(bf16(bparams))))

    x2 = jax.jit(lambda k: jax.random.uniform(
        k, (2, 1024, 1024, 3), jnp.bfloat16))(jax.random.PRNGKey(4))
    x2.block_until_ready()

    def timed(tag, fn, *args):
        try:
            t0 = time.perf_counter()
            float(fn(*args))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(fn(*args))
            dt = time.perf_counter() - t0
            print(f"{tag:10s} OK  compile {tc:6.1f}s  run {dt * 1e3:8.1f} ms",
                  flush=True)
            return True, dt
        except Exception as e:  # noqa: BLE001
            print(f"{tag:10s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return False, None

    @jax.jit
    def plain(x):
        return fast.apply_argmax(prep, x).astype(jnp.float32).sum()

    timed("plain", plain, x2)

    @jax.jit
    def one_pass(x, k):
        k1, k2 = jax.random.split(k)
        return jax.nn.sigmoid(
            fast.apply(prep, x, mc_keys=(k1, k2)).astype(jnp.float32)
        ).sum()

    ok1, dt1 = timed("one_pass", one_pass, x2, jax.random.PRNGKey(7))

    x8 = jax.jit(lambda k: jax.random.uniform(
        k, (8, 1024, 1024, 3), jnp.bfloat16))(jax.random.PRNGKey(5))
    x8.block_until_ready()

    @jax.jit
    def one_pass8(x, k):
        k1, k2 = jax.random.split(k)
        return jax.nn.sigmoid(
            fast.apply(prep, x, mc_keys=(k1, k2)).astype(jnp.float32)
        ).sum()

    ok8, dt8 = timed("one_pass8", one_pass8, x8, jax.random.PRNGKey(7))
    x8.delete()

    for sp, tag in ((1, "map_sp1"), (4, "map_sp4")):
        @jax.jit
        def mc(x, rng, sp=sp):
            s = mc_sample_fast(fast, prep, rng, x, 8, sp)
            return (jnp.mean(s, 0).sum() + jnp.var(s, 0).sum())

        ok, dt = timed(tag, mc, x2, jax.random.PRNGKey(9))
        if ok:
            print(f"  -> {tag} {2 / dt:6.2f} tiles/s", flush=True)

    if ok1:
        # Python-loop route: 8 keyed dispatches, moments via running sums
        @jax.jit
        def pass_probs(x, k):
            k1, k2 = jax.random.split(k)
            return jax.nn.sigmoid(
                fast.apply(prep, x, mc_keys=(k1, k2)).astype(jnp.float32))

        @jax.jit
        def accum(m1, m2, p):
            return m1 + p, m2 + p * p

        p = pass_probs(x2, jax.random.PRNGKey(0))
        m1 = jnp.zeros_like(p)
        float(accum(m1, m1, p)[0].sum())  # warm
        t0 = time.perf_counter()
        m1 = m2 = jnp.zeros_like(p)
        for i in range(8):
            p = pass_probs(x2, jax.random.PRNGKey(10 + i))
            m1, m2 = accum(m1, m2, p)
        mean = m1 / 8
        var = m2 / 8 - mean * mean
        float(mean.sum() + var.sum())
        dt = time.perf_counter() - t0
        print(f"loop8      {dt * 1e3:8.1f} ms  -> {2 / dt:6.2f} tiles/s",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
