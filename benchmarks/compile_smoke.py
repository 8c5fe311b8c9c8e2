"""Compile-smoke of the three at-risk serving paths on real TPU.

Round-4 context: the scoped-VMEM byte model (`_fit_r`) under-prices the
f32 pre-cast pool epilogue (commit ef8362f) — measured 23.58M actual vs
13.00M model at the 1024² bf16 pool site — and the c2_2 r=32 pin
(commit 9abee8a) landed after the bf16 512² sweep was last run on
hardware. This harness compiles + runs one step of each path and
reports pass/fail + step time, so byte-model changes are verified
against the real Mosaic allocator, not the model itself.

Paths:
  1. int8 512² `apply_argmax` (the headline serving path)
  2. bf16 512² `apply_argmax` (same graph, float kernels)
  3. bf16 1024² fast-layout MC dropout (bench's Bayesian metric)

Usage: python benchmarks/compile_smoke.py [1|2|3 ...]  (default: all)
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.models.unet import UNet
from segmentation_tpu.models.unet_fast import UNetS2DInference
from segmentation_tpu.nn import module as hk


def _log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _bf16(t):
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, t,
    )


def _params(cfg):
    um = UNet(cfg, levels=4)
    fwd = hk.transform(lambda x: um(x))
    params, _ = fwd.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 192, 192, 3), jnp.bfloat16),
        train=False,
    )
    return jax.device_get(params)


def _run(tag, fn, *args):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready()
            if hasattr(a, "block_until_ready") else a, out)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready()
            if hasattr(a, "block_until_ready") else a, out)
        ts = time.perf_counter() - t0
        _log(f"{tag}: PASS compile={tc:.1f}s step={ts*1e3:.2f} ms")
        return True
    except Exception as e:  # noqa: BLE001
        _log(f"{tag}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return False


def smoke_int8_512():
    from segmentation_tpu.models.unet_int8 import UNetS2DInt8

    cfg = ModelConfig(name="unet", n_classes=2, input_dims=(512, 512),
                      n_kernels=32)
    q = UNetS2DInt8(cfg, padflat=True)
    calib = [np.random.default_rng(7).random((4, 512, 512, 3))
             .astype(np.float32)]
    prep = _bf16(q.prepare(_params(cfg), calib_batches=calib))
    x = jax.jit(lambda k: jax.random.uniform(
        k, (128, 512, 512, 3), jnp.bfloat16))(jax.random.PRNGKey(3))
    x.block_until_ready()
    fn = jax.jit(lambda xx: q.apply_argmax(prep, xx))
    return _run("int8-512-argmax-B128", fn, x)


def smoke_bf16_512():
    cfg = ModelConfig(name="unet", n_classes=2, input_dims=(512, 512),
                      n_kernels=32)
    fast = UNetS2DInference(cfg)
    prep = _bf16(fast.prepare(_params(cfg)))
    x = jax.jit(lambda k: jax.random.uniform(
        k, (128, 512, 512, 3), jnp.bfloat16))(jax.random.PRNGKey(3))
    x.block_until_ready()
    fn = jax.jit(lambda xx: fast.apply_argmax(prep, xx))
    return _run("bf16-512-argmax-B128", fn, x)


def smoke_mcfast_1024():
    from segmentation_tpu.training.bayesian import mc_sample_fast

    cfg = ModelConfig(name="unet", n_classes=2, input_dims=(1024, 1024),
                      n_kernels=32, bayesian=True)
    fast = UNetS2DInference(cfg)
    prep = _bf16(fast.prepare(_params(cfg)))
    x = jax.jit(lambda k: jax.random.uniform(
        k, (2, 1024, 1024, 3), jnp.bfloat16))(jax.random.PRNGKey(4))
    x.block_until_ready()

    @jax.jit
    def mcf(xx, rng):
        s = mc_sample_fast(fast, prep, rng, xx, 8, 4)
        return jnp.mean(s, 0).sum() + jnp.var(s, 0).sum()

    return _run("bf16-1024-mcfast-S8sp4-B2", mcf, x,
                jax.random.PRNGKey(5))


if __name__ == "__main__":
    which = [int(a) for a in sys.argv[1:]] or [1, 2, 3]
    _log(f"device: {jax.devices()[0]}")
    fns = {1: smoke_int8_512, 2: smoke_bf16_512, 3: smoke_mcfast_1024}
    ok = all([fns[i]() for i in which])
    _log("ALL PASS" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)
