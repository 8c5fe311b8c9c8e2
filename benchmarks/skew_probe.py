"""Can Mosaic overlap the VPU epilogue with MXU dots? (directive r4#1)

The roofline gap analysis says ~20 ms/step of the serving path is
VPU-serial epilogue + store structure that runs AFTER the block's dots
finish (the kernels compute all dots for an r_block, then run the
requant epilogue + pool on the whole block — one long dependence
chain, so the MXU idles during the epilogue and vice versa).

TPU cores issue vector and matrix ops to separate pipelines; two
data-INDEPENDENT chains adjacent in program order can overlap. This
probe restructures the level-1 c1_2 site (the biggest epilogue tax:
B=128, [2048,512]@[512,128] s8 dots + requant+pool+s8 stores per grid
step) into row chunks and interleaves chunk c+1's dot with chunk c's
epilogue:

  mono      — shipped structure: all dots -> epilogue -> pool -> store
  chunk{n}  — n chunks, natural order (dot c; epi c; store c): tests
              whether Mosaic's scheduler overlaps without manual skew
  skew{n}   — n chunks, software-pipelined: dot(c) issued before
              epilogue(c-1), one-chunk flush at the end

All variants compute identical math (even-parity stacked-K form of
conv2x2_pf2 + requant epilogue + slot pool, pre-cast pooling). If
skew/chunk beat mono by ~the epilogue time, the shipped kernels get
the same restructure; if they tie, the VPU/MXU serialization is a
Mosaic scheduling fact and the roofline's epilogue term is real cost
(escalate the formulation instead).

Usage: python benchmarks/skew_probe.py [batch] [iters]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=128, iters=30):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from segmentation_tpu.nn.pallas import conv_flat as cf

    print(f"[{time.strftime('%H:%M:%S')}] init {jax.devices()[0]}",
          flush=True)

    B, HP, S2, C2, O = batch, 255, 128, 256, 128
    R = 16
    M = R * S2  # flat rows per block
    NB = -(-HP // R)
    grid = (B, NB)

    key = jax.random.PRNGKey(0)
    x = jax.jit(
        lambda k: jnp.clip(
            jnp.round(jax.random.normal(k, (B, NB * M, C2)) * 40),
            -127, 127,
        ).astype(jnp.int8)
    )(key)
    x.block_until_ready()
    rng = np.random.default_rng(0)
    w4c = jnp.asarray(rng.integers(-80, 80, (2 * C2, O), dtype=np.int8))
    bias = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))
    cs = jnp.asarray((rng.random(O) * 1e-2 + 1e-3).astype(np.float32))
    oi = jnp.asarray(np.float32(0.37)).reshape(1, 1)

    blk = pl.BlockSpec((1, M, C2), lambda n, i: (n, i, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)
    yspec = pl.BlockSpec((1, M, O), lambda n, i: (n, i, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, M, O // 4), lambda n, i: (n, i, 0),
                         memory_space=pltpu.VMEM)

    def pool(yp):
        m = jnp.maximum(yp, pltpu.roll(yp, O // 2, 1))
        m = jnp.maximum(m, pltpu.roll(m, O - O // 4, 1))
        return m[:, : O // 4]

    def wrap(body):
        def kern(xr, wr, csr, br, oir, yr, pr):
            nonlocal_cs = csr[:]
            nonlocal_b = br[:]
            nonlocal_oi = oir[0, 0]

            def epi_parts2(acc):
                y = acc.astype(jnp.float32)
                y = y * (nonlocal_cs * nonlocal_oi) + (
                    nonlocal_b * nonlocal_oi
                )
                y = jnp.maximum(y, 0.0)

                def finish(v):
                    return jnp.clip(jnp.round(v), -127.0,
                                    127.0).astype(jnp.int8)

                return y, finish

            body(xr, wr, yr, pr, epi_parts2)

        return kern

    def b_mono(xr, wr, yr, pr, ep):
        z4 = jnp.concatenate([xr[0], cf._rolldn8(xr[0], S2)], axis=1)
        acc = jnp.dot(z4, wr[:], preferred_element_type=jnp.int32)
        yp, finish = ep(acc)
        yr[0] = finish(yp)
        pr[0] = finish(pool(yp))

    def b_chunk(nc):
        def body(xr, wr, yr, pr, ep):
            g = M // nc
            z4 = jnp.concatenate([xr[0], cf._rolldn8(xr[0], S2)],
                                 axis=1)
            for c in range(nc):
                acc = jnp.dot(z4[c * g : (c + 1) * g], wr[:],
                              preferred_element_type=jnp.int32)
                yp, finish = ep(acc)
                yr[0, c * g : (c + 1) * g] = finish(yp)
                pr[0, c * g : (c + 1) * g] = finish(pool(yp))

        return body

    def b_skew(nc):
        def body(xr, wr, yr, pr, ep):
            g = M // nc
            z4 = jnp.concatenate([xr[0], cf._rolldn8(xr[0], S2)],
                                 axis=1)

            def emit(c, acc):
                yp, finish = ep(acc)
                yr[0, c * g : (c + 1) * g] = finish(yp)
                pr[0, c * g : (c + 1) * g] = finish(pool(yp))

            pend = None
            for c in range(nc):
                acc = jnp.dot(z4[c * g : (c + 1) * g], wr[:],
                              preferred_element_type=jnp.int32)
                if pend is not None:
                    emit(*pend)
                pend = (c, acc)
            emit(*pend)

        return body

    # epilogue-only and dot-only floors for the overlap arithmetic
    def b_dotonly(xr, wr, yr, pr, ep):
        z4 = jnp.concatenate([xr[0], cf._rolldn8(xr[0], S2)], axis=1)
        acc = jnp.dot(z4, wr[:], preferred_element_type=jnp.int32)
        yr[0] = acc.astype(jnp.int8)
        pr[0] = acc[:, : O // 4].astype(jnp.int8)

    def b_epionly(xr, wr, yr, pr, ep):
        acc = xr[0, :, :O].astype(jnp.int32)
        yp, finish = ep(acc)
        yr[0] = finish(yp)
        pr[0] = finish(pool(yp))

    def mkcall(body):
        kern = wrap(body)

        def op(a):
            return pl.pallas_call(
                kern,
                out_shape=(
                    jax.ShapeDtypeStruct((B, NB * M, O), jnp.int8),
                    jax.ShapeDtypeStruct((B, NB * M, O // 4), jnp.int8),
                ),
                grid=grid,
                in_specs=[blk, wspec, wspec, wspec, sspec],
                out_specs=(yspec, pspec),
                interpret=os.environ.get("SEG_PALLAS_INTERPRET") == "1",
            )(a, w4c, cs, bias, oi)[0]

        return op

    # null-calibrated scan-loop timing (same as kernel_anatomy)
    @jax.jit
    def _n(z):
        return z + 1.0

    float(_n(jnp.float32(0)))
    t = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(_n(jnp.float32(0)))
        t.append(time.perf_counter() - t0)
    null = min(t)
    print(f"null dispatch = {null * 1e3:.1f} ms", flush=True)

    def loop(op):
        @jax.jit
        def run(xx):
            def bodyf(carry, _):
                c, a = carry
                a = lax.optimization_barrier(a)
                out = op(a)
                c = c + out.ravel()[0].astype(jnp.float32) * 1e-30
                return (c, a), None

            (c, _), _ = lax.scan(
                bodyf, (jnp.float32(0.0), xx), None, length=iters
            )
            return c

        return functools.partial(run, x)

    results = {}

    def timed(name, op):
        try:
            fn = loop(op)
            float(fn())
            t0 = time.perf_counter()
            float(fn())
            dt = max(time.perf_counter() - t0 - null, 1e-9) / iters
            results[name] = dt * 1e3
            print(f"{name:22s} {dt * 1e3:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s} FAILED: {str(e)[:160]}", flush=True)

    timed("dot-only", mkcall(b_dotonly))
    timed("epi-only", mkcall(b_epionly))
    timed("mono (shipped)", mkcall(b_mono))
    for nc in (2, 4, 8, 16):
        timed(f"chunk{nc}", mkcall(b_chunk(nc)))
    for nc in (2, 4, 8, 16):
        timed(f"skew{nc}", mkcall(b_skew(nc)))

    if "mono (shipped)" in results:
        best = min((v, k) for k, v in results.items()
                   if k.startswith(("chunk", "skew")))
        print(f"\nbest restructure: {best[1]} = {best[0]:.3f} ms "
              f"vs mono {results['mono (shipped)']:.3f} ms", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
