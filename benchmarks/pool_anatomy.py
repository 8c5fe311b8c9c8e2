"""Train pool4 (slot-max + argmax-index VJP) cost decomposition.

The train profile shows ~21 ms/step of compare_select fusions at
512²/B=128. The suspected cause: the pool operates on C=32 lane slices
of the [.., 4C=128] packed tensor — quarter-lane VPU work — and the
backward's 4 where() + concat does the same. Probes (level-1 shapes,
[128, 127, 127, 128] bf16):
  xla fwd        — jitted _pool4_argmax as trained today
  xla bwd        — jitted _pool4_bwd
  pallas fwd     — full-lane kernel: slot max via lane rolls, argmax
                   via rolled equality selects, one masked store
  pallas bwd     — full-lane kernel: replicate g/idx across the 4 slot
                   groups with lane rolls, one where, full store

Usage: python benchmarks/pool_anatomy.py [batch] [iters]
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
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from segmentation_tpu.models.unet_fast import (
        _pool4_argmax,
        _pool4_bwd,
    )

    print(f"[{time.strftime('%H:%M:%S')}] init {jax.devices()[0]}",
          flush=True)
    B = batch
    key = jax.random.PRNGKey(0)

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

    def loop(op, args):
        @jax.jit
        def run(args):
            def body(carry, _):
                c, a = carry
                a = lax.optimization_barrier(a)
                out = lax.optimization_barrier(op(*a))
                o0 = jax.tree_util.tree_leaves(out)[0]
                c = c + o0.ravel()[0].astype(jnp.float32) * 1e-30
                return (c, a), None

            (c, _), _ = lax.scan(
                body, (jnp.float32(0.0), args), None, length=iters
            )
            return c

        return functools.partial(run, tuple(args))

    def timed(name, op, *args):
        try:
            fn = loop(op, args)
            float(fn())
            t0 = time.perf_counter()
            float(fn())
            dt = max(time.perf_counter() - t0 - null, 1e-9) / iters
            print(f"{name:22s} {dt * 1e3:8.3f} ms", flush=True)
            return dt
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s} FAILED: {str(e)[:160]}", flush=True)
            return None

    for (hp, c4) in ((127, 128), (63, 256)):
        c = c4 // 4
        x4 = jax.jit(
            lambda k: jax.random.normal(k, (B, hp, hp, c4), jnp.bfloat16)
        )(jax.random.fold_in(key, hp))
        g = jax.jit(
            lambda k: jax.random.normal(k, (B, hp, hp, c), jnp.bfloat16)
        )(jax.random.fold_in(key, hp + 1))
        idx = jax.jit(lambda xx: _pool4_argmax(xx)[1])(x4)
        x4.block_until_ready()

        timed(f"L{hp} xla fwd", _pool4_argmax, x4)
        timed(f"L{hp} xla bwd", lambda i_, g_: _pool4_bwd(i_, g_)[0],
              idx, g)

        # ---- pallas fwd: full-lane slot max + argmax ------------------
        # rows per block: keep ~1 MB blocks
        rb = max(1, (1 << 20) // (hp * c4 * 2))
        nb = -(-hp // rb)

        def k_fwd(xr, yr, ir):
            xm = xr[0].astype(jnp.float32)  # [rb*hp, c4]
            r1 = pltpu.roll(xm, c4 - c, 1)     # group s+1 at s
            m1 = jnp.maximum(xm, r1)
            m = jnp.maximum(m1, pltpu.roll(m1, c4 - 2 * c, 1))
            # m[:, 0:c] = max over all 4 groups
            win = m[:, :c]
            # first-hit argmax: si = 3 - (hits with si'>=si ... ) — use
            # explicit compare chain on rolled copies
            i0 = jnp.zeros_like(win, jnp.int32)
            best = xm[:, :c]
            for si in range(1, 4):
                cand = pltpu.roll(xm, c4 - si * c, 1)[:, :c]
                w_ = cand > best
                best = jnp.maximum(best, cand)
                i0 = jnp.where(w_, jnp.int32(si), i0)
            yr[0, :, :] = win.astype(jnp.bfloat16)
            ir[0, :, :] = i0

        xf = x4.reshape(B, hp * hp, c4)
        blk = pl.BlockSpec((1, rb * hp, c4), lambda n, i: (n, i, 0),
                           memory_space=pltpu.VMEM)
        yblk = pl.BlockSpec((1, rb * hp, c), lambda n, i: (n, i, 0),
                            memory_space=pltpu.VMEM)
        iblk = pl.BlockSpec((1, rb * hp, c), lambda n, i: (n, i, 0),
                            memory_space=pltpu.VMEM)

        def pfwd(xx):
            return pl.pallas_call(
                k_fwd,
                out_shape=(
                    jax.ShapeDtypeStruct((B, nb * rb * hp, c),
                                         jnp.bfloat16),
                    jax.ShapeDtypeStruct((B, nb * rb * hp, c),
                                         jnp.int32),
                ),
                grid=(B, nb),
                in_specs=[blk],
                out_specs=(yblk, iblk),
            )(xx)

        timed(f"L{hp} pallas fwd", pfwd, xf)

        # ---- pallas bwd: replicate g across groups, one where ---------
        gf = g.reshape(B, hp * hp, c)
        idxf = idx.reshape(B, hp * hp, c).astype(jnp.int32)

        def k_bwd(gr, ir, outr):
            gv = gr[0].astype(jnp.float32)  # [rows, c]
            iv = ir[0]
            g4 = jnp.concatenate([gv] * 4, axis=1)
            i4 = jnp.concatenate([iv] * 4, axis=1)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (1, c4), 1) // c
            outr[0, :, :] = jnp.where(
                i4 == lane, g4, 0.0
            ).astype(jnp.bfloat16)

        gblk = pl.BlockSpec((1, rb * hp, c), lambda n, i: (n, i, 0),
                            memory_space=pltpu.VMEM)
        oblk = pl.BlockSpec((1, rb * hp, c4), lambda n, i: (n, i, 0),
                            memory_space=pltpu.VMEM)

        def pbwd(gg, ii):
            return pl.pallas_call(
                k_bwd,
                out_shape=jax.ShapeDtypeStruct((B, nb * rb * hp, c4),
                                               jnp.bfloat16),
                grid=(B, nb),
                in_specs=[gblk, gblk],
                out_specs=oblk,
            )(gg, ii)

        timed(f"L{hp} pallas bwd", pbwd, gf, idxf)

    print("DONE", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
