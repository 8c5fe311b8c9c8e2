"""Software-pipelined kernel probe at the c1_2 site (VERDICT r3 item 1).

kernel_anatomy.py established (v5e, B=128, R=16, s8 in/out, pf2 C=128):
  loads+dots+s8 stores            ~3.9 ms
  + real epilogue+pool (base)      5.93     <- VPU work does NOT hide
  + split stores / x_next patch    7.98     <- the shipped kernel

The epilogue of block i depends on block i's dots, so within one grid
step Mosaic serializes MXU dots -> VPU epilogue -> stores. This probe
delays the epilogue by ONE grid step: step i writes block i's int32
accumulators to a double-buffered VMEM scratch and runs the epilogue +
pool + store for block i-1 (whose acc is already resident). The two
halves are dataflow-independent, so the scheduler may overlap block i's
MXU dots with block i-1's VPU epilogue. Bonus: the last-row patch
completes in the NEXT step (its x_next rows are that step's x_main),
so stores become full-height aligned writes — the +2.05 ms split-store
tax disappears structurally.

Variants:
  base    — dots+epi+pool, wrap-garbage last row (anatomy's 5.93 form)
  mirror  — full structural mirror of the shipped kernel (7.98 form)
  P0      — delayed epilogue, garbage last row (isolates the overlap)
  P1      — delayed epilogue + cross-step patch completion (real form)
  P1r32   — P1 at r_block=32
  intra   — within-step half-block interleave (no cross-step state)

Usage: python benchmarks/pipeline_probe.py [batch] [iters]
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

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    w4c = jnp.asarray(
        rng.integers(-80, 80, (2 * C2, O), dtype=np.int8))  # [512,128]
    w128s = [jnp.asarray(rng.integers(-80, 80, (128, O), dtype=np.int8))
             for _ in range(4)]

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

    def loop(op, x):
        @jax.jit
        def run(xx):
            def body(carry, _):
                c, a = carry
                a = lax.optimization_barrier(a)
                out = op(a)
                c = c + out.ravel()[0].astype(jnp.float32) * 1e-30
                return (c, a), None

            (c, _), _ = lax.scan(
                body, (jnp.float32(0.0), xx), None, length=iters
            )
            return c

        return functools.partial(run, x)

    def timed(name, op, x):
        try:
            fn = loop(op, x)
            float(fn())
            t0 = time.perf_counter()
            float(fn())
            dt = max(time.perf_counter() - t0 - null, 1e-9) / iters
            print(f"{name:24s} {dt * 1e3:8.3f} ms", flush=True)
            return dt * 1e3
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {str(e)[:160]}", flush=True)
            return None

    def d32(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.int32)

    def mk_x(R):
        NB = -(-HP // R)
        x = jax.jit(
            lambda k: jnp.clip(
                jnp.round(jax.random.normal(k, (B, NB * R * S2, C2)) * 40),
                -127, 127,
            ).astype(jnp.int8)
        )(key)
        x.block_until_ready()
        return x, NB

    def epi2(a):
        sc = jnp.full((1, O), 3e-4, jnp.float32)
        bias = jnp.full((1, O), 0.1, jnp.float32)
        return a.astype(jnp.float32) * sc + bias

    def fin(v):
        return jnp.clip(jnp.round(v * jnp.float32(31.0)), 0.0,
                        127.0).astype(jnp.int8)

    def pool(y):
        m = jnp.maximum(y, pltpu.roll(y, O // 2, 1))
        m = jnp.maximum(m, pltpu.roll(m, O - O // 4, 1))
        return fin(m[:, : O // 4])

    def parities(xm, wr, w0, w1, w2, w3):
        z4 = jnp.concatenate([xm, cf._rolldn8(xm, S2)], axis=1)
        acc_e = d32(z4, wr[:])
        xmL, xmH = xm[:, :128], xm[:, 128:]
        po0 = d32(xmH, w0[:]) + cf._rolldn(d32(xmL, w1[:]), 1)
        po1 = d32(xmH, w2[:]) + cf._rolldn(d32(xmL, w3[:]), 1)
        acc_o = po0 + cf._rolldn(po1, S2)
        return acc_e, acc_o

    # ------------------------------------------------------------ base
    def k_base(R):
        def k(xr, wr, w0, w1, w2, w3, outr, pout):
            acc_e, acc_o = parities(xr[0], wr, w0, w1, w2, w3)
            ye, yo = epi2(acc_e), epi2(acc_o)
            outr[0, :, :O] = fin(ye)
            outr[0, :, O:] = fin(yo)
            pout[0, :, : O // 4] = pool(ye)
            pout[0, :, O // 4 :] = pool(yo)

        return k

    # ---------------------------------------------------- full mirror
    def k_mirror(R):
        cut = (R - 1) * S2

        def k(xr, xnr, wr, w0, w1, w2, w3, outr, pout):
            xm, xn = xr[0], xnr[0]
            acc_e, acc_o = parities(xm, wr, w0, w1, w2, w3)
            last_e = d32(xm[cut:], wr[:C2]) + d32(xn, wr[C2:])
            xnL, xnH = xn[:, :128], xn[:, 128:]
            po0 = d32(xm[cut:, 128:], w0[:]) + cf._rolldn(
                d32(xm[cut:, :128], w1[:]), 1)
            last_o = po0 + d32(xnH, w2[:]) + cf._rolldn(d32(xnL, w3[:]), 1)
            ye_m, yo_m = epi2(acc_e[:cut]), epi2(acc_o[:cut])
            ye_l, yo_l = epi2(last_e), epi2(last_o)
            outr[0, 0:cut, 0:O] = fin(ye_m)
            outr[0, 0:cut, O : 2 * O] = fin(yo_m)
            outr[0, cut : R * S2, 0:O] = fin(ye_l)
            outr[0, cut : R * S2, O : 2 * O] = fin(yo_l)
            pout[0, 0:cut, 0 : O // 4] = pool(ye_m)
            pout[0, 0:cut, O // 4 : O // 2] = pool(yo_m)
            pout[0, cut : R * S2, 0 : O // 4] = pool(ye_l)
            pout[0, cut : R * S2, O // 4 : O // 2] = pool(yo_l)

        return k

    def call_std(kern, R, NB, ins, ispecs, **cp):
        grid = (B, NB)
        o2blk = pl.BlockSpec((1, R * S2, 2 * O), lambda n, i: (n, i, 0),
                             memory_space=pltpu.VMEM)
        pblk = pl.BlockSpec((1, R * S2, O // 2), lambda n, i: (n, i, 0),
                            memory_space=pltpu.VMEM)
        kw = {}
        if cp:
            kw["compiler_params"] = pltpu.CompilerParams(**cp)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((B, NB * R * S2, 2 * O), jnp.int8),
                jax.ShapeDtypeStruct((B, NB * R * S2, O // 2), jnp.int8),
            ),
            grid=grid, in_specs=ispecs, out_specs=(o2blk, pblk), **kw,
        )(*ins)[0]

    # ------------------------------------------- delayed-epilogue (P*)
    def k_pipe(R, NB, patch):
        """Step i: dots(block i) -> scratch slot i%2 (+ partial last
        row); epilogue+pool+store block i-1 from slot (i-1)%2, last row
        completed from this step's xn ref (= image row i*R)."""
        cut = (R - 1) * S2

        def k(xr, xnr, wr, w0, w1, w2, w3, outr, pout, acc):
            i = pl.program_id(1)

            @pl.when(i < NB)
            def _():
                xm = xr[0]
                acc_e, acc_o = parities(xm, wr, w0, w1, w2, w3)
                p = i % 2
                if patch:
                    # rows [cut:]: keep only the xm-local partials (the
                    # roll-based values there are wrap garbage)
                    pe = d32(xm[cut:], wr[:C2])
                    po0 = d32(xm[cut:, 128:], w0[:]) + cf._rolldn(
                        d32(xm[cut:, :128], w1[:]), 1)
                    acc[p, 0:cut, 0:O] = acc_e[:cut]
                    acc[p, 0:cut, O : 2 * O] = acc_o[:cut]
                    acc[p, cut : R * S2, 0:O] = pe
                    acc[p, cut : R * S2, O : 2 * O] = po0
                else:
                    acc[p, :, 0:O] = acc_e
                    acc[p, :, O : 2 * O] = acc_o

            @pl.when(i > 0)
            def _():
                q = (i + 1) % 2
                ae = acc[q, :, 0:O]
                ao = acc[q, :, O : 2 * O]
                if patch:
                    xn = xnr[0]
                    xnL, xnH = xn[:, :128], xn[:, 128:]
                    add_e = d32(xn, wr[C2:])
                    add_o = d32(xnH, w2[:]) + cf._rolldn(
                        d32(xnL, w3[:]), 1)
                    ye = jnp.concatenate(
                        [epi2(ae[:cut]), epi2(ae[cut:] + add_e)], axis=0)
                    yo = jnp.concatenate(
                        [epi2(ao[:cut]), epi2(ao[cut:] + add_o)], axis=0)
                else:
                    ye, yo = epi2(ae[:]), epi2(ao[:])
                outr[0, :, :O] = fin(ye)
                outr[0, :, O:] = fin(yo)
                pout[0, :, : O // 4] = pool(ye)
                pout[0, :, O // 4 :] = pool(yo)

        return k

    def call_pipe(R, NB, x, patch, **cp):
        grid = (B, NB + 1)
        blk = pl.BlockSpec(
            (1, R * S2, C2),
            lambda n, i: (n, jnp.minimum(i, NB - 1), 0),
            memory_space=pltpu.VMEM,
        )
        # patch row for block i-1 = image row i*R (flat rows i*R*S2..)
        nblk = pl.BlockSpec(
            (1, S2, C2),
            lambda n, i: (n, jnp.minimum(i * R, HP - 1), 0),
            memory_space=pltpu.VMEM,
        )
        wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        o2blk = pl.BlockSpec(
            (1, R * S2, 2 * O),
            lambda n, i: (n, jnp.maximum(i - 1, 0), 0),
            memory_space=pltpu.VMEM,
        )
        pblk = pl.BlockSpec(
            (1, R * S2, O // 2),
            lambda n, i: (n, jnp.maximum(i - 1, 0), 0),
            memory_space=pltpu.VMEM,
        )
        kw = {}
        if cp:
            kw["compiler_params"] = pltpu.CompilerParams(**cp)
        return pl.pallas_call(
            k_pipe(R, NB, patch),
            out_shape=(
                jax.ShapeDtypeStruct((B, NB * R * S2, 2 * O), jnp.int8),
                jax.ShapeDtypeStruct((B, NB * R * S2, O // 2), jnp.int8),
            ),
            grid=grid,
            in_specs=[blk, nblk, wspec] + [wspec] * 4,
            out_specs=(o2blk, pblk),
            scratch_shapes=[
                pltpu.VMEM((2, R * S2, 2 * O), jnp.int32)
            ],
            **kw,
        )(x, x, w4c, *w128s)[0]

    # -------------------------------------- intra-step half interleave
    def k_intra(R):
        half = R // 2 * S2
        cutw = R * S2  # no patch: garbage last row, like base

        def k(xr, wr, w0, w1, w2, w3, outr, pout):
            xm = xr[0]
            a_e0, a_o0 = parities(xm[:half], wr, w0, w1, w2, w3)
            a_e1, a_o1 = parities(xm[half:cutw], wr, w0, w1, w2, w3)
            ye0, yo0 = epi2(a_e0), epi2(a_o0)
            outr[0, :half, :O] = fin(ye0)
            outr[0, :half, O:] = fin(yo0)
            pout[0, :half, : O // 4] = pool(ye0)
            pout[0, :half, O // 4 :] = pool(yo0)
            ye1, yo1 = epi2(a_e1), epi2(a_o1)
            outr[0, half:, :O] = fin(ye1)
            outr[0, half:, O:] = fin(yo1)
            pout[0, half:, : O // 4] = pool(ye1)
            pout[0, half:, O // 4 :] = pool(yo1)

        return k

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    for R in (16,):
        x, NB = mk_x(R)
        blk = pl.BlockSpec((1, R * S2, C2), lambda n, i: (n, i, 0),
                           memory_space=pltpu.VMEM)
        nblk = pl.BlockSpec(
            (1, S2, C2),
            lambda n, i: (n, jnp.minimum(i * R + R, HP - 1), 0),
            memory_space=pltpu.VMEM,
        )
        timed(f"base R={R}", lambda a: call_std(
            k_base(R), R, NB, [a, w4c] + w128s,
            [blk, wspec] + [wspec] * 4), x)
        timed(f"mirror R={R}", lambda a: call_std(
            k_mirror(R), R, NB, [a, a, w4c] + w128s,
            [blk, nblk, wspec] + [wspec] * 4), x)
        timed(f"intra R={R}", lambda a: call_std(
            k_intra(R), R, NB, [a, w4c] + w128s,
            [blk, wspec] + [wspec] * 4), x)
        timed(f"P0 delayed R={R}", lambda a: call_pipe(
            R, NB, a, patch=False), x)
        timed(f"P1 delayed+patch R={R}", lambda a: call_pipe(
            R, NB, a, patch=True), x)
        timed(f"P1 vmem96M R={R}", lambda a: call_pipe(
            R, NB, a, patch=True,
            vmem_limit_bytes=96 * 1024 * 1024), x)
        x.delete()

    for R in (32, 64):
        try:
            x, NB = mk_x(R)
        except Exception as e:  # noqa: BLE001
            print(f"R={R} input FAILED: {e}", flush=True)
            continue
        timed(f"P1 delayed+patch R={R}", lambda a: call_pipe(
            R, NB, a, patch=True), x)
        x.delete()

    print("DONE", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
