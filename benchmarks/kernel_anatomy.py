"""Decompose the padflat kernel cost at the c1_2 site (the top serving
op: 8.1 ms isolated vs a 2.9 ms roofline).

Measures, at the same grid/block shapes as conv2x2_pf2 level 1
(B=128, s2=128, hp=255, 2C=256 lanes int8, r_block=16):
  copy        — load block + store block (achievable HBM BW)
  dot256      — one [R*S, 256] @ [256, 128] s8 dot per block
  dot512      — one [R*S, 512] @ [512, 128] s8 dot (stacked-4C form)
  dot256x2    — two K=256 dots (the current stacked-pair form's MXU work)
  concat+2dot — current form: bitcast roll + concat to 2C, two dots
  full        — conv2x2_pf2 quant+pool (the shipped kernel)

Usage: python benchmarks/kernel_anatomy.py [batch] [iters]
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
    NB = -(-HP // R)
    grid = (B, NB)

    key = jax.random.PRNGKey(0)
    x = jax.jit(
        lambda k: jnp.clip(
            jnp.round(jax.random.normal(k, (B, NB * R * S2, C2)) * 40),
            -127, 127,
        ).astype(jnp.int8)
    )(key)
    x.block_until_ready()
    rng = np.random.default_rng(0)
    w256 = jnp.asarray(
        rng.integers(-80, 80, (C2, O), dtype=np.int8))
    w512 = jnp.asarray(
        rng.integers(-80, 80, (2 * C2, O), dtype=np.int8))

    blk = pl.BlockSpec((1, R * S2, C2), lambda n, i: (n, i, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((1, R * S2, O), lambda n, i: (n, i, 0),
                        memory_space=pltpu.VMEM)
    cblk = pl.BlockSpec((1, R * S2, C2), lambda n, i: (n, i, 0),
                        memory_space=pltpu.VMEM)

    def k_copy(xr, outr):
        outr[0] = xr[0]

    def k_dot256(xr, wr, outr):
        outr[0] = jnp.dot(xr[0], wr[:],
                          preferred_element_type=jnp.int32)

    def k_dot256x2(xr, wr, wr2, outr):
        a = jnp.dot(xr[0], wr[:], preferred_element_type=jnp.int32)
        b = jnp.dot(xr[0], wr2[:], preferred_element_type=jnp.int32)
        outr[0] = a + b

    def k_dot512(xr, wr, outr):
        z = jnp.concatenate([xr[0], xr[0]], axis=1)
        outr[0] = jnp.dot(z, wr[:], preferred_element_type=jnp.int32)

    def k_concat2dot(xr, wr, wr2, outr):
        # mirrors the stacked-pair form: roll+concat to 2x lanes, two
        # K=2*lanes dots, product roll + add
        z = jnp.concatenate([xr[0], cf._rolldn8(xr[0], S2)], axis=1)
        a = jnp.dot(z, wr[:], preferred_element_type=jnp.int32)
        b = jnp.dot(z, wr2[:], preferred_element_type=jnp.int32)
        outr[0] = a + cf._rolldn(b, 1)

    def call(kern, ins, ispecs, odt=jnp.int32, oshape=None):
        oshape = oshape or (B, NB * R * S2, O)
        ospec = oblk if oshape[-1] == O else cblk
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(oshape, odt),
            grid=grid, in_specs=ispecs, out_specs=ospec,
        )(*ins)

    # null-calibrated scan-loop timing (same as pf2_rblock)
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

    def timed(name, op):
        try:
            fn = loop(op)
            float(fn())
            t0 = time.perf_counter()
            float(fn())
            dt = max(time.perf_counter() - t0 - null, 1e-9) / iters
            print(f"{name:22s} {dt * 1e3:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s} FAILED: {str(e)[:140]}", flush=True)

    w256b = jnp.asarray(
        rng.integers(-80, 80, (C2, O), dtype=np.int8))
    timed("copy", lambda a: call(k_copy, [a], [blk], jnp.int8,
                                 (B, NB * R * S2, C2)))
    timed("dot256", lambda a: call(k_dot256, [a, w256], [blk, wspec]))
    timed("dot256x2", lambda a: call(
        k_dot256x2, [a, w256, w256b], [blk, wspec, wspec]))
    timed("dot512", lambda a: call(k_dot512, [a, w512], [blk, wspec]))
    w512b = jnp.asarray(
        rng.integers(-80, 80, (2 * C2, O), dtype=np.int8))
    timed("concat+2dot", lambda a: call(
        k_concat2dot, [a, w512, w512b], [blk, wspec, wspec]))

    # ---- pf2 parity decomposition (C=128 level-1 site) ----------------
    w4c = jnp.asarray(
        rng.integers(-80, 80, (2 * C2, O), dtype=np.int8))  # [512,128]
    w128 = jnp.asarray(rng.integers(-80, 80, (128, O), dtype=np.int8))

    def k_even512(xr, wr, outr):
        # even parity as shipped: ONE K=512 dot on [xm ; roll_s2(xm)]
        z4 = jnp.concatenate([xr[0], cf._rolldn8(xr[0], S2)], axis=1)
        outr[0] = jnp.dot(z4, wr[:], preferred_element_type=jnp.int32)

    def k_odd4dots(xr, w0, w1, w2, w3, outr):
        # odd parity as shipped: four K=128 dots + product rolls
        xm = xr[0]
        xmL, xmH = xm[:, :128], xm[:, 128:]
        def d(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.int32)
        po0 = d(xmH, w0[:]) + cf._rolldn(d(xmL, w1[:]), 1)
        po1 = d(xmH, w2[:]) + cf._rolldn(d(xmL, w3[:]), 1)
        outr[0] = po0 + cf._rolldn(po1, S2)

    def k_shift1(xr, outr):
        # cost probe: misaligned int8 sublane shift by ONE flat row
        xm = xr[0]
        outr[0] = jnp.concatenate([xm[1:], xm[:1]], axis=0)

    def k_odd512(xr, wr, outr):
        # proposed odd parity: shift xm by one flat row, build the
        # same 4C stack, ONE K=512 dot
        xm = xr[0]
        xs = jnp.concatenate([xm[1:], xm[:1]], axis=0)
        zo = jnp.concatenate(
            [xm[:, 128:], xs[:, :128]], axis=1)  # [xH(j), xL(j+1)]
        z4 = jnp.concatenate([zo, cf._rolldn8(zo, S2)], axis=1)
        outr[0] = jnp.dot(z4, wr[:], preferred_element_type=jnp.int32)

    timed("even K512 (shipped)", lambda a: call(
        k_even512, [a, w4c], [blk, wspec]))
    timed("odd 4xK128 (shipped)", lambda a: call(
        k_odd4dots, [a, w128, w128, w128, w128],
        [blk] + [wspec] * 4))
    timed("shift1 probe", lambda a: call(
        k_shift1, [a], [blk], jnp.int8, (B, NB * R * S2, C2)))
    timed("odd K512 (proposed)", lambda a: call(
        k_odd512, [a, w4c], [blk, wspec]))

    # ---- both parities, s8 store (matches the real kernel's output
    # traffic) — shipped vs odd-K512 form; isolates the MXU delta -----
    def d32(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.int32)

    def k_both_shipped(xr, wr, w0, w1, w2, w3, outr):
        xm = xr[0]
        z4 = jnp.concatenate([xm, cf._rolldn8(xm, S2)], axis=1)
        acc_e = d32(z4, wr[:])
        xmL, xmH = xm[:, :128], xm[:, 128:]
        po0 = d32(xmH, w0[:]) + cf._rolldn(d32(xmL, w1[:]), 1)
        po1 = d32(xmH, w2[:]) + cf._rolldn(d32(xmL, w3[:]), 1)
        acc_o = po0 + cf._rolldn(po1, S2)
        outr[0, :, :O] = acc_e.astype(jnp.int8)
        outr[0, :, O:] = acc_o.astype(jnp.int8)

    def k_both_odd512(xr, wr, outr):
        xm = xr[0]
        z4 = jnp.concatenate([xm, cf._rolldn8(xm, S2)], axis=1)
        acc_e = d32(z4, wr[:])
        xs = jnp.concatenate([xm[1:], xm[:1]], axis=0)
        zo = jnp.concatenate([xm[:, 128:], xs[:, :128]], axis=1)
        z4o = jnp.concatenate([zo, cf._rolldn8(zo, S2)], axis=1)
        acc_o = d32(z4o, wr[:])
        outr[0, :, :O] = acc_e.astype(jnp.int8)
        outr[0, :, O:] = acc_o.astype(jnp.int8)

    def k_both_epi(xr, wr, w0, w1, w2, w3, outr, pout):
        # shipped parities + the real epilogue shape: per-channel scale,
        # bias, relu, requant to s8, plus the slot-max pool store
        xm = xr[0]
        z4 = jnp.concatenate([xm, cf._rolldn8(xm, S2)], axis=1)
        acc_e = d32(z4, wr[:])
        xmL, xmH = xm[:, :128], xm[:, 128:]
        po0 = d32(xmH, w0[:]) + cf._rolldn(d32(xmL, w1[:]), 1)
        po1 = d32(xmH, w2[:]) + cf._rolldn(d32(xmL, w3[:]), 1)
        acc_o = po0 + cf._rolldn(po1, S2)
        sc = jnp.full((1, O), 3e-4, jnp.float32)
        bias = jnp.full((1, O), 0.1, jnp.float32)
        oinv = jnp.float32(31.0)

        def epi(a):
            y = a.astype(jnp.float32) * sc + bias
            y = jnp.maximum(y, 0.0)
            q = jnp.clip(jnp.round(y * oinv), -127, 127)
            return q.astype(jnp.int8), y

        qe, ye = epi(acc_e)
        qo, yo = epi(acc_o)
        outr[0, :, :O] = qe
        outr[0, :, O:] = qo

        def pool(y):
            m = jnp.maximum(y, pltpu.roll(y, O // 2, 1))
            m = jnp.maximum(m, pltpu.roll(m, O - O // 4, 1))
            return jnp.clip(jnp.round(m[:, : O // 4] * oinv),
                            -127, 127).astype(jnp.int8)

        pout[0, :, : O // 4] = pool(ye)
        pout[0, :, O // 4 :] = pool(yo)

    o2blk = pl.BlockSpec((1, R * S2, 2 * O), lambda n, i: (n, i, 0),
                         memory_space=pltpu.VMEM)
    pblk = pl.BlockSpec((1, R * S2, O // 2), lambda n, i: (n, i, 0),
                        memory_space=pltpu.VMEM)

    def call2(kern, ins, ispecs):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, NB * R * S2, 2 * O),
                                           jnp.int8),
            grid=grid, in_specs=ispecs, out_specs=o2blk,
        )(*ins)

    timed("both shipped s8", lambda a: call2(
        k_both_shipped, [a, w4c, w128, w128, w128, w128],
        [blk, wspec] + [wspec] * 4))
    timed("both odd512 s8", lambda a: call2(
        k_both_odd512, [a, w4c], [blk, wspec]))

    def call_epi(kern, ins, ispecs):
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((B, NB * R * S2, 2 * O), jnp.int8),
                jax.ShapeDtypeStruct((B, NB * R * S2, O // 2), jnp.int8),
            ),
            grid=grid, in_specs=ispecs, out_specs=(o2blk, pblk),
        )(*ins)[0]

    timed("both shipped s8+epi+pool", lambda a: call_epi(
        k_both_epi, [a, w4c, w128, w128, w128, w128],
        [blk, wspec] + [wspec] * 4))

    # ---- structural overhead attribution: the real kernel is 8.0 ms vs
    # the 5.9 ms epi probe. Mirror its extra structure piecewise:
    #  A. split stores (4 per output at the cut boundary)
    #  B. x_next ref + last-row patch dots + 4 epi invocations
    #  C. both = full structural mirror (expect ~= shipped 8 ms)
    cut = (R - 1) * S2

    def _mk_epi():
        sc = jnp.full((1, O), 3e-4, jnp.float32)
        bias = jnp.full((1, O), 0.1, jnp.float32)
        oinv = jnp.float32(31.0)

        def epi(a):
            y = a.astype(jnp.float32) * sc + bias
            q = jnp.clip(jnp.round(y * oinv), 0.0, 127.0)
            return q.astype(jnp.int8)

        def pool(q):
            y = q.astype(jnp.int32)
            m = jnp.maximum(y, pltpu.roll(y, O // 2, 1))
            m = jnp.maximum(m, pltpu.roll(m, O - O // 4, 1))
            return m[:, : O // 4].astype(jnp.int8)

        return epi, pool

    def _parities(xm, wr, w0, w1, w2, w3):
        z4 = jnp.concatenate([xm, cf._rolldn8(xm, S2)], axis=1)
        acc_e = d32(z4, wr[:])
        xmL, xmH = xm[:, :128], xm[:, 128:]
        po0 = d32(xmH, w0[:]) + cf._rolldn(d32(xmL, w1[:]), 1)
        po1 = d32(xmH, w2[:]) + cf._rolldn(d32(xmL, w3[:]), 1)
        acc_o = po0 + cf._rolldn(po1, S2)
        return acc_e, acc_o

    def k_split_stores(xr, wr, w0, w1, w2, w3, outr, pout):
        epi, pool = _mk_epi()
        acc_e, acc_o = _parities(xr[0], wr, w0, w1, w2, w3)
        qe, qo = epi(acc_e), epi(acc_o)
        outr[0, 0:cut, 0:O] = qe[:cut]
        outr[0, 0:cut, O : 2 * O] = qo[:cut]
        outr[0, cut : R * S2, 0:O] = qe[cut:]
        outr[0, cut : R * S2, O : 2 * O] = qo[cut:]
        pe, po = pool(qe), pool(qo)
        pout[0, 0:cut, 0 : O // 4] = pe[:cut]
        pout[0, 0:cut, O // 4 : O // 2] = po[:cut]
        pout[0, cut : R * S2, 0 : O // 4] = pe[cut:]
        pout[0, cut : R * S2, O // 4 : O // 2] = po[cut:]

    def k_xnext_patch(xr, xnr, wr, w0, w1, w2, w3, outr, pout):
        epi, pool = _mk_epi()
        xm, xn = xr[0], xnr[0]
        acc_e, acc_o = _parities(xm, wr, w0, w1, w2, w3)
        # last-row patch (4 epi invocations, full-height stores)
        last_e = d32(xm[cut:], wr[:C2]) + d32(xn, wr[C2:])
        xnL, xnH = xn[:, :128], xn[:, 128:]
        po0 = d32(xm[cut:, 128:], w0[:]) + cf._rolldn(
            d32(xm[cut:, :128], w1[:]), 1)
        last_o = po0 + d32(xnH, w2[:]) + cf._rolldn(d32(xnL, w3[:]), 1)
        qe_m, qo_m = epi(acc_e[:cut]), epi(acc_o[:cut])
        qe_l, qo_l = epi(last_e), epi(last_o)
        qe = jnp.concatenate([qe_m, qe_l], axis=0)
        qo = jnp.concatenate([qo_m, qo_l], axis=0)
        outr[0, :, :O] = qe
        outr[0, :, O:] = qo
        pout[0, :, : O // 4] = pool(qe)
        pout[0, :, O // 4 :] = pool(qo)

    def k_full_mirror(xr, xnr, wr, w0, w1, w2, w3, outr, pout):
        epi, pool = _mk_epi()
        xm, xn = xr[0], xnr[0]
        acc_e, acc_o = _parities(xm, wr, w0, w1, w2, w3)
        last_e = d32(xm[cut:], wr[:C2]) + d32(xn, wr[C2:])
        xnL, xnH = xn[:, :128], xn[:, 128:]
        po0 = d32(xm[cut:, 128:], w0[:]) + cf._rolldn(
            d32(xm[cut:, :128], w1[:]), 1)
        last_o = po0 + d32(xnH, w2[:]) + cf._rolldn(d32(xnL, w3[:]), 1)
        qe_m, qo_m = epi(acc_e[:cut]), epi(acc_o[:cut])
        qe_l, qo_l = epi(last_e), epi(last_o)
        outr[0, 0:cut, 0:O] = qe_m
        outr[0, 0:cut, O : 2 * O] = qo_m
        outr[0, cut : R * S2, 0:O] = qe_l
        outr[0, cut : R * S2, O : 2 * O] = qo_l
        pout[0, 0:cut, 0 : O // 4] = pool(qe_m)
        pout[0, 0:cut, O // 4 : O // 2] = pool(qo_m)
        pout[0, cut : R * S2, 0 : O // 4] = pool(qe_l)
        pout[0, cut : R * S2, O // 4 : O // 2] = pool(qo_l)

    nblk = pl.BlockSpec(
        (1, S2, C2),
        lambda n, i: (n, jnp.minimum(i * R + R, HP - 1), 0),
        memory_space=pltpu.VMEM,
    )
    timed("A epi+splitstores", lambda a: call_epi(
        k_split_stores, [a, w4c, w128, w128, w128, w128],
        [blk, wspec] + [wspec] * 4))
    timed("B epi+xnext+patch", lambda a: call_epi(
        k_xnext_patch, [a, a, w4c, w128, w128, w128, w128],
        [blk, nblk, wspec] + [wspec] * 4))
    timed("C full mirror", lambda a: call_epi(
        k_full_mirror, [a, a, w4c, w128, w128, w128, w128],
        [blk, nblk, wspec] + [wspec] * 4))

    # ---- D: PROPOSED kernel shape — patch the last row into the int32
    # acc BEFORE the epilogue (acc concat), 2 epi invocations, full-
    # height stores, f32 pool
    def k_proposed(xr, xnr, wr, w0, w1, w2, w3, outr, pout):
        epi, _ = _mk_epi()
        xm, xn = xr[0], xnr[0]
        acc_e, acc_o = _parities(xm, wr, w0, w1, w2, w3)
        last_e = d32(xm[cut:], wr[:C2]) + d32(xn, wr[C2:])
        xnL, xnH = xn[:, :128], xn[:, 128:]
        po0 = d32(xm[cut:, 128:], w0[:]) + cf._rolldn(
            d32(xm[cut:, :128], w1[:]), 1)
        last_o = po0 + d32(xnH, w2[:]) + cf._rolldn(d32(xnL, w3[:]), 1)
        acc_e = jnp.concatenate([acc_e[:cut], last_e], axis=0)
        acc_o = jnp.concatenate([acc_o[:cut], last_o], axis=0)
        sc = jnp.full((1, O), 3e-4, jnp.float32)
        bias = jnp.full((1, O), 0.1, jnp.float32)
        oinv = jnp.float32(31.0)

        def epi2(a):
            return a.astype(jnp.float32) * sc + bias

        def fin(v):
            return jnp.clip(jnp.round(v * oinv), 0.0, 127.0).astype(
                jnp.int8)

        ye, yo = epi2(acc_e), epi2(acc_o)
        outr[0, :, :O] = fin(ye)
        outr[0, :, O:] = fin(yo)

        def pool(y):
            m = jnp.maximum(y, pltpu.roll(y, O // 2, 1))
            m = jnp.maximum(m, pltpu.roll(m, O - O // 4, 1))
            return fin(m[:, : O // 4])

        pout[0, :, : O // 4] = pool(ye)
        pout[0, :, O // 4 :] = pool(yo)

    timed("D proposed shape", lambda a: call_epi(
        k_proposed, [a, a, w4c, w128, w128, w128, w128],
        [blk, nblk, wspec] + [wspec] * 4))

    # ---- pipelining controls on the full mirror ----------------------
    def call_cp(kern, ins, ispecs, **cp):
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((B, NB * R * S2, 2 * O), jnp.int8),
                jax.ShapeDtypeStruct((B, NB * R * S2, O // 2), jnp.int8),
            ),
            grid=grid, in_specs=ispecs, out_specs=(o2blk, pblk),
            compiler_params=pltpu.CompilerParams(**cp),
        )(*ins)[0]

    timed("C mirror par/par", lambda a: call_cp(
        k_full_mirror, [a, a, w4c, w128, w128, w128, w128],
        [blk, nblk, wspec] + [wspec] * 4,
        dimension_semantics=("parallel", "parallel")))
    timed("C mirror par/arb", lambda a: call_cp(
        k_full_mirror, [a, a, w4c, w128, w128, w128, w128],
        [blk, nblk, wspec] + [wspec] * 4,
        dimension_semantics=("parallel", "arbitrary")))
    timed("C mirror vmem64M", lambda a: call_cp(
        k_full_mirror, [a, a, w4c, w128, w128, w128, w128],
        [blk, nblk, wspec] + [wspec] * 4,
        vmem_limit_bytes=64 * 1024 * 1024))
    # ---- E: Element-indexed OVERLAPPING window — one [(R+1)*S2+32]
    # input block per step; every output row (incl. the block's last)
    # comes from big aligned slices: no rolls, no x_next ref, no patch
    # dots, 2 K=512 dots + epilogue + f32 pool
    EW = (R + 1) * S2 + 32

    def k_elem(xr, wr, outr, pout):
        w = xr[0]                      # [EW, C2] overlapping window
        x_lo = w[: R * S2]
        x_hi = w[S2 : (R + 1) * S2]
        acc_e = d32(jnp.concatenate([x_lo, x_hi], axis=1), wr[:])
        zo_lo = jnp.concatenate(
            [x_lo[:, 128:], w[1 : R * S2 + 1][:, :128]], axis=1)
        zo_hi = jnp.concatenate(
            [x_hi[:, 128:], w[S2 + 1 : (R + 1) * S2 + 1][:, :128]],
            axis=1)
        acc_o = d32(jnp.concatenate([zo_lo, zo_hi], axis=1), wr[:])
        sc = jnp.full((1, O), 3e-4, jnp.float32)
        bias = jnp.full((1, O), 0.1, jnp.float32)
        oinv = jnp.float32(31.0)

        def epi2(a):
            return a.astype(jnp.float32) * sc + bias

        def fin(v):
            return jnp.clip(jnp.round(v * oinv), 0.0, 127.0).astype(
                jnp.int8)

        ye, yo = epi2(acc_e), epi2(acc_o)
        outr[0, :, :O] = fin(ye)
        outr[0, :, O:] = fin(yo)

        def pool(y):
            m = jnp.maximum(y, pltpu.roll(y, O // 2, 1))
            m = jnp.maximum(m, pltpu.roll(m, O - O // 4, 1))
            return fin(m[:, : O // 4])

        pout[0, :, : O // 4] = pool(ye)
        pout[0, :, O // 4 :] = pool(yo)

    eblk = pl.BlockSpec(
        (pl.Element(1), pl.Element(EW, (0, S2 + 32)), pl.Element(C2)),
        lambda n, i: (n, i * R * S2, 0),
        memory_space=pltpu.VMEM,
    )
    timed("E elem window", lambda a: pl.pallas_call(
        k_elem,
        out_shape=(
            jax.ShapeDtypeStruct((B, NB * R * S2, 2 * O), jnp.int8),
            jax.ShapeDtypeStruct((B, NB * R * S2, O // 2), jnp.int8),
        ),
        grid=grid, in_specs=[eblk, wspec], out_specs=(o2blk, pblk),
    )(a, w4c)[0])

    timed("base epi vmem64M", lambda a: pl.pallas_call(
        k_both_epi,
        out_shape=(
            jax.ShapeDtypeStruct((B, NB * R * S2, 2 * O), jnp.int8),
            jax.ShapeDtypeStruct((B, NB * R * S2, O // 2), jnp.int8),
        ),
        grid=grid,
        in_specs=[blk, wspec] + [wspec] * 4,
        out_specs=(o2blk, pblk),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(a, w4c, w128, w128, w128, w128)[0])

    # ---- F: full-height store + small overwrite patch — store the
    # roll-based result for ALL rows (last row garbage), then recompute
    # the last row from x_next and OVERWRITE rows [cut:] in VMEM. One
    # big aligned store + one small store per ref; no concat, no split
    # at the cut, 2 epi invocations on the bulk + 2 on the patch.
    def k_overwrite(xr, xnr, wr, w0, w1, w2, w3, outr, pout):
        xm, xn = xr[0], xnr[0]
        acc_e, acc_o = _parities(xm, wr, w0, w1, w2, w3)
        sc = jnp.full((1, O), 3e-4, jnp.float32)
        bias = jnp.full((1, O), 0.1, jnp.float32)
        oinv = jnp.float32(31.0)

        def epi2(a):
            return a.astype(jnp.float32) * sc + bias

        def fin(v):
            return jnp.clip(jnp.round(v * oinv), 0.0, 127.0).astype(
                jnp.int8)

        def pool(y):
            m = jnp.maximum(y, pltpu.roll(y, O // 2, 1))
            m = jnp.maximum(m, pltpu.roll(m, O - O // 4, 1))
            return fin(m[:, : O // 4])

        ye, yo = epi2(acc_e), epi2(acc_o)
        outr[0, :, :O] = fin(ye)
        outr[0, :, O:] = fin(yo)
        pout[0, :, : O // 4] = pool(ye)
        pout[0, :, O // 4 :] = pool(yo)
        # last-row patch
        last_e = d32(xm[cut:], wr[:C2]) + d32(xn, wr[C2:])
        xnL, xnH = xn[:, :128], xn[:, 128:]
        po0 = d32(xm[cut:, 128:], w0[:]) + cf._rolldn(
            d32(xm[cut:, :128], w1[:]), 1)
        last_o = po0 + d32(xnH, w2[:]) + cf._rolldn(d32(xnL, w3[:]), 1)
        yle, ylo = epi2(last_e), epi2(last_o)
        outr[0, cut:, :O] = fin(yle)
        outr[0, cut:, O:] = fin(ylo)
        pout[0, cut:, : O // 4] = pool(yle)
        pout[0, cut:, O // 4 :] = pool(ylo)

    timed("F store+overwrite", lambda a: call_epi(
        k_overwrite, [a, a, w4c, w128, w128, w128, w128],
        [blk, nblk, wspec] + [wspec] * 4))

    # ---- G: shift-and-append form — the "next image row" operand is
    # concat([xm[s2:], xn], axis=0) (a sublane shift, which shift1 shows
    # costs the same as a copy) instead of a wrapping roll. The result
    # is correct for EVERY row: no last-row patch, no split stores, no
    # 4-slice epilogue. Expect ~= the 5.9 ms base form.
    def k_shift_full(xr, xnr, wr, w0, w1, w2, w3, outr, pout):
        xm, xn = xr[0], xnr[0]
        zs = jnp.concatenate([xm[S2:], xn], axis=0)
        z4 = jnp.concatenate([xm, zs], axis=1)
        acc_e = d32(z4, wr[:])
        xmL, xmH = xm[:, :128], xm[:, 128:]
        zsL, zsH = zs[:, :128], zs[:, 128:]
        po0 = d32(xmH, w0[:]) + cf._rolldn(d32(xmL, w1[:]), 1)
        po1 = d32(zsH, w2[:]) + cf._rolldn(d32(zsL, w3[:]), 1)
        acc_o = po0 + po1
        sc = jnp.full((1, O), 3e-4, jnp.float32)
        bias = jnp.full((1, O), 0.1, jnp.float32)
        oinv = jnp.float32(31.0)

        def epi2(a):
            return a.astype(jnp.float32) * sc + bias

        def fin(v):
            return jnp.clip(jnp.round(v * oinv), 0.0, 127.0).astype(
                jnp.int8)

        def pool(y):
            m = jnp.maximum(y, pltpu.roll(y, O // 2, 1))
            m = jnp.maximum(m, pltpu.roll(m, O - O // 4, 1))
            return fin(m[:, : O // 4])

        ye, yo = epi2(acc_e), epi2(acc_o)
        outr[0, :, :O] = fin(ye)
        outr[0, :, O:] = fin(yo)
        pout[0, :, : O // 4] = pool(ye)
        pout[0, :, O // 4 :] = pool(yo)

    timed("G shift no-patch", lambda a: call_epi(
        k_shift_full, [a, a, w4c, w128, w128, w128, w128],
        [blk, nblk, wspec] + [wspec] * 4))

    # ---- H: side-tensor patch-in — the kernel stores the roll-based
    # result full-height (garbage last image row per block) PLUS the
    # patched rows to a compact side tensor [B, NB*S2, lanes]; all
    # stores are whole-block aligned. The garbage rows are then fixed
    # OUTSIDE the kernel with NB static dynamic-update-slices, which XLA
    # performs in place. Cost = base form + side writes + DUS traffic.
    def k_side(xr, xnr, wr, w0, w1, w2, w3, outr, pout, sider, spout):
        xm, xn = xr[0], xnr[0]
        acc_e, acc_o = _parities(xm, wr, w0, w1, w2, w3)
        sc = jnp.full((1, O), 3e-4, jnp.float32)
        bias = jnp.full((1, O), 0.1, jnp.float32)
        oinv = jnp.float32(31.0)

        def epi2(a):
            return a.astype(jnp.float32) * sc + bias

        def fin(v):
            return jnp.clip(jnp.round(v * oinv), 0.0, 127.0).astype(
                jnp.int8)

        def pool(y):
            m = jnp.maximum(y, pltpu.roll(y, O // 2, 1))
            m = jnp.maximum(m, pltpu.roll(m, O - O // 4, 1))
            return fin(m[:, : O // 4])

        ye, yo = epi2(acc_e), epi2(acc_o)
        outr[0, :, :O] = fin(ye)
        outr[0, :, O:] = fin(yo)
        pout[0, :, : O // 4] = pool(ye)
        pout[0, :, O // 4 :] = pool(yo)
        last_e = d32(xm[cut:], wr[:C2]) + d32(xn, wr[C2:])
        xnL, xnH = xn[:, :128], xn[:, 128:]
        po0 = d32(xm[cut:, 128:], w0[:]) + cf._rolldn(
            d32(xm[cut:, :128], w1[:]), 1)
        last_o = po0 + d32(xnH, w2[:]) + cf._rolldn(d32(xnL, w3[:]), 1)
        yle, ylo = epi2(last_e), epi2(last_o)
        sider[0, :, :O] = fin(yle)
        sider[0, :, O:] = fin(ylo)
        spout[0, :, : O // 4] = pool(yle)
        spout[0, :, O // 4 :] = pool(ylo)

    sblk = pl.BlockSpec((1, S2, 2 * O), lambda n, i: (n, i, 0),
                        memory_space=pltpu.VMEM)
    spblk = pl.BlockSpec((1, S2, O // 2), lambda n, i: (n, i, 0),
                         memory_space=pltpu.VMEM)

    def run_side(a):
        main, mpool, side, spool = pl.pallas_call(
            k_side,
            out_shape=(
                jax.ShapeDtypeStruct((B, NB * R * S2, 2 * O), jnp.int8),
                jax.ShapeDtypeStruct((B, NB * R * S2, O // 2), jnp.int8),
                jax.ShapeDtypeStruct((B, NB * S2, 2 * O), jnp.int8),
                jax.ShapeDtypeStruct((B, NB * S2, O // 2), jnp.int8),
            ),
            grid=grid,
            in_specs=[blk, nblk, wspec] + [wspec] * 4,
            out_specs=(o2blk, pblk, sblk, spblk),
        )(a, a, w4c, w128, w128, w128, w128)
        for i in range(NB):
            main = jax.lax.dynamic_update_slice(
                main, side[:, i * S2 : (i + 1) * S2],
                (0, i * R * S2 + cut, 0))
            mpool = jax.lax.dynamic_update_slice(
                mpool, spool[:, i * S2 : (i + 1) * S2],
                (0, i * R * S2 + cut, 0))
        # barrier: keep XLA from slicing through the DUS chains
        main, mpool = jax.lax.optimization_barrier((main, mpool))
        return main

    timed("H side+DUS patch", run_side)

    # Findings (v5e, B=128, R=16; see git log for the full history):
    #   base epi+pool (full stores, wrap-garbage last row)   5.93 ms
    #   A  split stores only                                 8.10
    #   B  x_next patch, concat + full stores                8.29
    #   C  full structural mirror (= shipped kernel, 7.98)   8.08
    #   D  acc-concat before epilogue                        9.72
    #   E  pl.Element overlapping window          compile failure
    #   F  full store + VMEM overwrite patch                10.50
    #   G  shift-and-append operand (no patch)               9.74
    # Conclusion: Mosaic value-level concats and double-stores cost far
    # more than the wrapping rolls they replace; the 2.1 ms tax is the
    # 4-way sublane-sliced stores themselves (A alone reproduces it) and
    # none of the store-merging reformulations beat the shipped form.
    # The shipped split-store+patch kernel stands.

    wq = jnp.asarray(rng.integers(-80, 80, (2, 2, 128, 128),
                                  dtype=np.int8))
    ws = jnp.full((128,), 0.01, jnp.float32)
    bq = jnp.zeros((128,), jnp.float32)
    q = {"chan_scale": ws * 0.02, "out_scale": 0.05}
    timed("full conv2x2_pf2", lambda a: cf.conv2x2_pf2(
        a, wq, bq, h=HP, w_real=255, s2=S2, pool=True, quant=q,
        r_block=R)[0])
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
