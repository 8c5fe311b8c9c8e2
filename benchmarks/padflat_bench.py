"""Padded-flat vs conv.py kernels at the real U-Net 512² sites (TPU).

Scan-loop methodology (iters inside one dispatch, dispatch floor
subtracted). Sites and dtypes mirror the int8 serving graph's profile:
c1_2 (254² conv+pool, int8 resident), c2_2 (124², int8), c9_1 dual
(163², resident skip + inline bf16 up), c8_1 dual (82², 256ch), c9_2
(162², head fold), dec2 matmul (84²).

Usage: python benchmarks/padflat_bench.py [batch] [iters]
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

    from segmentation_tpu.nn.pallas import conv as cv
    from segmentation_tpu.nn.pallas import conv_flat as cf

    print(f"[{time.strftime('%H:%M:%S')}] init {jax.devices()[0]}",
          flush=True)
    key = jax.random.PRNGKey(0)

    def mk(shape, k, dtype=jnp.bfloat16):
        v = jax.jit(
            lambda kk: jax.random.normal(kk, shape, jnp.bfloat16)
        )(jax.random.fold_in(key, k))
        if dtype == jnp.int8:
            return jax.jit(
                lambda z: jnp.clip(jnp.round(z.astype(jnp.float32) * 50),
                                   -127, 127).astype(jnp.int8)
            )(v)
        return v

    def mkflat(shape, k, dtype):
        n, h, w, c = shape
        s = cf.stride_for(w, dtype)
        x = mk(shape, k, dtype)
        return jax.jit(functools.partial(cf.pad_rows, s=s))(x), s

    def q8w(shape, k):
        w = np.random.default_rng(k).normal(size=shape) * 0.05
        sc = np.maximum(np.abs(w).max(axis=tuple(range(w.ndim - 1)))
                        / 127.0, 1e-8)
        wq = np.clip(np.round(w / sc), -127, 127).astype(np.int8)
        return jnp.asarray(wq), jnp.asarray(sc.astype(np.float32))

    null = [0.0]

    @jax.jit
    def _n(z):
        return z + 1.0

    float(_n(jnp.float32(0)))
    t = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(_n(jnp.float32(0)))
        t.append(time.perf_counter() - t0)
    null[0] = min(t)
    print(f"null dispatch = {null[0] * 1e3:.1f} ms", flush=True)

    def loop(op, args):
        @jax.jit
        def run(args):
            def body(carry, _):
                c, a = carry
                # the barrier makes the operands opaque per-iteration so
                # XLA cannot hoist the (loop-invariant) kernel call
                a = jax.lax.optimization_barrier(a)
                out = op(*a)
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
            dt = max(time.perf_counter() - t0 - null[0], 1e-9) / iters
            print(f"{name:36s} {dt * 1e3:8.3f} ms", flush=True)
            return dt
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} FAILED: {str(e)[:160]}", flush=True)
            return None

    B = batch

    # ================= c1_2: 255²→254² conv + pool, C=O=128, int8 =====
    h, w_in, c, o = 255, 255, 128, 128
    wq, ws = q8w((2, 2, c, o), 1)
    b = jnp.zeros((o,), jnp.float32)
    q = {"chan_scale": ws * 0.02, "out_scale": 0.05}
    x8 = mk((B, h, w_in, c), 2, jnp.int8)
    timed("c1_2+pool/old(pairs)", functools.partial(
        cv.conv2x2_pool_flat, relu=True, pool_pairs=True, quant=q), x8,
        wq, b)
    timed("c1_2+pool/old(nopairs)", functools.partial(
        cv.conv2x2_pool_flat, relu=True, pool_pairs=False, quant=q), x8,
        wq, b)
    xf8, s = mkflat((B, h, w_in, c), 2, jnp.int8)
    timed("c1_2+pool/flat", functools.partial(
        cf.conv2x2_padflat, h=h, w_real=w_in, s=s, pool=True, quant=q),
        xf8, wq, b)
    timed("c1_2+pool/flat r=32", functools.partial(
        cf.conv2x2_padflat, h=h, w_real=w_in, s=s, pool=True, quant=q,
        r_block=32), xf8, wq, b)
    # bf16 comparison
    wbf = (wq.astype(jnp.float32) * ws).astype(jnp.bfloat16)
    xbf = mk((B, h, w_in, c), 3, jnp.bfloat16)
    timed("c1_2+pool/old bf16", functools.partial(
        cv.conv2x2_pool_flat, relu=True, pool_pairs=False), xbf, wbf, b)
    xfb, sb_ = mkflat((B, h, w_in, c), 3, jnp.bfloat16)
    timed("c1_2+pool/flat bf16", functools.partial(
        cf.conv2x2_padflat, h=h, w_real=w_in, s=sb_, pool=True), xfb,
        wbf, b)

    # ================= c2_2: 125²→124², C=O=256, int8 =================
    h2, w2, c2, o2 = 125, 125, 256, 256
    wq2, ws2 = q8w((2, 2, c2, o2), 4)
    b2 = jnp.zeros((o2,), jnp.float32)
    q2 = {"chan_scale": ws2 * 0.02, "out_scale": 0.05}
    x82 = mk((B, h2, w2, c2), 5, jnp.int8)
    timed("c2_2+pool/old", functools.partial(
        cv.conv2x2_pool_flat, relu=True, pool_pairs=False, quant=q2),
        x82, wq2, b2)
    xf82, s2 = mkflat((B, h2, w2, c2), 5, jnp.int8)
    timed("c2_2+pool/flat", functools.partial(
        cf.conv2x2_padflat, h=h2, w_real=w2, s=s2, pool=True, quant=q2),
        xf82, wq2, b2)

    # ================= c9_1 dual: 163², resident skip + bf16 up =======
    hd, wd_ = 163, 163
    wqa, wsa = q8w((2, 2, 128, 128), 6)
    wqb, wsb = q8w((2, 2, 128, 128), 7)
    qd = {"chan_scale_a": wsa * 0.02, "chan_scale_b": wsb * 0.03,
          "act_scale_b": 0.03, "out_scale": 0.05}
    xa8 = mk((B, hd + 2, wd_ + 2, 128), 8, jnp.int8)
    xbb = mk((B, hd, wd_, 128), 9, jnp.bfloat16)
    timed("c9_1_dual/old", functools.partial(
        cv.conv2x2_dual_flat, relu=True, quant=qd, a_offset=(1, 1)),
        xa8, xbb, wqa, wqb, b)
    xaf8, sa = mkflat((B, hd + 2, wd_ + 2, 128), 8, jnp.int8)
    xbf_, sb2 = mkflat((B, hd, wd_, 128), 9, jnp.bfloat16)
    # NOTE flat B side is bf16 (s from bf16 tile): s_a int8-tiled
    timed("c9_1_dual/flat", functools.partial(
        cf.conv2x2_dual_padflat, h=hd, w_real=wd_, s=sb2, s_a=sa,
        hp_a=xaf8.shape[1] // sa, a_offset=(1, 1), quant=qd),
        xaf8, xbf_, wqa, wqb, b)

    # ================= c8_1 dual: 83², C=256 ==========================
    h8, w8 = 83, 83
    wqa2, wsa2 = q8w((2, 2, 256, 256), 10)
    wqb2, wsb2 = q8w((2, 2, 256, 256), 11)
    qd2 = {"chan_scale_a": wsa2 * 0.02, "chan_scale_b": wsb2 * 0.03,
           "act_scale_b": 0.03, "out_scale": 0.05}
    xa82 = mk((B, h8 + 2, w8 + 2, 256), 12, jnp.int8)
    xbb2 = mk((B, h8, w8, 256), 13, jnp.bfloat16)
    timed("c8_1_dual/old", functools.partial(
        cv.conv2x2_dual_flat, relu=True, quant=qd2, a_offset=(1, 1)),
        xa82, xbb2, wqa2, wqb2, b2)
    xaf82, sa2 = mkflat((B, h8 + 2, w8 + 2, 256), 12, jnp.int8)
    xbf2, sb3 = mkflat((B, h8, w8, 256), 13, jnp.bfloat16)
    timed("c8_1_dual/flat", functools.partial(
        cf.conv2x2_dual_padflat, h=h8, w_real=w8, s=sb3, s_a=sa2,
        hp_a=xaf82.shape[1] // sa2, a_offset=(1, 1), quant=qd2),
        xaf82, xbf2, wqa2, wqb2, b2)

    # ================= c9_2: 163²→162², head fold =====================
    wd2 = mk((128, 4), 14, jnp.float32)
    bd2 = jnp.zeros((4,), jnp.float32)
    q92 = {"chan_scale": ws * 0.02}
    x92 = mk((B, hd, wd_, 128), 15, jnp.int8)
    timed("c9_2+head/old bf16out", functools.partial(
        cv.conv2x2_flat, relu=True, quant=q92, head=(wd2, bd2)),
        x92, wq, b)
    xf92, s92 = mkflat((B, hd, wd_, 128), 15, jnp.int8)
    timed("c9_2+head/flat bf16out", functools.partial(
        cf.conv2x2_padflat, h=hd, w_real=wd_, s=s92, quant=q92,
        head=(wd2, bd2)), xf92, wq, b)
    timed("c9_2+head/flat head_only", functools.partial(
        cf.conv2x2_padflat, h=hd, w_real=wd_, s=s92, quant=q92,
        head=(wd2, bd2), head_only=True), xf92, wq, b)

    # ================= c2_1 strided: paired 126² C=32... ==============
    hs, ws_in, cs_ = 126, 126, 32          # true input 126x252? site:
    # level-2 entry: pooled level-1 (C=32), paired 2C=64, out O4=256
    w4q, w4s = q8w((4, 4, cs_, 256), 16)
    bs4 = jnp.zeros((256,), jnp.float32)
    qs = {"chan_scale": w4s * 0.02, "out_scale": 0.05}
    xsp = mk((B, hs, ws_in, 2 * cs_), 17, jnp.int8)   # paired view
    timed("c2_1_strided/old", functools.partial(
        cv.conv4x4s2_flat, relu=True, paired=True, quant=qs),
        xsp, w4q, bs4)
    s2p = cf.stride_for(ws_in, jnp.int8)
    xspf = jax.jit(functools.partial(cf.pad_rows, s=s2p))(xsp)
    timed("c2_1_strided/flat", functools.partial(
        cf.conv4x4s2_padflat, h=hs, w2_real=ws_in, s2=s2p, quant=qs),
        xspf, w4q, bs4)

    # ================= dec2 matmul: 84² C=256 -> 256 ==================
    wm = mk((256, 256), 18, jnp.bfloat16)
    xm = mk((B, 84, 84, 256), 19, jnp.bfloat16)
    timed("dec2_matmul/old", functools.partial(
        cv.matmul_rows_flat, relu=True), xm, wm, b2)
    xmf, sm = mkflat((B, 84, 84, 256), 19, jnp.bfloat16)
    timed("dec2_matmul/flat", functools.partial(
        cf.matmul_rows_padflat, relu=True), xmf, wm, b2)

    print("DONE", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
