"""Decompose the dual-conv and fused-entry kernel costs (the #2/#3
serving deltas after c1_2: c9_1 dual 5.5 ms vs 2.3 roofline, entry
5.1 ms vs ~2 floor).

Dual (c9_1 geometry, int8 pf2): the shipped kernel re-strides the
cropped A side (skip) into a scratch with 2(R+1) misaligned per-row
VMEM copies per block. Probes:
  dual shipped        — conv2x2_dual_pf2 as served
  dual offset0        — same kernel, zero crop offsets (copy cost w/o
                        the misalignment, still per-row)
  dual B-only         — conv2x2_pf2 on the B side alone (floor w/o A)
  dual A-blocked      — hand kernel: A pre-aligned at the SAME stride,
                        plain blocked ref + product-roll col crop, no
                        scratch (the form a stride-unified model
                        could use)

Entry (512² → pf2, bf16 in / s8 out): per-row K=48 dots (M=128) and 2
sliced stores per row. Probes:
  entry shipped r=8/16/32  — r_block sweep on the shipped kernel
  entry tapminor           — lhs [R·G, 48] tap-minor layout: 3 big
                             dots per block, full-height stores
                             (input built by an XLA strided transform,
                             timed separately and jointly)

Usage: python benchmarks/dual_entry_anatomy.py [batch] [iters]
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
    B = batch
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def mk8(shape, k):
        return jax.jit(
            lambda kk: jnp.clip(
                jnp.round(jax.random.normal(kk, shape) * 40), -127, 127
            ).astype(jnp.int8)
        )(jax.random.fold_in(key, k))

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
            dt = max(time.perf_counter() - t0 - null, 1e-9) / iters
            print(f"{name:28s} {dt * 1e3:8.3f} ms", flush=True)
            return dt
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {str(e)[:160]}", flush=True)
            return None

    # ================= dual (c9_1 geometry) ============================
    def q8w(shape, k):
        w = np.random.default_rng(k).normal(size=shape) * 0.05
        sc = np.maximum(np.abs(w).max(axis=tuple(range(w.ndim - 1)))
                        / 127.0, 1e-8)
        wq = np.clip(np.round(w / sc), -127, 127).astype(np.int8)
        return jnp.asarray(wq), jnp.asarray(sc.astype(np.float32))

    wqa, wsa = q8w((2, 2, 128, 128), 6)
    wqb, wsb = q8w((2, 2, 128, 128), 7)
    qd = {"chan_scale_a": wsa * 0.02, "chan_scale_b": wsb * 0.03,
          "act_scale_b": 0.03, "out_scale": 0.05}
    b0 = jnp.zeros((128,), jnp.float32)
    sk4 = mk8((B, 254, 254, 128), 8)
    up4 = jax.jit(
        lambda kk: jax.random.normal(kk, (B, 164, 164, 128),
                                     jnp.bfloat16)
    )(jax.random.fold_in(key, 9))
    s2a, s2b = 128, 96
    skp = jax.jit(functools.partial(cf.pad_pairs, s2=s2a))(sk4)
    upp = jax.jit(functools.partial(cf.pad_pairs, s2=s2b))(up4)

    timed("dual shipped", functools.partial(
        cf.conv2x2_dual_pf2, h=164, w_real=164, s2=s2b, s2_a=s2a,
        hp_a=254, a_row_off=45, a_col_off=45, quant=qd, r_block=16),
        skp, upp, wqa, wqb, b0)
    timed("dual offset0", functools.partial(
        cf.conv2x2_dual_pf2, h=164, w_real=164, s2=s2b, s2_a=s2a,
        hp_a=254, a_row_off=0, a_col_off=0, quant=qd, r_block=16),
        skp, upp, wqa, wqb, b0)
    qs = {"chan_scale": wsb * 0.03, "act_scale": 0.03,
          "out_scale": 0.05}
    timed("dual B-only (conv pf2)", functools.partial(
        cf.conv2x2_pf2, h=164, w_real=164, s2=s2b, quant=qs,
        r_block=16), upp, wqb, b0)

    # ---- A-blocked form: both sides at stride s2, A pre-aligned ------
    # (what a stride-unified graph could run: A = plain blocked ref at
    # the same stride, col crop as int32 product rolls, no scratch)
    R, S2, C2, O = 16, 96, 256, 128
    HP = 164
    NB = -(-163 // R)
    grid = (B, NB)
    ska = mk8((B, HP * S2, C2), 20)  # stand-in pre-aligned A
    upb = mk8((B, HP * S2, C2), 21)
    wsa4 = jnp.asarray(rng.integers(-80, 80, (512, 128), dtype=np.int8))
    wsb4 = jnp.asarray(rng.integers(-80, 80, (512, 128), dtype=np.int8))

    blk = pl.BlockSpec((1, R * S2, C2), lambda n, i: (n, i, 0),
                       memory_space=pltpu.VMEM)
    nblk = pl.BlockSpec(
        (1, S2, C2),
        lambda n, i: (n, jnp.minimum(i * R + R, HP - 1), 0),
        memory_space=pltpu.VMEM,
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    o2blk = pl.BlockSpec((1, R * S2, 2 * O), lambda n, i: (n, i, 0),
                         memory_space=pltpu.VMEM)

    def d32(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.int32)

    def _stk(xm, xn, ws, c):
        z4 = jnp.concatenate([xm, cf._rolldn8(xm, S2)], axis=1)
        acc_e = d32(z4, ws[:])
        xmL, xmH = xm[:, :c], xm[:, c:]
        po0 = d32(xmH, ws[0:c]) + cf._rolldn(d32(xmL, ws[c:2 * c]), 1)
        po1 = d32(xmH, ws[2 * c:3 * c]) + cf._rolldn(
            d32(xmL, ws[3 * c:4 * c]), 1)
        acc_o = po0 + cf._rolldn(po1, S2)
        cut = (R - 1) * S2
        xnL, xnH = xn[:, :c], xn[:, c:]
        last_e = d32(xm[cut:], ws[:2 * c]) + d32(xn, ws[2 * c:])
        last_o = (po0[cut:] + d32(xnH, ws[2 * c:3 * c])
                  + cf._rolldn(d32(xnL, ws[3 * c:4 * c]), 1))
        return acc_e, acc_o, last_e, last_o

    def k_dual_blocked(ar, anr, br, bnr, wra, wrb, outr):
        c = 128
        am, an = ar[0], anr[0]
        bm, bn = br[0], bnr[0]
        ae, ao, ale, alo = _stk(am, an, wra, c)
        # col-crop the A products by a static (non-4-multiple) offset
        ae, ao = cf._rolldn(ae, 22), cf._rolldn(ao, 23)
        ale, alo = cf._rolldn(ale, 22), cf._rolldn(alo, 23)
        be, bo, ble, blo = _stk(bm, bn, wrb, c)
        sa = jnp.float32(3e-4)
        sb = jnp.float32(4e-4)
        bias = jnp.full((1, O), 0.1, jnp.float32)
        oinv = jnp.float32(31.0)

        def mixepi(a, bv):
            y = a.astype(jnp.float32) * sa + bv.astype(jnp.float32) * sb
            return jnp.clip(jnp.round((y + bias) * oinv),
                            0.0, 127.0).astype(jnp.int8)

        cut = (R - 1) * S2
        outr[0, 0:cut, 0:O] = mixepi(ae[:cut], be[:cut])
        outr[0, 0:cut, O:] = mixepi(ao[:cut], bo[:cut])
        outr[0, cut:, 0:O] = mixepi(ale, ble)
        outr[0, cut:, O:] = mixepi(alo, blo)

    timed("dual A-blocked", lambda a, b: pl.pallas_call(
        k_dual_blocked,
        out_shape=jax.ShapeDtypeStruct((B, NB * R * S2, 2 * O),
                                       jnp.int8),
        grid=grid,
        in_specs=[blk, nblk, blk, nblk, wspec, wspec],
        out_specs=o2blk,
    )(a, a, b, b, wsa4, wsb4), ska, upb)

    # ================= entry (512² bf16 -> pf2 s8) =====================
    x = jax.jit(
        lambda kk: jax.random.normal(kk, (B, 512, 512, 3), jnp.bfloat16)
    )(jax.random.fold_in(key, 30))
    w3 = np.random.default_rng(31).normal(size=(3, 3, 3, 32)) * 0.1
    we, wh, wl = cf.entry_weights_pf2(w3.astype(np.float32))
    we, wh, wl = (jnp.asarray(v, jnp.bfloat16) for v in (we, wh, wl))
    be = jnp.zeros((128,), jnp.float32)
    qe = {"out_scale": 0.05}

    @jax.jit
    def xform(xx):
        return cf.entry_transform_pf2(xx)

    xt = xform(x)
    xt.block_until_ready()

    for r in (8, 16, 32):
        timed(f"entry shipped r={r}", functools.partial(
            cf.conv3entry_pf2, h_img=512, quant=qe, r_block=r),
            xt, we, wh, wl, be)
    timed("entry xform alone", xform, x)
    timed("entry xform+shipped", lambda xx: cf.conv3entry_pf2(
        xform(xx), we, wh, wl, be, h_img=512, quant=qe), x)

    # ---- tap-minor form ----------------------------------------------
    H, G, HOUT = 512, 128, 255
    RE = 8
    NBE = -(-HOUT // RE)

    @jax.jit
    def xform_tm(xx):
        zs = [
            xx[:, dr : dr + 2 * HOUT : 2].reshape(B, HOUT, G, 12)
            for dr in range(4)
        ]
        return jnp.concatenate(zs, axis=-1).reshape(B, HOUT * G, 48)

    xtm = xform_tm(x)
    xtm.block_until_ready()
    # tap-minor weights: same contraction, rows reordered so that
    # k = 12*dr + t  (probe uses random weights; parity is irrelevant
    # to the timing question)
    we2 = jnp.asarray(
        rng.normal(size=(48, 128)).astype(np.float32), jnp.bfloat16)
    wh2 = jnp.asarray(
        rng.normal(size=(48, 128)).astype(np.float32), jnp.bfloat16)
    wl2 = jnp.asarray(
        rng.normal(size=(48, 128)).astype(np.float32), jnp.bfloat16)

    eblk = pl.BlockSpec((1, RE * G, 48), lambda n, i: (n, i, 0),
                        memory_space=pltpu.VMEM)
    eoblk = pl.BlockSpec((1, RE * G, 256), lambda n, i: (n, i, 0),
                         memory_space=pltpu.VMEM)

    def k_entry_tm(xr, wer, whr, wlr, outr):
        xm = xr[0]
        qe_ = jnp.dot(xm, wer[:], preferred_element_type=jnp.float32)
        qh_ = jnp.dot(xm, whr[:], preferred_element_type=jnp.float32)
        ql_ = jnp.dot(xm, wlr[:], preferred_element_type=jnp.float32)
        qo_ = qh_ + cf._rolldn(ql_, 1)
        oinv = jnp.float32(20.0)

        def fin(v):
            return jnp.clip(jnp.round(jnp.maximum(v, 0.0) * oinv),
                            0.0, 127.0).astype(jnp.int8)

        outr[0, :, :128] = fin(qe_)
        outr[0, :, 128:] = fin(qo_)

    def entry_tm(xtm_):
        return pl.pallas_call(
            k_entry_tm,
            out_shape=jax.ShapeDtypeStruct((B, NBE * RE * G, 256),
                                           jnp.int8),
            grid=(B, NBE),
            in_specs=[eblk] + [wspec] * 3,
            out_specs=eoblk,
        )(xtm_, we2, wh2, wl2)

    timed("entry tapminor kernel", entry_tm, xtm)
    timed("entry tm xform alone", xform_tm, x)
    timed("entry tm xform+kernel", lambda xx: entry_tm(xform_tm(xx)), x)
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
