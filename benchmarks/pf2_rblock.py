"""r_block sweep for the padflat/pf2 kernels at the real 512² U-Net
sites (scan-loop methodology, barrier against hoisting).

The serving graph's per-site defaults come from _auto_r; the round-3
profile shows in-context times ~0.5-1 ms above the isolated bench at
the dual/conv sites — this sweeps the block height per site so the
model can pin the winner.

Usage: python benchmarks/pf2_rblock.py [batch] [iters]
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

    # ---- c1_2 pf2 conv+pool: 255² pairs=s2=128, C=O=128 int8 ----------
    h, w_in, c, o = 255, 255, 128, 128
    wq, ws = q8w((2, 2, c, o), 1)
    b = jnp.zeros((o,), jnp.float32)
    q = {"chan_scale": ws * 0.02, "out_scale": 0.05}
    x = mk((B, h, w_in, c), 2, jnp.int8)
    s2 = cf.stride_for((w_in + 1) // 2, jnp.int8)
    xp = jax.jit(functools.partial(cf.pad_pairs, s2=s2))(x)
    for r in (4, 8, 16, 32, 64):
        timed(f"c1_2 pf2 conv+pool r={r}", functools.partial(
            cf.conv2x2_pf2, h=h, w_real=w_in, s2=s2, pool=True, quant=q,
            r_block=r), xp, wq, b)

    # ---- c9_1 dual pf2: up (164,164) s2=96, skip (254,254) s2a=128 ----
    wqa, wsa = q8w((2, 2, 128, 128), 6)
    wqb, wsb = q8w((2, 2, 128, 128), 7)
    qd = {"chan_scale_a": wsa * 0.02, "chan_scale_b": wsb * 0.03,
          "act_scale_b": 0.03, "out_scale": 0.05}
    sk4 = mk((B, 254, 254, 128), 8, jnp.int8)
    up4 = mk((B, 164, 164, 128), 9, jnp.bfloat16)
    s2a = cf.stride_for(127, jnp.int8)
    s2b = 96  # deconv keeps its input stride as the pf2 pair stride
    skp = jax.jit(functools.partial(cf.pad_pairs, s2=s2a))(sk4)
    upp = jax.jit(functools.partial(cf.pad_pairs, s2=s2b))(up4)
    for r in (4, 8, 16, 32):
        timed(f"c9_1 dual pf2 r={r}", functools.partial(
            cf.conv2x2_dual_pf2, h=164, w_real=164, s2=s2b, s2_a=s2a,
            hp_a=254, a_row_off=45, a_col_off=45, quant=qd, r_block=r),
            skp, upp, wqa, wqb, b)

    # ---- c8_1 dual plain: 84² C=256 -----------------------------------
    wqa2, wsa2 = q8w((2, 2, 256, 256), 10)
    wqb2, wsb2 = q8w((2, 2, 256, 256), 11)
    qd2 = {"chan_scale_a": wsa2 * 0.02, "chan_scale_b": wsb2 * 0.03,
           "act_scale_b": 0.03, "out_scale": 0.05}
    b2 = jnp.zeros((256,), jnp.float32)
    xa82 = mk((B, 86, 86, 256), 12, jnp.int8)
    xbb2 = mk((B, 84, 84, 256), 13, jnp.bfloat16)
    sa2 = cf.stride_for(86, jnp.int8)
    sb3 = cf.stride_for(84, jnp.int8)  # int8-region stride (tile 32)
    xaf = jax.jit(functools.partial(cf.pad_rows, s=sa2))(xa82)
    xbf = jax.jit(functools.partial(cf.pad_rows, s=sb3))(xbb2)
    for r in (4, 8, 16, 32):
        timed(f"c8_1 dual plain r={r}", functools.partial(
            cf.conv2x2_dual_padflat, h=84, w_real=84, s=sb3, s_a=sa2,
            hp_a=86, a_offset=(1, 1), quant=qd2, r_block=r),
            xaf, xbf, wqa2, wqb2, b2)

    # ---- c2_2 plain conv+pool: 126² C=256 int8 ------------------------
    wq3, ws3 = q8w((2, 2, 256, 256), 14)
    q3 = {"chan_scale": ws3 * 0.02, "out_scale": 0.05}
    x3 = mk((B, 126, 126, 256), 15, jnp.int8)
    s3 = cf.stride_for(126, jnp.int8)
    x3f = jax.jit(functools.partial(cf.pad_rows, s=s3))(x3)
    for r in (8, 16, 32, 64):
        timed(f"c2_2 conv+pool r={r}", functools.partial(
            cf.conv2x2_padflat, h=126, w_real=126, s=s3, pool=True,
            quant=q3, r_block=r), x3f, wq3, b2)

    # ---- c9_2 head pf2: (163,163) s2=96 C=128 -------------------------
    wd = mk((128, 4), 16, jnp.float32)
    bd = jnp.zeros((4,), jnp.float32)
    q92 = {"chan_scale": ws * 0.02}
    x92 = mk((B, 163, 163, 128), 17, jnp.int8)
    xp92 = jax.jit(functools.partial(cf.pad_pairs, s2=96))(x92)
    for r in (8, 16, 32):
        timed(f"c9_2 head pf2 r={r}", functools.partial(
            cf.conv2x2_pf2, h=163, w_real=163, s2=96, quant=q92,
            head=(wd, bd), head_only=True, r_block=r), xp92, wq, b)

    print("DONE", flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
