"""r_block sweep for the slow int8 Pallas sites (c1_2+pool, c9_1 dual,
c9_2) — per-grid-step overhead vs VMEM pressure trade-off.

At 512²/B=128 the c1_2 kernel runs ~4.6 µs per grid step of which the
matmuls are only ~1.4-2.7 µs; bigger row blocks amortize the fill +
epilogue overhead if VMEM allows.

Usage: python benchmarks/pallas_rblock_sweep.py [batch] [iters]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=128, iters=50):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentation_tpu.nn.pallas.conv import (
        conv2x2_dual_flat, conv2x2_flat, conv2x2_pool_flat,
    )

    print(f"[{time.strftime('%H:%M:%S')}] init {jax.devices()[0]}",
          flush=True)
    key = jax.random.PRNGKey(0)

    def mk8(shape, k):
        v = jax.jit(
            lambda kk: jnp.clip(
                jnp.round(jax.random.normal(kk, shape, jnp.float32) * 40),
                -127, 127,
            ).astype(jnp.int8)
        )(jax.random.fold_in(key, k))
        return v

    def q8w(shape, k):
        w = np.random.default_rng(k).normal(size=shape) * 0.05
        sc = np.maximum(
            np.abs(w).max(axis=tuple(range(w.ndim - 1))) / 127.0, 1e-8
        )
        wq = np.clip(np.round(w / sc), -127, 127).astype(np.int8)
        return jnp.asarray(wq), jnp.asarray(sc.astype(np.float32))

    def timed(fn, *args):
        try:
            f = jax.jit(fn)
            y = f(*args)
            jax.block_until_ready(y)
            t0 = time.perf_counter()
            for _ in range(iters):
                y = f(*args)
            jax.block_until_ready(y)
            leaf = jax.tree_util.tree_leaves(y)[0]
            float(jnp.asarray(leaf, jnp.float32).sum())  # force sync
            return (time.perf_counter() - t0) / iters * 1e3
        except Exception as e:  # noqa: BLE001
            print(f"    FAILED: {str(e)[:140]}", flush=True)
            return None

    # ---- c1_2 site: conv2x2_pool_flat, pairs, int8 resident ----------
    x = mk8((batch, 255, 255, 128), 1)
    w, ws = q8w((2, 2, 128, 128), 2)
    b = jnp.zeros((128,), jnp.float32)
    q = {"chan_scale": ws * 0.02, "out_scale": 0.05}
    for rb in (8, 16, 24, 32, 48):
        dt = timed(
            functools.partial(
                conv2x2_pool_flat, relu=True, pool_pairs=True, quant=q,
                r_block=rb,
            ),
            x, w, b,
        )
        if dt is not None:
            print(f"c1_2+pool r={rb:3d}  {dt:7.3f} ms", flush=True)

    # ---- c9_1 dual site: 163², C=O=128, resident skip + inline up ----
    xa = mk8((batch, 165, 165, 128), 3)
    xb = jax.jit(
        lambda kk: jax.random.normal(kk, (batch, 163, 163, 128),
                                     jnp.bfloat16)
    )(jax.random.fold_in(key, 4))
    wa, wsa = q8w((2, 2, 128, 128), 5)
    wb, wsb = q8w((2, 2, 128, 128), 6)
    qd = {
        "chan_scale_a": wsa * 0.02,
        "chan_scale_b": wsb * 0.03,
        "act_scale_b": 0.03,
        "out_scale": 0.05,
    }
    for rb in (8, 15, 16, 24, 32):
        dt = timed(
            functools.partial(
                conv2x2_dual_flat, relu=True, quant=qd, r_block=rb,
                a_offset=(1, 1),
            ),
            xa, xb, wa, wb, b,
        )
        if dt is not None:
            print(f"c9_1_dual r={rb:3d}  {dt:7.3f} ms", flush=True)

    # ---- c9_2 site: 163², C=O=128, resident in, bf16 out -------------
    x2 = mk8((batch, 163, 163, 128), 7)
    q2 = {"chan_scale": ws * 0.02}
    for rb in (8, 15, 16, 24, 32):
        dt = timed(
            functools.partial(conv2x2_flat, relu=True, quant=q2,
                              r_block=rb),
            x2, w, b,
        )
        if dt is not None:
            print(f"c9_2      r={rb:3d}  {dt:7.3f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
