"""r_block sweep for entry_chain_pf2 vs the two-kernel composition.

Usage: python benchmarks/chain_sweep.py [batch] [iters]
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
    B = batch
    rng = np.random.default_rng(0)
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
            print(f"{name:26s} {dt * 1e3:8.3f} ms", flush=True)
            return dt
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s} FAILED: {str(e)[:160]}", flush=True)
            return None

    h_img, w_img, o = 512, 512, 32
    o4 = 4 * o
    x = jax.jit(
        lambda kk: jax.random.normal(kk, (B, h_img, w_img, 3),
                                     jnp.bfloat16)
    )(jax.random.fold_in(key, 1))
    w3 = np.asarray(rng.normal(size=(3, 3, 3, o)) * 0.2, np.float32)
    we, wh, wl = (jnp.asarray(v, jnp.bfloat16)
                  for v in cf.entry_weights_pf2(w3))
    b1 = jnp.tile(jnp.asarray(rng.normal(size=(o,)), jnp.float32), 4)
    w2 = jnp.asarray(rng.integers(-90, 90, (2, 2, o4, o4)), jnp.int8)
    b2 = jnp.asarray(rng.normal(size=(o4,)), jnp.float32)
    cs2 = jnp.asarray(rng.random(o4) * 0.001 + 1e-4, jnp.float32)
    q2 = {"chan_scale": cs2, "out_scale": 0.05}
    out_s1 = 1 / 16.0

    xt = jax.jit(cf.entry_transform_pf2)(x)
    xt.block_until_ready()

    def two_kernel(xtv):
        v1 = cf.conv3entry_pf2(
            xtv, we, wh, wl, b1, h_img=h_img,
            quant={"out_scale": out_s1},
        )
        return cf.conv2x2_pf2(
            v1, w2, b2, h=(h_img - 2) // 2, w_real=(w_img - 2) // 2,
            s2=w_img // 4, pool=True, quant=q2,
        )

    timed("two-kernel (entry+c1_2)", two_kernel, xt)
    for r in (8, 16, 32):
        timed(f"chain r={r}", functools.partial(
            cf.entry_chain_pf2, we=we, wh=wh, wl=wl, b1=b1, w2=w2,
            b2=b2, h_img=h_img, out_scale1=out_s1, quant2=q2,
            r_block=r), xt)
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
