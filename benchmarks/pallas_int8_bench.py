"""int8 vs bf16 Pallas conv kernels on the U-Net hot shapes.

Two int8 modes per site: inline (bf16 HBM activations, quantize in
kernel) and resident (int8 HBM activations — half the bytes, the full
serving path). Methodology as pallas_conv_bench (scan loop, dispatch
floor subtracted).

Usage: python benchmarks/pallas_int8_bench.py [batch] [iters]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=64, iters=100):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from segmentation_tpu.nn.pallas.conv import (
        conv2x2_dual_flat, conv2x2_flat, conv2x2_pool_flat, conv4x4s2_flat,
    )

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

    def loop(op, xs, ws):
        @jax.jit
        def run(xs, ws):
            def body(c, _):
                ws_p = jax.tree_util.tree_map(
                    lambda w: (w + c.astype(w.dtype))
                    if w.dtype != jnp.int8 else w, ws
                )
                out = op(xs, ws_p)
                o0 = jax.tree_util.tree_leaves(out)[0]
                return o0.ravel()[0].astype(jnp.float32) * 1e-30, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        return functools.partial(run, xs, ws)

    def timed(fn):
        float(fn())
        t0 = time.perf_counter()
        float(fn())
        return max(time.perf_counter() - t0 - null[0], 1e-9) / iters

    def report(name, dt, flops):
        tf = flops / dt / 1e12
        print(f"{name:28s} {dt * 1e3:8.3f} ms  {tf:7.1f} TF/s", flush=True)

    sites = [
        ("c1_2+pool", "pool", 255, 255, 128, 128),
        ("c2_2+pool", "pool", 126, 126, 256, 256),
        ("c8_2", "2x2", 83, 83, 256, 256),
        ("c9_2", "2x2", 163, 163, 128, 128),
        ("c9_1_dual", "dual", 164, 164, 128, 128),
        ("c8_1_dual", "dual", 84, 84, 256, 256),
    ]
    for name, kind, h, w_in, c, o in sites:
        flops = 2 * batch * (h - 1) * (w_in - 1) * 4 * c * o
        if kind == "dual":
            flops *= 2
        wq, ws = q8w((2, 2, c, o), 1)
        b = mk((o,), 2, jnp.float32).astype(jnp.float32)
        a_s = 0.02
        for mode in ("bf16", "int8_inline", "int8_resident"):
            dt_in = jnp.int8 if mode == "int8_resident" else jnp.bfloat16
            x = mk((batch, h, w_in, c), 3, dt_in)
            if kind == "dual":
                x2 = mk((batch, h, w_in, c), 4, dt_in)
                wq2, ws2 = q8w((2, 2, c, o), 5)
                if mode == "bf16":
                    wb_, wb2 = (
                        (wq.astype(jnp.bfloat16) * ws),
                        (wq2.astype(jnp.bfloat16) * ws2),
                    )
                    op = lambda xs, wz: conv2x2_dual_flat(  # noqa: E731
                        xs[0], xs[1], wz[0], wz[1], wz[2])
                    fn = loop(op, (x, x2), (wb_, wb2, b))
                else:
                    q = {"chan_scale_a": ws * a_s, "chan_scale_b": ws2 * a_s}
                    if mode == "int8_inline":
                        q["act_scale_a"] = a_s
                        q["act_scale_b"] = a_s
                    else:
                        q["out_scale"] = 0.02
                    op = lambda xs, wz, q=q: conv2x2_dual_flat(  # noqa
                        xs[0], xs[1], wz[0], wz[1], wz[2], quant=q)
                    fn = loop(op, (x, x2), (wq, wq2, b))
            else:
                pool = kind == "pool"
                conv = conv2x2_pool_flat if pool else conv2x2_flat
                kw = dict(pool_pairs=pool and (w_in - 1) % 2 == 0)
                if not pool:
                    kw = {}
                if mode == "bf16":
                    wb_ = wq.astype(jnp.bfloat16) * ws
                    op = lambda xs, wz, kw=kw, conv=conv: conv(  # noqa
                        xs, wz[0], wz[1], **kw)
                    fn = loop(op, x, (wb_, b))
                else:
                    q = {"chan_scale": ws * a_s}
                    if mode == "int8_inline":
                        q["act_scale"] = a_s
                    else:
                        q["out_scale"] = 0.02
                    op = lambda xs, wz, kw=kw, conv=conv, q=q: conv(  # noqa
                        xs, wz[0], wz[1], quant=q, **kw)
                    fn = loop(op, x, (wq, b))
            try:
                report(f"{name}/{mode}", timed(fn), flops)
            except Exception as e:
                print(f"{name}/{mode} FAILED: {str(e)[:200]}", flush=True)
    print("DONE")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
