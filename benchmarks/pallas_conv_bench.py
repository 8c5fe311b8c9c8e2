"""Pallas vs XLA conv microbench on the real U-Net s2d sites.

Each op is looped K times inside ONE jit via lax.scan (per-dispatch
tunnel latency is ~30 ms, so per-op timing must amortize in-graph); the
weights are perturbed by the loop carry (a few KB) so XLA cannot CSE the
iterations, while the activation operands stay loop-invariant (no extra
HBM traffic). Timing forces a host scalar (block_until_ready can return
early through the tunnel).

Usage: python benchmarks/pallas_conv_bench.py [batch] [iters]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=32, iters=10):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from segmentation_tpu.nn.pallas.conv import (
        conv2x2_dual_flat, conv2x2_flat, conv4x4s2_flat,
    )

    print(f"[{time.strftime('%H:%M:%S')}] init {jax.devices()[0]}",
          flush=True)
    key = jax.random.PRNGKey(0)

    def mk(shape, k):
        return jax.jit(
            lambda kk: jax.random.normal(kk, shape, jnp.bfloat16)
        )(jax.random.fold_in(key, k))

    _DN = ("NHWC", "HWIO", "NHWC")

    null_dispatch = [0.0]

    def timed(fn, *args):
        float(fn(*args))  # compile + settle
        t0 = time.perf_counter()
        s = float(fn(*args))
        total = time.perf_counter() - t0
        # subtract the measured tunnel dispatch+sync overhead (~30 ms);
        # per-op time must reflect device time, not the wire
        dt = max(total - null_dispatch[0], 1e-9) / iters
        return dt, s

    def loop(op, x_args, w_args):
        """scan op K times; the carry (one output element, scaled to
        ~1e-30) perturbs the weights each iteration — a real dependency
        edge XLA cannot CSE, numerically a no-op, and only weight-sized
        extra traffic."""

        @jax.jit
        def run(xs, ws):
            def body(c, _):
                ws_p = jax.tree_util.tree_map(
                    lambda w: w + c.astype(w.dtype), ws
                )
                out = op(xs, ws_p)
                return out.ravel()[0].astype(jnp.float32) * 1e-30, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        return functools.partial(run, x_args, w_args)

    # measure the dispatch floor with a trivial program
    import jax as _jax

    @_jax.jit
    def _null(z):
        return z + 1.0

    z0 = jnp.float32(0.0)
    float(_null(z0))
    _t = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(_null(z0))
        _t.append(time.perf_counter() - t0)
    null_dispatch[0] = min(_t)
    print(f"null dispatch = {null_dispatch[0] * 1e3:.1f} ms", flush=True)

    results = {}

    def report(name, dt, flops, note=""):
        tf = flops / dt / 1e12
        mfu = 100.0 * tf / 197.0
        results[name] = (dt * 1e3, tf, mfu)
        print(f"{name:24s} {dt * 1e3:8.3f} ms  {tf:7.1f} TF/s "
              f"({mfu:4.1f}% MFU) {note}", flush=True)

    # --- site list: (name, kind, H, W, C, O) at inference geometry -----
    sites = [
        ("c1_2", "2x2", 255, 255, 128, 128),
        ("c2_2", "2x2", 126, 126, 256, 256),
        ("c8_2", "2x2", 83, 83, 256, 256),
        ("c9_2", "2x2", 163, 163, 128, 128),
        ("c9_1_dual", "dual", 164, 164, 128, 128),
        ("c8_1_dual", "dual", 84, 84, 256, 256),
        ("c2_1_s2", "s2", 254, 254, 32, 256),
    ]

    for name, kind, h, w_in, c, o in sites:
        if kind == "2x2":
            x = mk((batch, h, w_in, c), hash(name) % 97)
            w = mk((2, 2, c, o), 1)
            b = mk((o,), 2)
            flops = 2 * batch * (h - 1) * (w_in - 1) * 4 * c * o

            def op_p(xs, ws, r_block=8):
                return conv2x2_flat(xs, ws[0], ws[1], r_block=r_block)

            def op_x(xs, ws):
                y = lax.conv_general_dilated(
                    xs, ws[0].astype(xs.dtype), (1, 1), "VALID",
                    dimension_numbers=_DN)
                return jax.nn.relu(y + ws[1].astype(y.dtype))

            for r in (4, 8, 16):
                dt, _ = timed(loop(functools.partial(op_p, r_block=r),
                                   x, (w, b)))
                report(f"{name}/pallas_r{r}", dt, flops)
            dt, _ = timed(loop(op_x, x, (w, b)))
            report(f"{name}/xla", dt, flops)
        elif kind == "dual":
            xa = mk((batch, h, w_in, c), 3)
            xb = mk((batch, h, w_in, c), 4)
            wa = mk((2, 2, c, o), 5)
            wb = mk((2, 2, c, o), 6)
            b = mk((o,), 7)
            flops = 2 * batch * (h - 1) * (w_in - 1) * 4 * 2 * c * o

            def op_p(xs, ws):
                return conv2x2_dual_flat(xs[0], xs[1], ws[0], ws[1], ws[2])

            def op_x(xs, ws):
                ya = lax.conv_general_dilated(
                    xs[0], ws[0].astype(xs[0].dtype), (1, 1), "VALID",
                    dimension_numbers=_DN)
                yb = lax.conv_general_dilated(
                    xs[1], ws[1].astype(xs[1].dtype), (1, 1), "VALID",
                    dimension_numbers=_DN)
                return jax.nn.relu(ya + yb + ws[2].astype(ya.dtype))

            dt, _ = timed(loop(op_p, (xa, xb), (wa, wb, b)))
            report(f"{name}/pallas", dt, flops)
            dt, _ = timed(loop(op_x, (xa, xb), (wa, wb, b)))
            report(f"{name}/xla", dt, flops)
        else:  # strided s2d entry
            x = mk((batch, h, w_in, c), 8)
            w4 = mk((4, 4, c, o), 9)
            b = mk((o,), 10)
            ho, wo = (h - 2) // 2, (w_in - 2) // 2
            flops = 2 * batch * ho * wo * 16 * c * o

            def op_p(xs, ws):
                return conv4x4s2_flat(xs, ws[0], ws[1])

            def op_x(xs, ws):
                y = lax.conv_general_dilated(
                    xs, ws[0].astype(xs.dtype), (2, 2), "VALID",
                    dimension_numbers=_DN)
                return jax.nn.relu(y + ws[1].astype(y.dtype))

            dt, _ = timed(loop(op_p, x, (w4, b)))
            report(f"{name}/pallas", dt, flops)
            dt, _ = timed(loop(op_x, x, (w4, b)))
            report(f"{name}/xla", dt, flops)

    # --- numerics spot check on TPU (bf16) ------------------------------
    x = mk((2, 33, 33, 128), 11)
    w = mk((2, 2, 128, 128), 12) * 0.05
    b = mk((128,), 13)
    got = conv2x2_flat(x, w, b)
    want = jax.nn.relu(
        lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                 dimension_numbers=_DN) + b
    )
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f"tpu bf16 parity max|err| = {err:.4f}")
    assert err < 0.25, err
    print("DONE")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
