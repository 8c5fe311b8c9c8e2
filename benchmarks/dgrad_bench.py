"""Isolated dgrad rates: flat Pallas backward vs XLA's conv dgrad.

Decides VERDICT r4 item 3 with numbers BEFORE any train-graph wiring:
at the real 512²/B=128 backward shapes, is conv2x2_dgrad_padflat
actually faster than the XLA input-grad conv it would replace?

Rows per site (times in ms, best of reps, forced-checksum sync):
  xla_dgrad   — lax.conv VJP input-grad on the 4-D packed tensor
                (what the train step runs today)
  pal_dgrad   — conv2x2_dgrad_padflat on the flat cotangent (stride
                padded to the sublane tile)
  pal_dgrad_w — same kernel at UNALIGNED stride s=w (the flat tensor is
                then a pure RESHAPE of the 4-D one — if this holds the
                aligned rate, the train region needs NO pad copies and
                serving can shed its entry-transform copies too)
  xla_wgrad / flat_wgrad — filter-grad comparison (XLA conv form vs the
                flat contiguous-matmul form)

Usage: python benchmarks/dgrad_bench.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=128):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from segmentation_tpu.nn.pallas.conv_flat import (
        pad_rows,
        stride_for,
    )
    from segmentation_tpu.nn.pallas.conv_flat_bwd import (
        conv2x2_dgrad_padflat,
        conv2x2_wgrad_flat,
    )

    _DN = ("NHWC", "HWIO", "NHWC")
    dt = jnp.bfloat16
    print(f"[{time.strftime('%H:%M:%S')}] {jax.devices()[0]} B={batch}",
          flush=True)

    # (site, h, w, C, O) — the stride-1 packed conv sites of the
    # 512² flagship train graph (models/unet_fast.py apply), plus the
    # level-7/8 decoder duals at their single-operand shape.
    sites = [
        ("c1_2", 255, 255, 128, 128),
        ("c2_2", 126, 126, 256, 256),
        ("c8_1(dual half)", 126, 126, 256, 256),
        ("c9_1(dual half)", 254, 254, 128, 128),
    ]
    if os.environ.get("DGRAD_BENCH_TINY") == "1":  # CPU smoke (interpret)
        sites = [("tiny", 9, 9, 128, 128)]

    def bench(fn, *args, reps=3):
        out = fn(*args)
        s = jax.tree_util.tree_leaves(out)[0].sum()
        float(s)  # compile+warm, forced sync
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(4):
                out = fn(*args)
            s = jax.tree_util.tree_leaves(out)[0]
            float(s.sum() if hasattr(s, "sum") else s)
            best = min(best, (time.perf_counter() - t0) / 4)
        return best * 1e3

    for name, h, w, c, o in sites:
        key = jax.random.PRNGKey(0)
        g4 = jax.random.normal(key, (batch, h - 1, w - 1, o), dt)
        x4 = jax.random.normal(key, (batch, h, w, c), dt)
        wk = jax.random.normal(key, (2, 2, c, o), dt) * 0.05

        # NOTE: every jit takes its arrays as ARGUMENTS — a vjp closure
        # would bake the 2 GB residual in as a CONSTANT, and this
        # environment ships constants to the AOT compile helper (a
        # multi-minute upload per compile; wedged the first run).
        def f(x_, w_):
            return lax.conv_general_dilated(
                x_, w_, (1, 1), "VALID", dimension_numbers=_DN)

        @jax.jit
        def xla_dgrad(gg, w_, x_):
            return jax.vjp(lambda t: f(t, w_), x_)[1](gg)[0]

        t_xla = bench(xla_dgrad, g4, wk, x4)

        s_pad = stride_for(w, dt)
        gfp = pad_rows(g4, s_pad)

        t_pal = bench(
            jax.jit(lambda gg, w_: conv2x2_dgrad_padflat(
                gg, w_, h_out=h, w_out=w, s=s_pad)), gfp, wk)
        t_pal_w = float("nan")  # unaligned stride: rejected by Mosaic
        # (block dims must divide 8/128 — measured round 5, first run)

        # wgrad comparison
        @jax.jit
        def xla_wgrad(gg, w_, x_):
            return jax.vjp(lambda t: f(x_, t), w_)[1](gg)[0]

        t_xw = bench(xla_wgrad, g4, wk, x4)
        xfp = pad_rows(x4, s_pad)
        t_fw = bench(
            jax.jit(lambda xx, gg: conv2x2_wgrad_flat(
                xx, gg, h_out=h, s=s_pad)), xfp, gfp)

        gb = 2 * (batch * (h - 1) * (w - 1) * o * c * 4) / 1e9  # MACs*2
        print(f"{name:16s} xla_dgrad {t_xla:7.2f}  pal_dgrad {t_pal:7.2f}"
              f"  pal_dgrad_w {t_pal_w:7.2f}  | xla_wgrad {t_xw:7.2f}"
              f"  flat_wgrad {t_fw:7.2f}   ({gb / t_xla * 1e3 / 1e3:5.1f}"
              f" TFLOP/s xla fwd-equiv)", flush=True)
        for a in (g4, x4, gfp, xfp):
            a.delete()  # free HBM now — tunnel frees are deferred
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
