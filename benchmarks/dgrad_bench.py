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

        def f(x_):
            return lax.conv_general_dilated(
                x_, wk, (1, 1), "VALID", dimension_numbers=_DN)

        _, vjp = jax.vjp(f, x4)
        t_xla = bench(jax.jit(lambda gg: vjp(gg)[0]), g4)

        s_pad = stride_for(w, dt)
        gfp = pad_rows(g4, s_pad)

        t_pal = bench(
            jax.jit(lambda gg: conv2x2_dgrad_padflat(
                gg, wk, h_out=h, w_out=w, s=s_pad)), gfp)

        # unaligned stride = w: cotangent is a plain reshape of g4 padded
        # by one junk col (use w as stride with w_real = w-1... the
        # geometry: real cols w-1, stride w ≥ w-1+1)
        gfw = g4  # [B, h-1, w-1, O] → flat stride w-1+1? need junk col
        gfw = jnp.pad(g4, ((0, 0), (0, 0), (0, 1), (0, 0)))  # [.., w, O]
        gfw = gfw.reshape(batch, (h - 1) * w, o)
        try:
            t_pal_w = bench(
                jax.jit(lambda gg: conv2x2_dgrad_padflat(
                    gg, wk, h_out=h, w_out=w, s=w)), gfw)
        except Exception as e:  # noqa: BLE001
            t_pal_w = float("nan")
            print(f"  {name} unaligned failed: {str(e)[:120]}", flush=True)

        # wgrad comparison
        _, vjpw = jax.vjp(lambda w_: lax.conv_general_dilated(
            x4, w_, (1, 1), "VALID", dimension_numbers=_DN), wk)
        t_xw = bench(jax.jit(lambda gg: vjpw(gg)[0]), g4)
        xfp = pad_rows(x4, s_pad)
        t_fw = bench(
            jax.jit(lambda xx, gg: conv2x2_wgrad_flat(
                xx, gg, h_out=h, s=s_pad)), xfp, gfp)

        gb = 2 * (batch * (h - 1) * (w - 1) * o * c * 4) / 1e9  # MACs*2
        print(f"{name:16s} xla_dgrad {t_xla:7.2f}  pal_dgrad {t_pal:7.2f}"
              f"  pal_dgrad_w {t_pal_w:7.2f}  | xla_wgrad {t_xw:7.2f}"
              f"  flat_wgrad {t_fw:7.2f}   ({gb / t_xla * 1e3 / 1e3:5.1f}"
              f" TFLOP/s xla fwd-equiv)", flush=True)
        for a in (g4, x4, gfp, gfw, xfp):
            a.delete()  # free HBM now — tunnel frees are deferred
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
