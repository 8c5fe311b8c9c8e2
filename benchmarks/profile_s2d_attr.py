"""Trace the s2d U-Net forward and attribute hot device ops to source.

Extends profile_s2d.py: after aggregating per-op device time from the
profiler trace, greps the compiled HLO for each hot op's computation and
prints the conv/dot shapes and source metadata found inside it — answering
"which model layer is fusion.N" without a manual HLO dive.

Usage: python benchmarks/profile_s2d_attr.py [batch] [steps]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main(batch=128, steps=3, mode="bf16"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.models.unet_fast import UNetS2DInference
    from segmentation_tpu.nn import module as hk

    print(f"[{time.strftime('%H:%M:%S')}] init {jax.devices()[0]}", flush=True)
    mcfg = ModelConfig(input_dims=(512, 512), n_kernels=32)
    model = UNet(mcfg)
    fwd = hk.transform(lambda x: model(x))
    params, _ = fwd.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16),
        train=False,
    )

    def bf16(t):
        return jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, t,
        )

    if mode in ("int8", "int8pf"):
        from segmentation_tpu.models.unet_int8 import UNetS2DInt8

        fast = UNetS2DInt8(mcfg, padflat=mode == "int8pf")
        calib = jax.jit(
            lambda k: jax.random.uniform(k, (4, 512, 512, 3), jnp.bfloat16)
        )(jax.random.PRNGKey(7))
        prepared = bf16(fast.prepare(bf16(params), calib_batches=[calib]))
    else:
        fast = UNetS2DInference(mcfg)
        prepared = bf16(fast.prepare(bf16(params)))

    @jax.jit
    def infer(x):
        return fast.apply_argmax(prepared, x).sum()

    x = jax.jit(
        lambda k: jax.random.uniform(k, (batch, 512, 512, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    x.block_until_ready()

    print("compiling...", flush=True)
    compiled = infer.lower(x).compile()
    hlo = compiled.as_text()
    float(infer(x))

    print("tracing...", flush=True)
    trace_dir = tempfile.mkdtemp(prefix="s2d_attr_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        out = infer(x)
    float(out)
    jax.profiler.stop_trace()

    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    agg = collections.Counter()
    for fp in files:
        with gzip.open(fp) as f:
            data = json.load(f)
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X":
                continue
            name = e.get("name", "?")
            if name.startswith("$") or "(" in name:
                continue
            agg[name] += e.get("dur", 0)
    total = sum(agg.values())
    print(f"\ndevice total = {total / steps / 1e3:.1f} ms/step "
          f"(batch {batch})")

    # ---- attribution: find each op in the HLO --------------------------
    # entry-computation call sites:  %name = ... fusion(...), calls=%comp
    # or root instructions named directly (copy.N, slice.N, reduce_max.N).
    lines = hlo.splitlines()

    def describe(op):
        """Find defining line + called computation's conv/dot shapes."""
        defline = None
        calls = None
        pat = re.compile(rf"%?{re.escape(op)}\.?\d* = |%{re.escape(op)} = ")
        for ln in lines:
            s = ln.strip()
            if s.startswith(f"%{op} = ") or s.startswith(f"{op} = "):
                defline = s
                m = re.search(r"calls=%?([\w.\-]+)", s)
                if m:
                    calls = m.group(1)
                break
        out = []
        if defline:
            m = re.search(r'metadata={[^}]*op_name="([^"]+)"', defline)
            shape = defline.split(" = ")[1].split(" ")[0]
            out.append(f"    shape {shape}")
            if m:
                out.append(f"    op_name {m.group(1)[:120]}")
            src = re.search(
                r'source_file="([^"]+)"[^}]*source_line=(\d+)', defline
            )
            if src:
                out.append(
                    f"    src {os.path.basename(src.group(1))}:"
                    f"{src.group(2)}"
                )
        if calls:
            inside = False
            interesting = []
            for ln in lines:
                s = ln.strip()
                if s.startswith(f"%{calls} ") or s.startswith(
                    f"{calls} "
                ) or re.match(rf"%?{re.escape(calls)}\s*\(", s):
                    inside = True
                    continue
                if inside:
                    if s.startswith("}"):
                        break
                    if ("convolution(" in s or "dot(" in s
                            or "reduce(" in s or "transpose(" in s):
                        mm = re.search(
                            r'metadata={[^}]*op_name="([^"]+)"', s
                        )
                        desc = s.split(" = ")[0].strip()
                        kind = (
                            "conv" if "convolution(" in s else
                            "dot" if "dot(" in s else
                            "reduce" if "reduce(" in s else "transpose"
                        )
                        interesting.append(
                            f"    {kind}: "
                            f"{mm.group(1)[:110] if mm else desc}"
                        )
            out.extend(interesting[:4])
        return out

    for name, dur in agg.most_common(24):
        print(f"{dur / steps / 1e3:8.2f} ms  {100 * dur / total:5.1f}%  "
              f"{name}")
        for ln in describe(name):
            print(ln)


if __name__ == "__main__":
    args = sys.argv[1:]
    mode = "bf16"
    if args and args[-1] in ("bf16", "int8", "int8pf"):
        mode = args.pop()
    main(*[int(a) for a in args], mode=mode)
