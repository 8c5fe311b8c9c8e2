"""Per-op device profile of the flagship U-Net forward pass.

Captures a jax.profiler trace of the compiled inference step and prints a
duration-sorted table of device ops with source attribution — the tool for
deciding where Pallas/layout work pays (SURVEY §5 tracing requirement).

Usage: python benchmarks/profile_unet.py [batch] [n_kernels]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=32, n_kernels=32, steps=3):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.nn import module as hk

    mcfg = ModelConfig(input_dims=(512, 512), n_kernels=n_kernels)
    model = UNet(mcfg)
    fwd = hk.transform(lambda x: model(x))
    params, state = fwd.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16),
        train=False,
    )
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params,
    )

    @jax.jit
    def infer(x):
        logits, _ = fwd.apply(params, state, None, x, train=False)
        return jnp.sum(
            jnp.argmax(logits, axis=-1).astype(jnp.int32)
        )

    x = jnp.asarray(
        np.random.default_rng(0).random((batch, 512, 512, 3)), jnp.bfloat16
    )
    print("compiling...", flush=True)
    compiled = infer.lower(x).compile()
    hlo = compiled.as_text()
    float(compiled(x))  # settle
    print("tracing...", flush=True)

    trace_dir = tempfile.mkdtemp(prefix="unet_profile_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        out = compiled(x)
    float(out)
    jax.profiler.stop_trace()
    print("parsing...", flush=True)
    meta = {}
    for line in hlo.splitlines():
        line = line.strip()
        if "= " in line and ("fusion" in line or "slice" in line or
                             "copy" in line or "convolution" in line):
            name = line.lstrip("%").split(" ")[0]
            src = ""
            if "metadata=" in line:
                import re

                m = re.search(r'op_name="([^"]*)"', line)
                s = re.search(r'source_file="([^"]*)"', line)
                ln = re.search(r"source_line=(\d+)", line)
                src = (m.group(1) if m else "")
                if s:
                    src += f" [{os.path.basename(s.group(1))}:{ln.group(1) if ln else '?'}]"
            shape = line.split("= ", 1)[1].split(" ")[0]
            meta[name] = (shape, src)

    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    agg = collections.Counter()
    for fp in files:
        with gzip.open(fp) as f:
            data = json.load(f)
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X":
                continue
            name = e.get("name", "?")
            if name.startswith("$") or "(" in name:
                continue  # host-side python frames
            agg[name] += e.get("dur", 0)

    total = sum(agg.values())
    print(f"\ndevice total ≈ {total / steps / 1e3:.1f} ms/step "
          f"(batch {batch}) → {batch * steps * 1e6 / total:.0f} img/s\n")
    print(f"{'ms/step':>8}  {'%':>5}  op  [shape]  source")
    for name, dur in agg.most_common(40):
        shape, src = meta.get(name, ("", ""))
        print(f"{dur / steps / 1e3:8.2f}  {100 * dur / total:5.1f}  "
              f"{name}  {shape[:48]}  {src[:70]}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
