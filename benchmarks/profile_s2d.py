"""Trace the s2d U-Net forward and dump the per-op device time table."""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main(batch=32, steps=3):
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
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, t)
    fast = UNetS2DInference(mcfg)
    prepared = bf16(fast.prepare(bf16(params)))

    @jax.jit
    def infer(x):
        logits = fast.apply(prepared, x)
        return jnp.sum(jnp.argmax(logits, axis=-1).astype(jnp.int32))

    x = jnp.asarray(
        np.random.default_rng(0).random((batch, 512, 512, 3)), jnp.bfloat16
    )
    print("compiling...", flush=True)
    float(infer(x))
    print("tracing...", flush=True)
    trace_dir = tempfile.mkdtemp(prefix="s2d_profile_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        out = infer(x)
    float(out)
    jax.profiler.stop_trace()

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
                continue
            agg[name] += e.get("dur", 0)
    total = sum(agg.values())
    print(f"\ndevice total ≈ {total / steps / 1e3:.1f} ms/step (batch {batch})")
    for name, dur in agg.most_common(30):
        print(f"{dur / steps / 1e3:8.2f} ms  {100 * dur / total:5.1f}%  {name}")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
