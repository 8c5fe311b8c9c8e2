"""Trace ONE s2d U-Net train step (fwd+bwd+Adam) and attribute device time.

Same method as profile_s2d_attr.py but over the training step — answers
where the backward pass spends its time (input-gradient convs, weight-grad
convs, layout copies) so train-throughput work targets the right ops.

Usage: python benchmarks/profile_s2d_train.py [batch] [steps]
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


def main(batch=128, steps=3):
    import jax
    import jax.numpy as jnp
    import optax

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet_fast import UNetS2D
    from segmentation_tpu.nn import module as hk
    from segmentation_tpu.nn.shapes import center_crop_or_pad
    from segmentation_tpu.training import losses as L

    print(f"[{time.strftime('%H:%M:%S')}] init {jax.devices()[0]}", flush=True)
    mcfg = ModelConfig(input_dims=(512, 512), n_kernels=32, n_classes=2)
    model = UNetS2D(mcfg)
    fwd = hk.transform(lambda x: model(x))
    params, st = fwd.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 192, 192, 3), jnp.bfloat16),
        train=True,
    )
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, os_, x, y):
        def loss_fn(p):
            logits, ns = fwd.apply(
                p, s, jax.random.PRNGKey(0), x, train=True
            )
            yy = center_crop_or_pad(y, logits.shape[1], logits.shape[2])
            return L.segmentation_xentropy(logits, yy, 2), ns

        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        u, os_ = opt.update(g, os_, p)
        return optax.apply_updates(p, u), ns, os_, l

    x = jax.jit(
        lambda k: jax.random.uniform(k, (batch, 512, 512, 3), jnp.bfloat16)
    )(jax.random.PRNGKey(2))
    y = jax.jit(
        lambda k: jax.random.bernoulli(k, 0.5, (batch, 512, 512, 1)).astype(
            jnp.uint8
        )
    )(jax.random.PRNGKey(3))
    x.block_until_ready()

    print("compiling...", flush=True)
    params, st, opt_state, l = step(params, st, opt_state, x, y)
    float(l)
    params, st, opt_state, l = step(params, st, opt_state, x, y)  # resharded
    float(l)

    print("tracing...", flush=True)
    trace_dir = tempfile.mkdtemp(prefix="s2d_train_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        params, st, opt_state, l = step(params, st, opt_state, x, y)
    float(l)
    jax.profiler.stop_trace()

    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    agg = collections.Counter()
    args_by_name = {}
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
            a = e.get("args")
            if a and name not in args_by_name:
                args_by_name[name] = a
    total = sum(agg.values())
    print(f"\ndevice total = {total / steps / 1e3:.1f} ms/step "
          f"(batch {batch}) -> {batch * steps * 1e6 / total:.0f} img/s")
    for name, dur in agg.most_common(30):
        line = f"{dur / steps / 1e3:8.2f} ms  {100 * dur / total:5.1f}%  {name}"
        a = args_by_name.get(name) or {}
        ln = a.get("long_name") or a.get("tf_op") or ""
        if ln:
            src = re.search(r"source_file=([^ ]+)#source_line=(\d+)", str(ln))
            line += f"\n    {str(ln)[:140]}"
        print(line)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
