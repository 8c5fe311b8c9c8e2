"""Categorized device-time attribution for the s2d U-Net train step.

Buckets every XLA op event from a 3-step trace into forward/backward
categories (fwd convs, input-grad convs, weight-grad convs, pool fwd/bwd,
remat recompute, optimizer, layout copies) so train-perf work targets the
right ops. Complements profile_s2d_train.py (raw top-30 list).

Usage: python benchmarks/profile_train_cats.py [batch] [steps]
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


def categorize(name: str, long_name: str) -> str:
    ln = long_name or ""
    if re.match(r"^\d+$", name):
        return "_module"  # whole-step module event (skip from op sum)
    remat = ".remat" in name
    # weight-grad convs produce f32[k,k,Ci,Co] (kernel-shaped) outputs
    m = re.match(r"\s*%\S+ = \(?(\w+)\[([\d,]*)\]", ln)
    shape = m.group(2) if m else ""
    dims = [int(d) for d in shape.split(",") if d] if shape else []
    if "convolution" in name or "convolution" in ln.split("fusion(")[0]:
        if len(dims) == 4 and dims[0] <= 4 and dims[1] <= 4:
            return "wgrad conv"
        return ("fwd conv (remat)" if remat else "conv (fwd or dgrad)")
    if "compare_select" in name:
        return "pool fwd (argmax)"
    if "slice_maximum" in name or "broadcast_maximum" in name:
        return ("relu/max recompute (remat)" if remat else "relu/max fwd")
    if "copy" in name or "transpose" in name or "bitcast" in name:
        return "layout copy"
    if "all-reduce" in name or "reduce" in name:
        return "reduce"
    if remat:
        return "other remat"
    return "other fusion"


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
            logits, ns = fwd.apply(p, s, jax.random.PRNGKey(0), x, train=True)
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
    params, st, opt_state, l = step(params, st, opt_state, x, y)
    float(l)

    trace_dir = tempfile.mkdtemp(prefix="s2d_cats_")
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

    def ln_of(name):
        a = args_by_name.get(name) or {}
        return str(a.get("long_name") or a.get("tf_op") or "")

    cats = collections.Counter()
    members = collections.defaultdict(list)
    for name, dur in agg.items():
        c = categorize(name, ln_of(name))
        cats[c] += dur
        members[c].append((dur, name))

    step_ms = cats.pop("_module", 0) / steps / 1e3  # avg module evt, ms
    op_total = sum(cats.values())
    print(f"\nstep (module event) = {step_ms:.1f} ms ... "
          f"op-sum = {op_total / steps / 1e3:.1f} ms/step "
          f"(batch {batch}) -> "
          f"{batch * 1e3 / step_ms if step_ms else 0:.0f} img/s (module) / "
          f"{batch * steps * 1e6 / op_total:.0f} img/s (op-sum, overstates "
          f"when ops overlap poorly)")
    for c, dur in cats.most_common():
        print(f"{dur / steps / 1e3:8.2f} ms  {100 * dur / op_total:5.1f}%  {c}")
        for d, n in sorted(members[c], reverse=True)[:6]:
            ln = ln_of(n)
            m = re.search(r"= \(?(\S+?\])", ln)
            shp = m.group(1) if m else ""
            print(f"      {d / steps / 1e3:7.2f} ms  {n}  {shp}")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
