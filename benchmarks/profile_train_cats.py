"""Categorized device-time attribution for the s2d U-Net train step.

Buckets every XLA op event from a 3-step trace into HONEST categories by
cross-referencing the compiled HLO text, not the fusion *names*: on TPU a
`broadcast_maximum_fusion` can be a kOutput fusion whose called computation
contains the whole conv+bias+relu (backend_config carries the convolution
emitter), so name-based bucketing mislabels the largest convs as "relu".
(That mislabel cost round 4 a falsified optimization: the "33.9 ms of
standalone relu passes" were the forward convs themselves — see
nn/layers.py relu_out.)

Categories come from each fusion's called computation(s):
  - contains a convolution op -> fwd conv / dgrad conv / wgrad conv,
    split by the conv's op_name (transpose(jvp()) == backward) and
    kernel-shaped output (== wgrad); "(remat)" suffix if XLA HLO remat
    re-executes it.
  - reduce-window / compare_select -> pool
  - copy/transpose/bitcast-only -> layout copy
  - root metadata from losses.py / optax -> loss / optimizer

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


def parse_hlo(text):
    """name -> (def_line, parent_comp); comp -> [lines]."""
    comps = {}
    defs = {}
    comp = None
    for line in text.splitlines():
        m = re.match(r"^(%[\w.\-]+)?\s*(ENTRY\s+)?(%[\w.\-]+)?\s*\(", line)
        if line and not line[0].isspace() and ("{" in line):
            cm = re.match(r"^(?:ENTRY )?%([\w.\-]+)", line)
            comp = cm.group(1) if cm else None
            if comp is not None:
                comps[comp] = []
            continue
        if comp is None:
            continue
        comps[comp].append(line)
        im = re.match(r"\s+(?:ROOT )?%([\w.\-]+) = ", line)
        if im:
            defs.setdefault(im.group(1), (line, comp))
    return defs, comps


_KSHAPE = re.compile(r"= \(?\w+\[(\d+),(\d+),[\d,]*\]")


def _conv_kind(conv_line):
    op = ""
    m = re.search(r'op_name="([^"]*)"', conv_line)
    if m:
        op = m.group(1)
    sm = _KSHAPE.search(conv_line)
    kernel_shaped = bool(sm and int(sm.group(1)) <= 4 and int(sm.group(2)) <= 4)
    if "transpose(" in op:
        return "wgrad conv" if kernel_shaped else "dgrad conv"
    # wgrad convs can lose the transpose() marker when re-associated;
    # kernel-shaped output is the robust signature
    if kernel_shaped and "f01b" in conv_line:
        return "wgrad conv"
    return "fwd conv"


def build_categories(hlo_text):
    defs, comps = parse_hlo(hlo_text)

    def body_lines(name, depth=0):
        """All instruction lines reachable from instruction `name` via
        calls= (fusions nest: kOutput fusions call computations that
        contain further kLoop fusion instructions)."""
        out = []
        d = defs.get(name)
        if not d or depth > 3:
            return out
        line = d[0]
        out.append(line)
        for cm in re.finditer(r"calls=%([\w.\-]+)", line):
            for sub in comps.get(cm.group(1), ()):
                out.append(sub)
                im = re.match(r"\s+(?:ROOT )?%([\w.\-]+) = .*fusion\(", sub)
                if im:
                    out.extend(body_lines(im.group(1), depth + 1))
        return out

    cat = {}
    conv_sig = {}
    for name, (line, _comp) in defs.items():
        lines = body_lines(name)
        convs = [l for l in lines if re.search(r" convolution\(", l)]
        if convs:
            sigs = []
            for c in convs:
                m = re.match(r"\s+(?:ROOT )?%[\w.\-]+ = (\S+?)\s+convolution\(", c)
                out_shp = m.group(1) if m else "?"
                dl = re.search(r"dim_labels=(\S+?)(?:,|})", c)
                win = re.search(r"window=\{([^}]*)\}", c)
                sigs.append(
                    f"{out_shp} {dl.group(1) if dl else ''}"
                    f" [{win.group(1) if win else ''}]"
                )
            conv_sig[name] = "; ".join(sigs)
        remat = ".remat" in name
        if convs:
            # biggest conv decides (a fusion can contain an input-fused
            # elementwise recompute AND the conv)
            kinds = collections.Counter(_conv_kind(c) for c in convs)
            kind = kinds.most_common(1)[0][0]
            cat[name] = kind + (" (remat)" if remat else "")
            continue
        blob = "\n".join(lines)
        if "reduce-window" in blob or "compare_select" in name or (
            "select-and-scatter" in blob
        ):
            cat[name] = "pool" + (" (remat)" if remat else "")
        elif re.fullmatch(r"(copy|transpose|bitcast)[\w.\-]*", name):
            cat[name] = "layout copy"
        elif "/losses.py" in blob or "xentropy" in blob:
            cat[name] = "loss"
        elif "optax" in blob or "/_src/transform" in blob:
            cat[name] = "optimizer"
        elif remat:
            cat[name] = "other remat"
        else:
            cat[name] = "other fusion"
    return cat, conv_sig


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
    compiled = step.lower(params, st, opt_state, x, y).compile()
    hlo_cat, conv_sig = build_categories(compiled.as_text())
    params, st, opt_state, l = compiled(params, st, opt_state, x, y)
    float(l)
    params, st, opt_state, l = compiled(params, st, opt_state, x, y)
    float(l)

    trace_dir = tempfile.mkdtemp(prefix="s2d_cats_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        params, st, opt_state, l = compiled(params, st, opt_state, x, y)
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
    module_us = 0
    for name, dur in agg.items():
        if re.fullmatch(r"\d+", name):
            module_us += dur  # whole-step module event
            continue
        c = hlo_cat.get(name)
        if c is None:
            # trace-only names (infeed, host events)
            c = "layout copy" if re.match(
                r"(copy|transpose|bitcast)", name
            ) else "uncategorized"
        cats[c] += dur
        members[c].append((dur, name))

    step_ms = module_us / steps / 1e3
    op_total = sum(cats.values())
    print(f"\nstep (module event) = {step_ms:.1f} ms ... "
          f"op-sum = {op_total / steps / 1e3:.1f} ms/step "
          f"(batch {batch}) -> "
          f"{batch * 1e3 / step_ms if step_ms else 0:.0f} img/s (module)")
    for c, dur in cats.most_common():
        print(f"{dur / steps / 1e3:8.2f} ms  {100 * dur / op_total:5.1f}%  {c}")
        for d, n in sorted(members[c], reverse=True)[:8]:
            sig = conv_sig.get(n)
            if sig is None:
                ln = ln_of(n)
                m = re.search(r"= \(?(\S+?\])", ln)
                sig = m.group(1) if m else ""
            print(f"      {d / steps / 1e3:7.2f} ms  {n}  {sig}")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
