"""Grad-accum microbatch probe for the train step's remat tax.

The HLO-truthful profile (profile_train_cats.py) shows ~30 ms/step of
fwd-conv HLO-remat recompute at B=128 — XLA re-running the level-1 convs
because the full activation set doesn't fit. Microbatching via grad
accumulation halves the live activation set per microstep; this probe
measures whether the recompute disappears and whether the smaller-batch
conv efficiency + accumulation overhead nets out ahead.

MEASURED (2026-08-19, v5e, 512²): it does NOT — accumulation LOSES.
  B=128 accum=1   417 img/s (306.7 ms/step)   [train_sweep baseline]
  B=128 accum=2   315 img/s (406.0 ms/step)
  B=128 accum=4   294 img/s (435.3 ms/step)
The per-microbatch conv-efficiency loss + scan/averaging overhead far
exceeds the ≤30 ms remat saving. Grad accumulation stays what it was
built for (fitting B≥160 at all), not a throughput lever.

Usage: python benchmarks/train_accum_probe.py [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main(iters=10):
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

    def run(B, accum, iters):
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s, os_, x, y):
            def loss_fn(p, s_, xi, yi):
                logits, ns = fwd.apply(
                    p, s_, jax.random.PRNGKey(0), xi, train=True
                )
                yy = center_crop_or_pad(
                    yi, logits.shape[1], logits.shape[2]
                )
                return L.segmentation_xentropy(logits, yy, 2), ns

            if accum > 1:
                xb = x.reshape(accum, B // accum, *x.shape[1:])
                yb = y.reshape(accum, B // accum, *y.shape[1:])

                def micro(s_, xy):
                    xi, yi = xy
                    (l, ns), g = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(p, s_, xi, yi)
                    return ns, (g, l)

                ns, (gs, ls) = jax.lax.scan(micro, s, (xb, yb))
                g = jax.tree_util.tree_map(lambda v: v.mean(0), gs)
                l = ls.mean()
            else:
                (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    p, s, x, y
                )
            u, os_ = opt.update(g, os_, p)
            return optax.apply_updates(p, u), ns, os_, l

        x = jax.jit(
            lambda k: jax.random.uniform(k, (B, 512, 512, 3), jnp.bfloat16)
        )(jax.random.PRNGKey(2))
        y = jax.jit(
            lambda k: jax.random.bernoulli(
                k, 0.5, (B, 512, 512, 1)
            ).astype(jnp.uint8)
        )(jax.random.PRNGKey(3))
        x.block_until_ready()
        p, s, os_ = params, st, opt_state
        p, s, os_, l = step(p, s, os_, x, y)
        float(l)
        best = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            p, s, os_, l = step(p, s, os_, x, y)
            float(l)
            best = max(best, B / (time.perf_counter() - t0))
        for a in (x, y):
            a.delete()
        del p, s, os_
        return best

    import ast

    configs = ((128, 1), (128, 2), (128, 4), (256, 2), (256, 4))
    if os.environ.get("ACCUM_CONFIGS"):
        configs = ast.literal_eval(os.environ["ACCUM_CONFIGS"])
    for B, acc in configs:
        print(f"[{time.strftime('%H:%M:%S')}] B={B} accum={acc} compiling...",
              flush=True)
        try:
            ips = run(B, acc, iters)
            print(f"[{time.strftime('%H:%M:%S')}] B={B:4d} accum={acc}  "
                  f"{ips:7.1f} img/s ({B * 1e3 / ips:.1f} ms/step)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B={B:4d} accum={acc}  FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
