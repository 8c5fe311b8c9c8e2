"""Dump the compiled train-step HLO to a file for offline fusion forensics.

Companion to profile_train_cats.py: same model/step build, but stops after
compile and writes `compiled.as_text()` so slow fusions identified by the
profiler (by name) can be read line by line without re-tracing.

Usage: python benchmarks/dump_train_hlo.py [batch] [outfile]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main(batch=128, outfile="/tmp/train_hlo.txt"):
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

    x = jnp.zeros((batch, 512, 512, 3), jnp.bfloat16)
    y = jnp.zeros((batch, 512, 512, 1), jnp.uint8)
    print("compiling...", flush=True)
    compiled = step.lower(params, st, opt_state, x, y).compile()
    text = compiled.as_text()
    with open(outfile, "w") as f:
        f.write(text)
    print(f"wrote {len(text)} bytes -> {outfile}")
    try:
        ma = compiled.memory_analysis()
        gb = 1024 ** 3
        print(
            f"memory: peak {ma.temp_size_in_bytes / gb:.2f} GiB temp + "
            f"{ma.argument_size_in_bytes / gb:.2f} arg + "
            f"{ma.output_size_in_bytes / gb:.2f} out "
            f"(alias {ma.alias_size_in_bytes / gb:.2f}), "
            f"gen code {ma.generated_code_size_in_bytes / 1024**2:.1f} MiB"
        )
    except Exception as e:  # axon backend may not expose it
        print(f"memory_analysis unavailable: {e}")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 128, *(args[1:2]))
