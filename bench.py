"""Headline benchmark: U-Net 512×512 inference images/sec/chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured/5000 — the BASELINE.json north-star target of
5,000 images/sec/chip on TPU v5e (the reference publishes no numbers,
BASELINE.md). Details (train step, pipeline MB/s, batch sweep) are written
to BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.nn import module as hk

    details = {"device": str(jax.devices()[0])}

    mcfg = ModelConfig(
        name="unet", n_classes=2, input_dims=(512, 512), n_kernels=32
    )
    model = UNet(mcfg)
    fwd = hk.transform(lambda x: model(x))

    x_init = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
    params, state = fwd.init(jax.random.PRNGKey(0), x_init, train=False)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        params,
    )

    @jax.jit
    def infer(x):
        logits, _ = fwd.apply(params, state, None, x, train=False)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

    def throughput(batch, warmup=3, iters=12):
        x = jnp.asarray(
            np.random.default_rng(0).random((batch, 512, 512, 3)),
            jnp.bfloat16,
        )
        for _ in range(warmup):
            jax.block_until_ready(infer(x))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(x)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        return batch * iters / dt

    best = 0.0
    sweep = {}
    for batch in (8, 16, 32):
        try:
            ips = throughput(batch)
        except Exception as e:  # OOM etc.
            sweep[str(batch)] = f"failed: {e}"
            continue
        sweep[str(batch)] = ips
        best = max(best, ips)
    details["unet512_infer_sweep"] = sweep
    details["unet512_infer_images_per_sec"] = best

    try:
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(details, f, indent=2)
    except OSError:
        pass

    print(
        json.dumps(
            {
                "metric": "unet512_infer_images_per_sec_per_chip",
                "value": round(best, 2),
                "unit": "images/sec",
                "vs_baseline": round(best / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
