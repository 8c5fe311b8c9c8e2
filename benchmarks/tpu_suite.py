"""Comprehensive single-process TPU benchmark suite.

Runs every device benchmark in one process (device init on the hosted TPU
tunnel is expensive, and concurrent holders conflict): standard vs
space-to-depth U-Net inference, FCN-8s, train step, and the Pallas
augmentation kernel. All timings force scalar checksums (the platform can
return early from block_until_ready). Prints incrementally.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, *args, reps=2):
    float(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    t0 = time.time()
    log(f"device: {jax.devices()[0]} (init {time.time() - t0:.0f}s)")

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.fcn import FCN
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.models.unet_fast import UNetS2DInference
    from segmentation_tpu.nn import module as hk

    results = {}

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            tree,
        )

    # ---------------- U-Net 512 inference: standard vs s2d ---------------
    mcfg = ModelConfig(input_dims=(512, 512), n_kernels=32)
    model = UNet(mcfg)
    fwd = hk.transform(lambda x: model(x))
    params, state = fwd.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16),
        train=False,
    )
    params = bf16(params)
    fast = UNetS2DInference(mcfg)
    prepared = bf16(fast.prepare(params))

    K, B = 8, 32
    xs = jnp.asarray(
        np.random.default_rng(0).random((K, B, 512, 512, 3)), jnp.bfloat16
    )

    @jax.jit
    def run_std(xs):
        def one(x):
            logits, _ = fwd.apply(params, state, None, x, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        return jax.lax.map(one, xs).sum()

    @jax.jit
    def run_s2d(xs):
        def one(x):
            logits = fast.apply(prepared, x)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        return jax.lax.map(one, xs).sum()

    log("compiling unet std...")
    dt = timed(run_std, xs)
    results["unet512_std_img_s"] = K * B / dt
    log(f"unet std: {K * B / dt:.0f} img/s ({dt / K * 1e3:.1f} ms/batch)")

    log("compiling unet s2d...")
    dt = timed(run_s2d, xs)
    results["unet512_s2d_img_s"] = K * B / dt
    log(f"unet s2d: {K * B / dt:.0f} img/s ({dt / K * 1e3:.1f} ms/batch)")

    # ---------------- FCN-8s 256 inference -------------------------------
    fcfg = ModelConfig(
        name="fcn", input_dims=(256, 256), n_kernels=32, fcn_type="8s"
    )
    fcn = FCN(fcfg)
    ffwd = hk.transform(lambda x: fcn(x))
    fparams, fstate = ffwd.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3), jnp.bfloat16),
        train=False,
    )
    fparams = bf16(fparams)
    fxs = jnp.asarray(
        np.random.default_rng(1).random((K, 64, 256, 256, 3)), jnp.bfloat16
    )

    @jax.jit
    def run_fcn(xs):
        def one(x):
            logits, _ = ffwd.apply(fparams, fstate, None, x, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        return jax.lax.map(one, xs).sum()

    log("compiling fcn8s...")
    dt = timed(run_fcn, fxs)
    results["fcn8s_256_img_s"] = K * 64 / dt
    log(f"fcn8s 256: {K * 64 / dt:.0f} img/s")

    # ---------------- Pallas augment kernel ------------------------------
    try:
        from segmentation_tpu.nn.pallas.augment import pallas_crop_normalize

        imgs = jnp.asarray(
            np.random.default_rng(2).integers(
                0, 255, (64, 600, 600, 3), dtype=np.uint8
            )
        )
        ys = jnp.asarray(np.full(64, 30, np.int32))
        xs_ = jnp.asarray(np.full(64, 40, np.int32))
        fl = jnp.asarray(np.zeros(64, np.int32))

        @jax.jit
        def run_pallas(imgs):
            return pallas_crop_normalize(imgs, ys, xs_, fl, 512).sum()

        log("compiling pallas augment...")
        dt = timed(run_pallas, imgs)
        gbs = 64 * 512 * 512 * 3 / dt / 1e9
        results["pallas_crop_GBps"] = gbs
        log(f"pallas crop+normalize: {dt * 1e3:.2f} ms ({gbs:.0f} GB/s eff)")

        from segmentation_tpu.data.augment import device_augment

        @jax.jit
        def run_xla_aug(imgs):
            out, _ = device_augment(
                jax.random.PRNGKey(0), imgs, None, 512, flip=False
            )
            return out.sum()

        dt = timed(run_xla_aug, imgs)
        results["xla_crop_GBps"] = 64 * 512 * 512 * 3 / dt / 1e9
        log(f"xla crop+normalize: {dt * 1e3:.2f} ms")
    except Exception as e:
        log(f"pallas augment failed: {type(e).__name__}: {e}")

    print("\nRESULTS", results, flush=True)


if __name__ == "__main__":
    main()
