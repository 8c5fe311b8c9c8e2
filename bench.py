"""Headline benchmark: U-Net 512×512 inference images/sec/chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured/5000 — the BASELINE.json north-star target of
5,000 images/sec/chip on TPU v5e (the reference publishes no numbers,
BASELINE.md). Details (train-step throughput, batch sweep) go to
BENCH_DETAILS.json.

Timing discipline: the device runtime on this platform can return from
block_until_ready before execution completes, so every measurement forces a
scalar checksum to host (`float(...)`) — a full synchronization.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.models.unet_fast import UNetS2DInference
    from segmentation_tpu.nn import module as hk

    details = {
        "device": str(jax.devices()[0]),
        "host_cores": os.cpu_count(),  # pipeline MB/s scales with this
    }

    mcfg = ModelConfig(
        name="unet", n_classes=2, input_dims=(512, 512), n_kernels=32
    )
    model = UNet(mcfg)
    fwd = hk.transform(lambda x: model(x))

    params, state = fwd.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16),
        train=False,
    )
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        params,
    )
    # Inference runs through the space-to-depth path (exact parity with the
    # standard forward — tests/test_unet_fast.py)
    fast = UNetS2DInference(mcfg)
    prepared = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        fast.prepare(params),
    )

    K = 8  # batches per dispatch: amortizes launch overhead; all real work

    @jax.jit
    def infer_many(xs):  # [K, B, 512, 512, 3] -> checksum
        def one(x):
            # packed-head argmax: identical mask output, less layout traffic
            return fast.apply_argmax(prepared, x)

        return jax.lax.map(one, xs).sum()

    def infer_throughput(batch, iters=3):
        xs = jnp.asarray(
            np.random.default_rng(0).random((K, batch, 512, 512, 3)),
            jnp.bfloat16,
        )
        float(infer_many(xs))  # compile + warm
        best = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            float(infer_many(xs))
            dt = time.perf_counter() - t0
            best = max(best, K * batch / dt)
        return best

    best = 0.0
    sweep = {}
    for batch in (64, 128):
        try:
            ips = infer_throughput(batch)
            sweep[str(batch)] = round(ips, 1)
            best = max(best, ips)
        except Exception as e:
            sweep[str(batch)] = f"failed: {type(e).__name__}: {e}"
    details["unet512_infer_sweep"] = sweep
    details["unet512_infer_images_per_sec"] = round(best, 1)

    # --- int8 quantized serving path (not the headline: post-training
    # quantization trades exact parity — ~99% mask agreement — for speed)
    try:
        from segmentation_tpu.models.unet_int8 import UNetS2DInt8

        q = UNetS2DInt8(mcfg)
        calib = [
            np.random.default_rng(7).random((4, 512, 512, 3)).astype(
                np.float32
            )
        ]
        prep_q = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            q.prepare(params, calib_batches=calib),
        )

        @jax.jit
        def infer_q(xs):
            def one(x):
                return q.apply_argmax(prep_q, x)

            return jax.lax.map(one, xs).sum()

        Kq = 2
        xq = jnp.asarray(
            np.random.default_rng(0).random((Kq, 128, 512, 512, 3)),
            jnp.bfloat16,
        )
        float(infer_q(xq))
        t0 = time.perf_counter()
        float(infer_q(xq))
        dt = time.perf_counter() - t0
        details["unet512_int8_images_per_sec"] = round(Kq * 128 / dt, 1)
    except Exception as e:
        details["unet512_int8_images_per_sec"] = f"failed: {e}"

    # --- train-step throughput (secondary metric for BENCH_DETAILS) -------
    try:
        import optax

        from segmentation_tpu.models.unet_fast import UNetS2D

        s2d_model = UNetS2D(mcfg)
        tfwd = hk.transform(lambda x: s2d_model(x))
        opt = optax.adam(1e-4)
        tparams, tstate = tfwd.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 512, 512, 3), jnp.bfloat16), train=True,
        )
        opt_state = opt.init(tparams)
        from segmentation_tpu.nn.shapes import center_crop_or_pad
        from segmentation_tpu.training import losses as L

        Bt = 64  # B=128 OOMs by ~6MB inside the full bench program

        @jax.jit
        def train_many(carry, xs, ys):
            tparams, tstate, opt_state = carry

            def step(carry, xy):
                tparams, tstate, opt_state = carry
                x, y = xy

                def loss_fn(p):
                    logits, new_ms = tfwd.apply(
                        p, tstate, jax.random.PRNGKey(0), x, train=True
                    )
                    yy = center_crop_or_pad(
                        y, logits.shape[1], logits.shape[2]
                    )
                    return L.segmentation_xentropy(logits, yy, 2), new_ms

                (loss, new_ms), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(tparams)
                upd, opt_state = opt.update(g, opt_state, tparams)
                tparams = optax.apply_updates(tparams, upd)
                return (tparams, new_ms, opt_state), loss

            carry, ls = jax.lax.scan(step, carry, (xs, ys))
            return carry, ls.sum()

        Kt = 2
        xs = jnp.asarray(
            np.random.default_rng(1).random((Kt, Bt, 512, 512, 3)),
            jnp.bfloat16,
        )
        ys = jnp.asarray(
            np.random.default_rng(2).integers(0, 2, (Kt, Bt, 512, 512, 1)),
            jnp.uint8,
        )
        carry = (tparams, tstate, opt_state)
        carry, s = train_many(carry, xs, ys)
        float(s)
        t0 = time.perf_counter()
        carry, s = train_many(carry, xs, ys)
        float(s)
        dt = time.perf_counter() - t0
        details["unet512_train_images_per_sec"] = round(Kt * Bt / dt, 1)
    except Exception as e:
        details["unet512_train_images_per_sec"] = f"failed: {e}"

    # --- Bayesian MC-dropout 1024² tiles (BASELINE.md config #5) ----------
    try:
        bcfg = ModelConfig(
            name="unet", n_classes=2, input_dims=(1024, 1024),
            n_kernels=32, bayesian=True,
        )
        bmodel = UNet(bcfg)
        bfwd = hk.transform(lambda x: bmodel(x))
        bparams, bstate = bfwd.init(
            jax.random.PRNGKey(2),
            jnp.zeros((1, 1024, 1024, 3), jnp.bfloat16), train=False,
        )
        bparams = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, bparams,
        )
        S, Bmc = 8, 2

        @jax.jit
        def mc(x, rng):
            keys = jax.random.split(rng, S)

            def one(k):
                logits, _ = bfwd.apply(bparams, bstate, k, x, train=False)
                return jax.nn.sigmoid(logits.astype(jnp.float32))

            samples = jax.lax.map(one, keys)
            return jnp.mean(samples, 0).sum() + jnp.var(samples, 0).sum()

        xb = jnp.asarray(
            np.random.default_rng(3).random((Bmc, 1024, 1024, 3)),
            jnp.bfloat16,
        )
        float(mc(xb, jax.random.PRNGKey(4)))
        t0 = time.perf_counter()
        float(mc(xb, jax.random.PRNGKey(5)))
        dt = time.perf_counter() - t0
        details["bayesian_mc8_1024_tiles_per_sec"] = round(Bmc / dt, 2)
    except Exception as e:
        details["bayesian_mc8_1024_tiles_per_sec"] = f"failed: {e}"

    # --- input-pipeline bandwidth (BASELINE.md metric: MB/s per host) -----
    try:
        import tempfile

        import cv2

        tmp = tempfile.mkdtemp(prefix="bench_pipe_")
        img_dir = os.path.join(tmp, "features")
        mask_dir = os.path.join(tmp, "labels")
        os.makedirs(img_dir), os.makedirs(mask_dir)
        rng = np.random.default_rng(0)
        for i in range(24):
            cv2.imwrite(
                os.path.join(img_dir, f"{i:03d}.jpg"),
                rng.integers(0, 255, (600, 600, 3), dtype=np.uint8),
            )
            cv2.imwrite(
                os.path.join(mask_dir, f"{i:03d}.png"),
                rng.integers(0, 2, (600, 600), dtype=np.uint8) * 255,
            )
        from segmentation_tpu.data import native

        if native.available():
            ds = native.NativeImageMaskDataSet(
                img_dir, mask_dir, batch_size=32, crop_size=512, threads=8,
            )
            ds.get_batch()
            t0 = time.perf_counter()
            nbytes = 0
            for _ in range(8):
                b = ds.get_batch()
                nbytes += sum(a.nbytes for a in b.values())
            details["pipeline_native_MBps"] = round(
                nbytes / (time.perf_counter() - t0) / 1e6, 1
            )
            ds.close()
    except Exception as e:
        details["pipeline_native_MBps"] = f"failed: {e}"

    details["parity_strategy"] = (
        "reference is bit-rotted TF1 (SURVEY §2.9); parity is locked against "
        "analytic oracles instead: torch conv/deconv + loss math, scipy/"
        "closed-form bilinear kernels, TF crop semantics, and exact "
        "s2d-vs-standard forward equality (tests/)"
    )

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
