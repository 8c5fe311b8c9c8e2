"""Headline benchmark: U-Net 512×512 inference images/sec/chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured/5000 — the BASELINE.json north-star target of
5,000 images/sec/chip on TPU v5e (the reference publishes no numbers,
BASELINE.md). Details go to BENCH_DETAILS.json:
  - batch sweep, int8 path, train-step throughput (remat @ B=128)
  - Bayesian MC-dropout 1024² tiles (BASELINE config #5)
  - END-TO-END data path: disk → native C++ loader → DevicePrefetcher →
    jitted train step, plus loader worker-count scaling (the "can the
    pipeline feed the chip" answer, quantified for this host)
  - a small deterministic convergence run recording final mIoU

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

    def flush():
        """Write details after every section — a mid-run crash (e.g. the
        remote-compile helper dying with HTTP 500) must not lose the
        already-measured numbers."""
        try:
            with open("BENCH_DETAILS.json", "w") as f:
                json.dump(details, f, indent=2)
        except OSError:
            pass

    mcfg = ModelConfig(
        name="unet", n_classes=2, input_dims=(512, 512), n_kernels=32
    )
    model = UNet(mcfg)
    fwd = hk.transform(lambda x: model(x))

    # init at a tiny (shape-compatible) size: conv param shapes are
    # spatial-independent, and hk init runs the forward EAGERLY (one remote
    # compile per op) — 192 keeps that cheap and off the compile service.
    params, state = fwd.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3), jnp.bfloat16),
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

    def _measure_once(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def device_batches(k, batch, seed):
        """Test data generated ON DEVICE (host RNG for 400M samples costs
        minutes on this 1-core host and is not what we're measuring)."""
        x = jax.jit(
            lambda key: jax.random.uniform(
                key, (k, batch, 512, 512, 3), jnp.bfloat16
            )
        )(jax.random.PRNGKey(seed))
        x.block_until_ready()
        return x

    @jax.jit
    def infer_fn(x):  # [B, 512, 512, 3] -> mask [B, 512, 512] u8
        # packed-head argmax: identical mask output, less layout traffic
        return fast.apply_argmax(prepared, x)

    @jax.jit
    def _checksum(m):
        return m.sum()

    def queued_throughput(fn, batch, seed, iters=3):
        """Enqueue K dispatches back-to-back, sync ONCE via a checksum on
        the last output: the device stream is ordered, so the sync implies
        all K executions completed. This matches production serving
        (requests queued on the device) and avoids the ~4 ms/dispatch
        carry/slice overhead a lax.map formulation adds on-device."""
        x = jax.jit(
            lambda key: jax.random.uniform(
                key, (batch, 512, 512, 3), jnp.bfloat16
            )
        )(jax.random.PRNGKey(seed))
        x.block_until_ready()
        out = fn(x)
        float(_checksum(out))  # compile + warm both
        best = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            for _ in range(K):
                out = fn(x)
            float(_checksum(out))
            dt = time.perf_counter() - t0
            best = max(best, K * batch / dt)
        x.delete()  # free HBM NOW — deferred frees through the tunnel
        # have left >6 GB resident and OOMed later sections
        return best

    def infer_throughput(batch, iters=3):
        return queued_throughput(infer_fn, batch, 0, iters)

    best = 0.0
    sweep = {}
    # B=256/512 rows keep the bf16-vs-int8 comparison honest (int8 sweeps
    # to 512 and gains from batch; bf16 gets the same chance).
    for batch in (64, 128, 256, 512):
        try:
            ips = infer_throughput(batch)
            sweep[str(batch)] = round(ips, 1)
            best = max(best, ips)
        except Exception as e:
            sweep[str(batch)] = f"failed: {type(e).__name__}: {e}"
    details["unet512_infer_sweep"] = sweep
    details["unet512_infer_images_per_sec"] = round(best, 1)
    flush()

    # serving latency: single small batch per dispatch (B=8). The
    # host-observed number includes this environment's ~30 ms tunnel
    # dispatch round-trip (no kernel work can remove it), so the
    # DEVICE per-step latency — a serial K-step scan, each step a full
    # apply_argmax — is recorded alongside; that is the true
    # single-request serving latency (benchmarks/latency_b8.py).
    try:
        @jax.jit
        def infer_one(x):
            return fast.apply_argmax(prepared, x).sum()

        x8 = jax.jit(
            lambda key: jax.random.uniform(
                key, (8, 512, 512, 3), jnp.bfloat16
            )
        )(jax.random.PRNGKey(9))
        float(infer_one(x8))
        lat = min(
            _measure_once(lambda: float(infer_one(x8))) for _ in range(5)
        )
        details["unet512_infer_latency_ms_b8"] = round(lat * 1e3, 1)

        @jax.jit
        def _null(z):
            return z + 1.0

        float(_null(jnp.float32(0)))
        null = min(
            _measure_once(lambda: float(_null(jnp.float32(0))))
            for _ in range(5)
        )

        @jax.jit
        def infer_scan(xx):
            def body(carry, _):
                c, a = carry
                a = jax.lax.optimization_barrier(a)
                m = fast.apply_argmax(prepared, a)
                c = c + m.ravel()[0].astype(jnp.float32) * 1e-30
                return (c, a), None

            (c, _), _ = jax.lax.scan(
                body, (jnp.float32(0.0), xx), None, length=20)
            return c

        float(infer_scan(x8))
        dev = min(
            _measure_once(lambda: float(infer_scan(x8)))
            for _ in range(3)
        )
        x8.delete()
        details["unet512_infer_latency_ms_b8_device"] = round(
            max(dev - null, 1e-9) / 20 * 1e3, 2)
        details["unet512_dispatch_null_ms"] = round(null * 1e3, 1)
    except Exception as e:
        details["unet512_infer_latency_ms_b8"] = f"failed: {e}"
    flush()

    # --- int8 serving path (calibrated PTQ on the padflat/pf2 kernels).
    # HEADLINE-ELIGIBLE: BASELINE's north star has no dtype constraint and
    # calibrated int8 is the production serving config — but only counts
    # when, on TRAINED weights with in-distribution calibration, (a) the
    # int8 mask agrees with the bf16 mask >=98.5% and (b) the mIoU delta
    # vs bf16 is <=0.005 on held-out data (VERDICT r3 item 3: a guard on
    # random weights + noise inputs said nothing about a trained
    # segmenter's masks).
    try:
        from segmentation_tpu.models.unet_int8 import UNetS2DInt8
        from segmentation_tpu.nn.shapes import center_crop_or_pad as _ccp

        q = UNetS2DInt8(mcfg, padflat=True)
        to_bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, t,
        )

        guard_ok = False
        try:
            # Train the flagship 512² config on the synthetic task (same
            # mechanism as the convergence section, flagship scale).
            from segmentation_tpu.core.config import TrainConfig
            from segmentation_tpu.data.synthetic import SyntheticSegmentation
            from segmentation_tpu.models.base import SegmentationTrainer

            gds = SyntheticSegmentation(batch_size=8, hw=(512, 512), seed=11)
            gtr = SegmentationTrainer(
                UNet(mcfg), dataset=gds, model_cfg=mcfg,
                train_cfg=TrainConfig(
                    save_dir="/tmp/bench_guard_snap", learning_rate=3e-4,
                ),
            )
            for _ in range(120):
                gtr.train_step()
            tr_params = jax.device_get(gtr.state.params)
            del gtr  # free params+Adam state HBM before serving evals
            prep_t = to_bf16(fast.prepare(tr_params))
            calib = [b["image"] for b in (gds.get_batch(),)]  # in-dist
            prep_q = to_bf16(q.prepare(tr_params, calib_batches=calib))

            infer_t = jax.jit(lambda x: fast.apply_argmax(prep_t, x))
            infer_qg = jax.jit(lambda x: q.apply_argmax(prep_q, x))
            held = SyntheticSegmentation(batch_size=8, hw=(512, 512),
                                         seed=101)
            from segmentation_tpu.training.losses import miou as _miou

            agrees, mious_f, mious_q = [], [], []
            for _ in range(4):
                hb = held.get_batch()
                xh = jnp.asarray(hb["image"], jnp.bfloat16)
                m_f = infer_t(xh)
                m_q = infer_qg(xh)
                yh = _ccp(
                    jnp.asarray(hb["mask"]), m_f.shape[1], m_f.shape[2]
                )[..., 0]
                agrees.append(float(jnp.mean(m_f == m_q)))
                mious_f.append(float(_miou(m_f, yh, 2)))
                mious_q.append(float(_miou(m_q, yh, 2)))
            agree = float(np.mean(agrees))
            miou_f = float(np.mean(mious_f))
            miou_q = float(np.mean(mious_q))
            delta = abs(miou_f - miou_q)
            details["unet512_int8_mask_agreement"] = round(agree, 5)
            details["unet512_miou_bf16"] = round(miou_f, 4)
            details["unet512_miou_int8"] = round(miou_q, 4)
            details["unet512_int8_miou_delta"] = round(delta, 5)
            guard_ok = agree >= 0.985 and delta <= 0.005
            details["unet512_int8_guard_ok"] = guard_ok
        except Exception as e:  # noqa: BLE001
            details["unet512_int8_guard_ok"] = f"failed: {e}"
            # fall back to random weights so the throughput rows (value-
            # independent) still get measured; headline stays bf16.
            calib = [
                np.random.default_rng(7).random((4, 512, 512, 3)).astype(
                    np.float32
                )
            ]
            prep_q = to_bf16(q.prepare(params, calib_batches=calib))
        flush()

        @jax.jit
        def infer_q1(x):
            return q.apply_argmax(prep_q, x)

        best_q = 0.0
        sweep_q = {}
        # B=512 measured standalone: 2,208 img/s vs 2,160 @256 (compiles
        # clean; input 805 MB, freed per entry via x.delete()). Small
        # batches added in r4: the serial-scan probe measured B=32 at
        # 2,999 img/s device-side vs 2,845 at B=128 (activation
        # residency; benchmarks/latency_b8.py) — give the dispatch-
        # amortized methodology the same range.
        for bq in (32, 64, 128, 256, 512):
            try:
                ips = queued_throughput(infer_q1, bq, 1)
                best_q = max(best_q, ips)
                sweep_q[str(bq)] = round(ips, 1)
            except Exception as e:  # noqa: BLE001
                sweep_q[str(bq)] = f"failed: {type(e).__name__}: {e}"
        details["unet512_int8_sweep"] = sweep_q
        details["unet512_int8_images_per_sec"] = round(best_q, 1)
        if guard_ok:
            best = max(best, best_q)
            details["unet512_infer_images_per_sec"] = round(best, 1)
    except Exception as e:
        details["unet512_int8_images_per_sec"] = f"failed: {e}"
    flush()

    # --- train-step throughput (secondary metric for BENCH_DETAILS) -------
    # The flat packed layout fits B=128 without remat; remat stays in the
    # sweep as the config for bigger batches/models.
    import optax

    from segmentation_tpu.models.unet_fast import UNetS2D
    from segmentation_tpu.nn.shapes import center_crop_or_pad
    from segmentation_tpu.training import losses as L

    try:
        s2d_model = UNetS2D(mcfg)
        tfwd = hk.transform(lambda x: s2d_model(x))
        opt = optax.adam(1e-4)
        tparams, tstate = tfwd.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 192, 192, 3), jnp.bfloat16), train=True,
        )
        train_ready = True
    except Exception as e:  # e.g. transient remote-compile failure
        details["unet512_train_sweep"] = f"init failed: {e}"
        train_ready = False

    def train_throughput(Bt, remat, iters=3, accum=1):
        opt_state = opt.init(tparams)

        apply_train = lambda p, st, x: tfwd.apply(  # noqa: E731
            p, st, jax.random.PRNGKey(0), x, train=True
        )
        if remat:
            apply_train = jax.checkpoint(apply_train)

        @jax.jit
        def train_many(carry, xs, ys):
            def step(carry, xy):
                tp, ms, os_ = carry
                x, y = xy

                def loss_fn(p, ms_, xi, yi):
                    logits, new_ms = apply_train(p, ms_, xi)
                    yy = center_crop_or_pad(
                        yi, logits.shape[1], logits.shape[2]
                    )
                    return (
                        L.segmentation_xentropy(logits, yy, 2), new_ms
                    )

                if accum > 1:
                    # grad accumulation (TrainConfig.grad_accum): k
                    # microbatches per update — the config for batches
                    # past the per-chip memory wall (B>=160 plain OOMs)
                    xb = x.reshape(accum, Bt // accum, *x.shape[1:])
                    yb = y.reshape(accum, Bt // accum, *y.shape[1:])

                    def micro(ms_, xy_):
                        xi, yi = xy_
                        (l, nm), g = jax.value_and_grad(
                            loss_fn, has_aux=True
                        )(tp, ms_, xi, yi)
                        return nm, (g, l)

                    new_ms, (gs, ls_) = jax.lax.scan(
                        micro, ms, (xb, yb)
                    )
                    g = jax.tree_util.tree_map(
                        lambda v: v.mean(0), gs
                    )
                    loss = ls_.mean()
                else:
                    (loss, new_ms), g = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(tp, ms, x, y)
                upd, os_ = opt.update(g, os_, tp)
                tp = optax.apply_updates(tp, upd)
                return (tp, new_ms, os_), loss

            carry, ls = jax.lax.scan(step, carry, (xs, ys))
            return carry, ls.sum()

        Kt = 2
        xs = device_batches(Kt, Bt, 2)
        ys = jax.jit(
            lambda key: jax.random.bernoulli(
                key, 0.5, (Kt, Bt, 512, 512, 1)
            ).astype(jnp.uint8)
        )(jax.random.PRNGKey(3))
        carry = (tparams, tstate, opt_state)
        carry, s = train_many(carry, xs, ys)
        float(s)
        best = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            carry, s = train_many(carry, xs, ys)
            float(s)
            best = max(best, Kt * Bt / (time.perf_counter() - t0))
        for a in (xs, ys):
            a.delete()
        jax.tree_util.tree_map(lambda a: a.delete(), carry)
        return best

    if train_ready:
        tsweep = {}
        details["unet512_train_sweep"] = tsweep  # same object; flush sees it
        # NOTE: no plain B>=160 config — those compiles OOM (even with
        # remat; measured 2026-08-18), and a failed compile poisons the
        # backend for every subsequent section of the run. B=192 ships as
        # grad_accum=2 (TrainConfig.grad_accum / --grad-accum): one
        # optimizer update consuming 2x96 microbatches.
        for Bt, remat, acc in (
            (128, False, 1), (128, True, 1), (192, False, 2),
        ):
            key = f"B{Bt}{'_remat' if remat else ''}" + (
                f"_accum{acc}" if acc > 1 else ""
            )
            try:
                tsweep[key] = round(
                    train_throughput(Bt, remat, accum=acc), 1
                )
            except Exception as e:
                tsweep[key] = f"failed: {type(e).__name__}: {e}"
            flush()
        details["unet512_train_sweep"] = tsweep
        best_train = max(
            (v for v in tsweep.values() if isinstance(v, float)),
            default=0.0,
        )
        details["unet512_train_images_per_sec"] = best_train
    flush()

    # --- Bayesian MC-dropout 1024² tiles (BASELINE.md config #5) ----------
    try:
        bcfg = ModelConfig(
            name="unet", n_classes=2, input_dims=(1024, 1024),
            n_kernels=32, bayesian=True,
        )
        # s2d layout with live MC-dropout sites (same Kendall&Gal mechanism,
        # fast layout — models/unet_fast.py)
        from segmentation_tpu.models.unet_fast import UNetS2D

        bmodel = UNetS2D(bcfg)
        bfwd = hk.transform(lambda x: bmodel(x))
        bparams, bstate = bfwd.init(
            jax.random.PRNGKey(2),
            jnp.zeros((1, 192, 192, 3), jnp.bfloat16), train=False,
        )
        bparams = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, bparams,
        )
        from segmentation_tpu.training.bayesian import mc_sample

        S, Bmc = 8, 2

        def make_mc(sp):
            @jax.jit
            def mc(x, rng):
                def apply_fn(p, ms, k, xx, train):
                    return bfwd.apply(p, ms, k, xx, train=train)

                samples = mc_sample(
                    apply_fn, bparams, bstate, rng, x, S, sp
                )
                return (jnp.mean(samples, 0).sum()
                        + jnp.var(samples, 0).sum())

            return mc

        xb = jax.jit(
            lambda key: jax.random.uniform(
                key, (Bmc, 1024, 1024, 3), jnp.bfloat16
            )
        )(jax.random.PRNGKey(4))
        # samples_per_pass=1 is the serial-map formulation; sp=4 rides 4
        # MC samples on the batch axis per forward (iid-identical —
        # dropout masks are per batch element; see training/bayesian.py).
        for sp, key in ((1, "bayesian_mc8_1024_tiles_per_sec_serial"),
                        (4, "bayesian_mc8_1024_tiles_per_sec_hk")):
            try:
                mc = make_mc(sp)
                float(mc(xb, jax.random.PRNGKey(4)))
                t0 = time.perf_counter()
                float(mc(xb, jax.random.PRNGKey(5)))
                dt = time.perf_counter() - t0
                details[key] = round(Bmc / dt, 2)
            except Exception as e:
                details[key] = f"failed: {e}"
            flush()

        # fast-layout MC (the shipped infer_bayesian route since r4):
        # explicit per-pass dropout keys through the packed serving
        # graph (models/unet_fast.py mc_keys; training/bayesian.py
        # mc_sample_fast). Statistical parity locked in
        # tests/test_mc_fast.py; bench keeps the hk row above so the
        # layout win stays visible.
        try:
            from segmentation_tpu.models.unet_fast import (
                UNetS2DInference,
            )
            from segmentation_tpu.training.bayesian import (
                mc_sample_fast,
            )

            bfast = UNetS2DInference(bcfg)
            bprep = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                bfast.prepare(jax.device_get(bparams)),
            )

            @jax.jit
            def mcf(x, rng):
                s = mc_sample_fast(bfast, bprep, rng, x, S, 4)
                return jnp.mean(s, 0).sum() + jnp.var(s, 0).sum()

            float(mcf(xb, jax.random.PRNGKey(4)))
            t0 = time.perf_counter()
            float(mcf(xb, jax.random.PRNGKey(5)))
            dt = time.perf_counter() - t0
            details["bayesian_mc8_1024_tiles_per_sec"] = round(
                Bmc / dt, 2)
            details["bayesian_mc8_1024_route"] = "fast"
        except Exception as e:
            # Headline falls back to the measured hk route so a fast-
            # layout compile regression degrades the number instead of
            # zeroing it; the route row keeps the failure visible.
            hk_rate = details.get("bayesian_mc8_1024_tiles_per_sec_hk")
            details["bayesian_mc8_1024_route"] = (
                f"hk-fallback (fast failed: {str(e)[:160]})")
            details["bayesian_mc8_1024_tiles_per_sec"] = (
                hk_rate if isinstance(hk_rate, float) else f"failed: {e}")
        flush()
        xb.delete()
    except Exception as e:
        details["bayesian_mc8_1024_tiles_per_sec"] = f"failed: {e}"
    flush()

    # --- END-TO-END data path: disk → C++ loader → prefetch → train step --
    # (VERDICT round-1 item 5: the synthetic headline says what the chip can
    # eat; this says what the pipeline can feed it, per worker count.)
    try:
        import tempfile

        import cv2

        tmp = tempfile.mkdtemp(prefix="bench_pipe_")
        img_dir = os.path.join(tmp, "features")
        mask_dir = os.path.join(tmp, "labels")
        os.makedirs(img_dir), os.makedirs(mask_dir)
        rng = np.random.default_rng(0)
        for i in range(48):
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
            # (a) loader-only worker scaling. Long steady-state windows: the
            # workers prefill an internal queue during warmup, so short
            # windows overstate the rate by draining the prefill.
            scaling = {}
            for threads in (1, 2, 4):
                ds = native.NativeImageMaskDataSet(
                    img_dir, mask_dir, batch_size=16, crop_size=512,
                    threads=threads,
                )
                for _ in range(3):  # warm decode + drain the prefill
                    ds.get_batch()
                t0 = time.perf_counter()
                nbytes = n_img = 0
                for _ in range(12):
                    b = ds.get_batch()
                    nbytes += sum(a.nbytes for a in b.values())
                    n_img += 16
                dt = time.perf_counter() - t0
                scaling[str(threads)] = {
                    "MBps": round(nbytes / dt / 1e6, 1),
                    "images_per_sec": round(n_img / dt, 1),
                }
                ds.close()
            details["pipeline_native_scaling"] = scaling
            details["pipeline_native_MBps"] = max(
                v["MBps"] for v in scaling.values()
            )

            # (b) full path: loader → DevicePrefetcher → jitted train step
            from segmentation_tpu.data.pipeline import DevicePrefetcher

            Be = 16
            best_threads = max(
                scaling, key=lambda k: scaling[k]["images_per_sec"]
            )
            # uint8 staging: raw bytes to the device (4x less transfer
            # through the host→device path); /255 fused into the step.
            ds = native.NativeImageMaskDataSet(
                img_dir, mask_dir, batch_size=Be, crop_size=512,
                threads=int(best_threads), uint8_images=True,
            )
            pf = DevicePrefetcher(ds, depth=2)
            opt_state_e = opt.init(tparams)

            apply_train = jax.checkpoint(
                lambda p, st, x: tfwd.apply(
                    p, st, jax.random.PRNGKey(0), x, train=True
                )
            )

            @jax.jit
            def train_step_e(tp, ms, os_, x, y):
                def loss_fn(p):
                    xin = x.astype(jnp.bfloat16)
                    if x.dtype == jnp.uint8:
                        xin = xin * (1.0 / 255.0)
                    logits, new_ms = apply_train(p, ms, xin)
                    yy = center_crop_or_pad(
                        y, logits.shape[1], logits.shape[2]
                    )
                    return L.segmentation_xentropy(logits, yy, 2), new_ms

                (loss, new_ms), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(tp)
                upd, os_ = opt.update(g, os_, tp)
                return optax.apply_updates(tp, upd), new_ms, os_, loss

            # host→device bandwidth of one batch through the tunnel —
            # the attribution row for the e2e number below.
            bh = ds.get_batch()
            best_tx = 0.0  # best-of-3: the prefetch thread contends for
            for _ in range(3):  # the single host core, one-shot is noisy
                t0 = time.perf_counter()
                xb_ = jax.device_put(bh["image"])
                xb_.block_until_ready()
                best_tx = max(
                    best_tx,
                    bh["image"].nbytes / (time.perf_counter() - t0) / 1e6,
                )
                xb_.delete()
            details["e2e_transfer_MBps"] = round(best_tx, 1)

            def fetch():
                b = pf.get_batch()
                y = (
                    b["mask"][..., None]
                    if b["mask"].ndim == 3 else b["mask"]
                )
                return b["image"], y

            # TWO warm steps: the first compiles with uncommitted params,
            # the second with the step outputs' shardings — timing after
            # both avoids counting a recompile as data-path time.
            x, y = fetch()
            tp, ms, os_, loss = train_step_e(
                tparams, tstate, opt_state_e, x, y
            )
            float(loss)
            x, y = fetch()
            tp, ms, os_, loss = train_step_e(tp, ms, os_, x, y)
            float(loss)
            n_steps = 5
            t0 = time.perf_counter()
            for _ in range(n_steps):
                x, y = fetch()
                tp, ms, os_, loss = train_step_e(tp, ms, os_, x, y)
            float(loss)
            dt = time.perf_counter() - t0
            details["e2e_disk_to_step_images_per_sec"] = round(
                n_steps * Be / dt, 1
            )
            ds.close()
    except Exception as e:
        details["e2e_disk_to_step_images_per_sec"] = f"failed: {e}"
    flush()

    # --- FCN-8s 256² inference (BASELINE config #2 analog) ----------------
    try:
        from segmentation_tpu.models.fcn import FCN

        fcfg = ModelConfig(
            name="fcn", n_classes=2, input_dims=(256, 256), n_kernels=32,
            fcn_type="8s",
        )
        fmodel = FCN(fcfg)
        ffwd = hk.transform(lambda x: fmodel(x))
        fparams, fstate = ffwd.init(
            jax.random.PRNGKey(5),
            jnp.zeros((1, 256, 256, 3), jnp.bfloat16), train=False,
        )
        fparams = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, fparams,
        )
        Kf, Bf = 4, 256

        @jax.jit
        def infer_f(xs):
            def one(x):
                out, _ = ffwd.apply(
                    fparams, fstate, jax.random.PRNGKey(0), x, train=False
                )
                return jnp.argmax(out, -1).astype(jnp.uint8)

            return jax.lax.map(one, xs).sum()

        xf = jax.jit(
            lambda key: jax.random.uniform(
                key, (Kf, Bf, 256, 256, 3), jnp.bfloat16
            )
        )(jax.random.PRNGKey(6))
        xf.block_until_ready()
        float(infer_f(xf))
        t0 = time.perf_counter()
        float(infer_f(xf))
        dt = time.perf_counter() - t0
        xf.delete()
        details["fcn8s_256_infer_images_per_sec"] = round(Kf * Bf / dt, 1)
    except Exception as e:
        details["fcn8s_256_infer_images_per_sec"] = f"failed: {e}"
    flush()

    # --- adversarial U-Net training (BASELINE config #4) ------------------
    try:
        from segmentation_tpu.core.config import TrainConfig
        from segmentation_tpu.data.synthetic import SyntheticSegmentation
        from segmentation_tpu.models.base import SegmentationTrainer

        ahw = (256, 256)
        acfg = ModelConfig(
            n_classes=2, input_dims=ahw, n_kernels=32,
            adversarial_training=True,
        )
        atcfg = TrainConfig(
            save_dir=os.path.join("/tmp", "bench_adv_snap"),
            learning_rate=1e-4,
        )
        Ba = 32
        ads = SyntheticSegmentation(batch_size=Ba, hw=ahw, seed=1)
        atrainer = SegmentationTrainer(
            UNet(acfg), dataset=ads, model_cfg=acfg, train_cfg=atcfg,
        )
        # chip throughput of the canonical jitted adversarial step (dual
        # optimizers, Luc losses): device-resident batch, the host feed is
        # measured separately by the pipeline/e2e rows.
        batch = atrainer._place_batch(ads.get_batch())
        st_a = atrainer.state
        st_a, m = atrainer._train_step(st_a, batch)   # compile + warm
        st_a, m = atrainer._train_step(st_a, batch)   # steady-state shardings
        float(jax.device_get(m["seg_loss"]))
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            st_a, m = atrainer._train_step(st_a, batch)
        float(jax.device_get(m["seg_loss"]))
        dt = time.perf_counter() - t0
        details["unet256_adversarial_train_images_per_sec"] = round(
            n * Ba / dt, 1
        )
    except Exception as e:
        details["unet256_adversarial_train_images_per_sec"] = f"failed: {e}"
    flush()

    # --- MNIST conv autoencoder (BASELINE config #1) ----------------------
    try:
        from segmentation_tpu.core.config import TrainConfig
        from segmentation_tpu.data.datasets import MNISTDataSet
        from segmentation_tpu.models.autoencoder import Autoencoder
        from segmentation_tpu.models.base import SegmentationTrainer

        aecfg = ModelConfig(
            n_classes=2, input_dims=(28, 28), input_channel=1,
            autoencoder=True, adversarial_training=False,
            encoder_type="small", zed_dim=32,
        )
        aetcfg = TrainConfig(
            save_dir=os.path.join("/tmp", "bench_ae_snap"),
            learning_rate=1e-4,
        )
        mnist = MNISTDataSet(source_dir="/tmp/bench_mnist", batch_size=128)
        aet = SegmentationTrainer(
            Autoencoder(aecfg), dataset=mnist, model_cfg=aecfg,
            train_cfg=aetcfg,
        )
        aet.train_step()
        n = 20
        aet.train_steps(n)  # compile the scanned window
        t0 = time.perf_counter()
        aet.train_steps(n)  # n steps in ONE dispatch (Trainer.train_steps)
        dt = time.perf_counter() - t0
        details["mnist_autoencoder_steps_per_sec"] = round(n / dt, 1)
    except Exception as e:
        details["mnist_autoencoder_steps_per_sec"] = f"failed: {e}"
    flush()

    # --- deterministic convergence run → recorded mIoU (VERDICT item 6b) --
    try:
        from segmentation_tpu.core.config import TrainConfig
        from segmentation_tpu.data.synthetic import SyntheticSegmentation
        from segmentation_tpu.models.base import SegmentationTrainer

        hw = (64, 64)
        ccfg = ModelConfig(n_classes=2, input_dims=hw, n_kernels=8)
        tcfg = TrainConfig(
            save_dir=os.path.join("/tmp", "bench_conv_snap"),
            learning_rate=3e-4,
        )
        cds = SyntheticSegmentation(batch_size=16, hw=hw, seed=0)
        trainer = SegmentationTrainer(
            UNet(ccfg, levels=2), dataset=cds, model_cfg=ccfg,
            train_cfg=tcfg, test_dataset=SyntheticSegmentation(
                batch_size=16, hw=hw, seed=99
            ),
        )
        for _ in range(150):
            trainer.train_step()
        m = trainer.test()
        details["convergence_miou_synthetic"] = round(
            float(m.get("miou", float("nan"))), 4
        )
        details["convergence_steps"] = 150
    except Exception as e:
        details["convergence_miou_synthetic"] = f"failed: {e}"
    flush()

    details["parity_strategy"] = (
        "reference is bit-rotted TF1 (SURVEY §2.9); parity is locked against "
        "analytic oracles (torch conv/deconv + loss math, scipy/closed-form "
        "bilinear kernels, TF crop semantics), exact s2d-vs-standard forward "
        "equality, and committed golden-forward fingerprints "
        "(tests/test_golden_parity.py); convergence_miou_synthetic above is "
        "the recorded deterministic convergence artifact"
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
