"""Headline benchmark: U-Net 512×512 inference images/sec/chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured/5000 — the BASELINE.json north-star target of
5,000 images/sec/chip on TPU v5e (the reference publishes no numbers,
BASELINE.md). Details go to BENCH_DETAILS.json.

Process architecture (round-5, after the round-4 rc:124 loss): the main
process is a pure ORCHESTRATOR — it never imports jax. Every measurement
section runs in its own subprocess (`python bench.py --section NAME`)
under a hard wall-clock budget; a wedged remote compile (the round-4
failure mode: a C-level block that signal.alarm cannot interrupt) is
killed with SIGKILL and degrades exactly one section, never the
artifact. Children flush partial results to their --out file after every
measurement (atomic rename), so even a killed section keeps what it
measured. The headline JSON is printed THE MOMENT the serving sections
finish — everything after it is secondary-metric work. A global
deadline (BENCH_BUDGET_S, default 3300 s) guarantees exit 0 before any
plausible driver timeout.

Sections and what they measure:
  serving_bf16  bf16 batch sweep + B=8 serving latency (device + tunnel)
  serving_int8  calibrated-PTQ int8 path, guarded on trained weights
  train         train-step throughput (plain / remat / grad-accum)
  bayesian      MC-dropout 1024² tiles (BASELINE config #5), 3 routes
  pipeline      disk → C++ loader → DevicePrefetcher → jitted step
  fcn           FCN-8s 256² inference (BASELINE config #2 analog)
  adversarial   adversarial U-Net training step (BASELINE config #4)
  mnist         MNIST conv autoencoder steps/sec (BASELINE config #1)
  convergence   deterministic 150-step run → recorded mIoU

Timing discipline: the device runtime on this platform can return from
block_until_ready before execution completes, so every measurement forces a
scalar checksum to host (`float(...)`) — a full synchronization.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

# (name, wall-clock budget in seconds). Budgets are hard caps enforced by
# SIGKILL from the orchestrator; with a warm compile cache the whole run
# finishes far under the sum.
SECTIONS = (
    ("serving_bf16", 780),
    # int8 includes the trained-weights guard: ~350 s with the cached
    # checkpoint, ~850 s if the cache is cold — budget for the cold case.
    ("serving_int8", 960),
    ("train", 600),
    ("bayesian", 780),
    ("pipeline", 360),
    ("fcn", 300),
    ("adversarial", 360),
    ("mnist", 300),
    ("convergence", 420),
)

NORTH_STAR = 5000.0
GUARD_CACHE = "/root/.cache/seg_tpu_bench/guard_params.pkl"


# --------------------------------------------------------------------------
# orchestrator (no jax in this process)
# --------------------------------------------------------------------------

def _atomic_dump(obj, path):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2)
    os.replace(tmp, path)


def orchestrate():
    t_start = time.time()
    budget = float(os.environ.get("BENCH_BUDGET_S", "3300"))
    deadline = t_start + budget

    details = {"sections": {}}
    headline_printed = False

    def flush():
        try:
            _atomic_dump(details, "BENCH_DETAILS.json")
        except OSError:
            pass

    def headline_value():
        """int8 is headline-eligible only when its trained-weights guard
        passed (VERDICT r3 item 3)."""
        bf = details.get("unet512_infer_bf16_images_per_sec")
        best = float(bf) if isinstance(bf, (int, float)) else 0.0
        q = details.get("unet512_int8_images_per_sec")
        if details.get("unet512_int8_guard_ok") is True and isinstance(
            q, (int, float)
        ):
            best = max(best, float(q))
        return best

    def print_headline():
        best = headline_value()
        details["unet512_infer_images_per_sec"] = round(best, 1)
        print(
            json.dumps(
                {
                    "metric": "unet512_infer_images_per_sec_per_chip",
                    "value": round(best, 2),
                    "unit": "images/sec",
                    "vs_baseline": round(best / NORTH_STAR, 4),
                }
            ),
            flush=True,
        )

    def launch_section(name, sec_budget, retry=False):
        nonlocal headline_printed
        remaining = deadline - time.time()
        if remaining < 90:
            if not retry:
                details["sections"][name] = "skipped: global deadline"
                flush()
            return
        out = f"/tmp/bench_section_{name}.json"
        try:
            os.remove(out)
        except OSError:
            pass
        # BENCH_SECTION_SCALE > 1 for cache-warming validation runs where
        # a kill would leave an orphan compile wedging the serial queue.
        scale = float(os.environ.get("BENCH_SECTION_SCALE", "1"))
        cap = min(sec_budget * scale, remaining - 30)
        print(f"[bench] section {name} (budget {cap:.0f}s"
              f"{', retry' if retry else ''})", file=sys.stderr, flush=True)
        t0 = time.time()
        # Child stdout joins our stderr: the orchestrator's stdout carries
        # exactly one JSON line for the whole run.
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--section", name,
             "--out", out],
            stdout=sys.stderr, stderr=sys.stderr,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
            start_new_session=True,
        )
        try:
            rc = proc.wait(timeout=cap)
            status = "ok" if rc == 0 else f"rc {rc}"
        except subprocess.TimeoutExpired:
            # SIGKILL the whole process group: a wedged C-level compile
            # does not respond to SIGTERM-and-hope.
            try:
                os.killpg(proc.pid, 9)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            proc.wait()
            status = f"timeout after {cap:.0f}s (killed)"
        key = name + ("_retry" if retry else "")
        details["sections"][key] = status
        details["sections"][key + "_wall_s"] = round(time.time() - t0, 1)
        # Merge whatever the child managed to flush before exit/kill.
        try:
            with open(out) as f:
                details.update(json.load(f))
        except (OSError, ValueError):
            pass
        flush()
        if name == "serving_int8" and not headline_printed:
            # Defer only if there is literally no serving number yet (a
            # later retry may produce one); otherwise emit NOW so a hang
            # in any secondary section can never erase the deliverable.
            if headline_value() > 0:
                print_headline()
                headline_printed = True
                flush()

    for name, sec_budget in SECTIONS:
        launch_section(name, sec_budget)

    # One retry pass for crashed/killed sections (e.g. the transient
    # "TPU worker process crashed or restarted" that took out a section
    # in round-5 validation — the next fresh process recovers).
    for name, sec_budget in SECTIONS:
        st = str(details["sections"].get(name, ""))
        if st == "ok" or st.startswith("skipped"):
            continue
        if deadline - time.time() < 150:
            break
        launch_section(name, sec_budget, retry=True)

    if not headline_printed:
        print_headline()
    flush()
    return 0


# --------------------------------------------------------------------------
# shared child helpers
# --------------------------------------------------------------------------

def _measure_once(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _retry_compile(fn, out_note=None, tries=2, backoff=15.0):
    """Run fn; on a transient compile-service failure (the round-4
    `remote_compile: HTTP 500` that killed the bf16 B=512 row) wait and
    retry once. Non-transient errors re-raise immediately."""
    for attempt in range(tries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            transient = ("remote_compile" in msg or "HTTP 5" in msg
                         or "DEADLINE_EXCEEDED" in msg)
            if attempt + 1 >= tries or not transient:
                raise
            if out_note is not None:
                out_note(f"retrying after: {msg[:120]}")
            time.sleep(backoff)


class SectionWriter:
    """Incremental, atomic result sink for a child section."""

    def __init__(self, path):
        self.path = path
        self.data = {}

    def __setitem__(self, key, value):
        self.data[key] = value
        self.flush()

    def get(self, key, default=None):
        return self.data.get(key, default)

    def flush(self):
        try:
            _atomic_dump(self.data, self.path)
        except OSError:
            pass


def _bf16_tree(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        tree,
    )


def _flagship_cfg():
    from segmentation_tpu.core.config import ModelConfig

    return ModelConfig(
        name="unet", n_classes=2, input_dims=(512, 512), n_kernels=32
    )


def _flagship_params():
    """Deterministic flagship params (PRNGKey(0)), shared by the serving
    sections so bf16 and int8 run the same fallback weights."""
    import jax
    import jax.numpy as jnp

    from segmentation_tpu.models.unet import UNet
    from segmentation_tpu.nn import module as hk

    mcfg = _flagship_cfg()
    model = UNet(mcfg)
    fwd = hk.transform(lambda x: model(x))
    # init at a tiny (shape-compatible) size: conv param shapes are
    # spatial-independent, and hk init runs the forward EAGERLY (one remote
    # compile per op) — 192 keeps that cheap and off the compile service.
    params, state = fwd.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3), jnp.bfloat16),
        train=False,
    )
    return mcfg, _bf16_tree(params), state


def _device_batch(batch, seed, hw=512):
    import jax
    import jax.numpy as jnp

    x = jax.jit(
        lambda key: jax.random.uniform(
            key, (batch, hw, hw, 3), jnp.bfloat16
        )
    )(jax.random.PRNGKey(seed))
    x.block_until_ready()
    return x


def _queued_throughput(fn, batch, seed, out_note=None, iters=3, K=8,
                       hw=512):
    """Enqueue K dispatches back-to-back, sync ONCE via a checksum on
    the last output: the device stream is ordered, so the sync implies
    all K executions completed. This matches production serving
    (requests queued on the device) and avoids the ~4 ms/dispatch
    carry/slice overhead a lax.map formulation adds on-device."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _checksum(m):
        return m.sum()

    x = _device_batch(batch, seed, hw=hw)
    _retry_compile(lambda: float(_checksum(fn(x))), out_note)  # compile+warm
    best = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = fn(x)
        float(_checksum(out))
        dt = time.perf_counter() - t0
        best = max(best, K * batch / dt)
    x.delete()  # free HBM NOW — deferred frees through the tunnel
    # have left >6 GB resident and OOMed later sections
    return best


# --------------------------------------------------------------------------
# sections
# --------------------------------------------------------------------------

def sec_serving_bf16(out: SectionWriter):
    import jax
    import jax.numpy as jnp

    from segmentation_tpu.models.unet_fast import UNetS2DInference

    out["device"] = str(jax.devices()[0])
    out["host_cores"] = os.cpu_count()  # pipeline MB/s scales with this

    mcfg, params, _state = _flagship_params()
    # Inference runs through the space-to-depth path (exact parity with the
    # standard forward — tests/test_unet_fast.py)
    fast = UNetS2DInference(mcfg)
    prepared = _bf16_tree(fast.prepare(params))

    @jax.jit
    def infer_fn(x):  # [B, 512, 512, 3] -> mask [B, 512, 512] u8
        # packed-head argmax: identical mask output, less layout traffic
        return fast.apply_argmax(prepared, x)

    def note(msg):
        out["unet512_infer_sweep_note"] = msg

    # serving latency: single small batch per dispatch (B=8). The
    # host-observed number includes this environment's ~30 ms tunnel
    # dispatch round-trip (no kernel work can remove it), so the
    # DEVICE per-step latency — a serial K-step scan, each step a full
    # apply_argmax — is recorded alongside; that is the true
    # single-request serving latency (benchmarks/latency_b8.py).
    @jax.jit
    def infer_one(x):
        return fast.apply_argmax(prepared, x).sum()

    x8 = _device_batch(8, 9)
    _retry_compile(lambda: float(infer_one(x8)), note)
    lat = min(
        _measure_once(lambda: float(infer_one(x8))) for _ in range(5)
    )
    out["unet512_infer_latency_ms_b8"] = round(lat * 1e3, 1)

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

    _retry_compile(lambda: float(infer_scan(x8)), note)
    devs = [
        max(_measure_once(lambda: float(infer_scan(x8))) - null, 1e-9)
        / 20 * 1e3
        for _ in range(5)
    ]
    x8.delete()
    devs.sort()
    out["unet512_infer_latency_ms_b8_device"] = round(devs[len(devs) // 2], 2)
    out["unet512_infer_latency_ms_b8_device_minmax"] = [
        round(devs[0], 2), round(devs[-1], 2)
    ]
    out["unet512_dispatch_null_ms"] = round(null * 1e3, 1)

    # Sweep LAST: a large-batch runtime OOM (B=384 hit transient
    # RESOURCE_EXHAUSTED in round-5 validation) poisons the whole
    # process, so the latency rows above must already be recorded.
    # B=256/384/512 rows keep the bf16-vs-int8 comparison honest (int8
    # sweeps to 768 and gains from batch; bf16 gets the same chance).
    # bf16 B=512 fails DETERMINISTICALLY in the AOT compile helper
    # (subprocess exit 1, rounds 4 and 5, retried with backoff both
    # times) — B=384 bounds the large-batch bf16 trend instead.
    best = 0.0
    sweep = {}
    for batch in (64, 128, 256, 384, 512):
        try:
            ips = _queued_throughput(infer_fn, batch, 0, note)
            sweep[str(batch)] = round(ips, 1)
            best = max(best, ips)
        except Exception as e:  # noqa: BLE001
            sweep[str(batch)] = f"failed: {type(e).__name__}: {str(e)[:200]}"
            out["unet512_infer_sweep"] = dict(sweep)
            out["unet512_infer_bf16_images_per_sec"] = round(best, 1)
            if "RESOURCE_EXHAUSTED" in str(e):
                break  # backend is poisoned for this process
        out["unet512_infer_sweep"] = dict(sweep)
    out["unet512_infer_bf16_images_per_sec"] = round(best, 1)



def _trained_guard_params(mcfg):
    """Train the flagship 512² config on the synthetic task (same mechanism
    as the convergence section, flagship scale) — or load the cached result
    from a previous bench run. The cache keys on the param tree structure:
    stale-but-structurally-identical weights are still 'trained weights'
    for the int8-vs-bf16 agreement guard."""
    import pickle

    import jax
    import numpy as np

    from segmentation_tpu.core.config import TrainConfig
    from segmentation_tpu.data.synthetic import SyntheticSegmentation
    from segmentation_tpu.models.base import SegmentationTrainer
    from segmentation_tpu.models.unet import UNet

    def _sig(tree):
        leaves = jax.tree_util.tree_leaves_with_path(tree)
        return sorted(
            (jax.tree_util.keystr(p), tuple(np.shape(v)))
            for p, v in leaves
        )

    _, fresh, _ = _flagship_params()
    want = _sig(fresh)
    try:
        with open(GUARD_CACHE, "rb") as f:
            cached = pickle.load(f)
        if _sig(cached) == want:
            return cached, True
    except Exception:  # noqa: BLE001 — any cache problem → retrain
        pass

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
    try:
        os.makedirs(os.path.dirname(GUARD_CACHE), exist_ok=True)
        with open(GUARD_CACHE + ".tmp", "wb") as f:
            pickle.dump(tr_params, f)
        os.replace(GUARD_CACHE + ".tmp", GUARD_CACHE)
    except OSError:
        pass
    return tr_params, False


def sec_serving_int8(out: SectionWriter):
    """int8 serving path (calibrated PTQ on the padflat/pf2 kernels).
    HEADLINE-ELIGIBLE: BASELINE's north star has no dtype constraint and
    calibrated int8 is the production serving config — but only counts
    when, on TRAINED weights with in-distribution calibration, (a) the
    int8 mask agrees with the bf16 mask >=98.5% and (b) the mIoU delta
    vs bf16 is <=0.005 on held-out data (VERDICT r3 item 3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentation_tpu.data.synthetic import SyntheticSegmentation
    from segmentation_tpu.models.unet_fast import UNetS2DInference
    from segmentation_tpu.models.unet_int8 import UNetS2DInt8
    from segmentation_tpu.nn.shapes import center_crop_or_pad as _ccp
    from segmentation_tpu.training.losses import miou as _miou

    mcfg, params, _state = _flagship_params()
    fast = UNetS2DInference(mcfg)
    q = UNetS2DInt8(mcfg, padflat=True)

    def note(msg):
        out["unet512_int8_note"] = msg

    guard_ok = False
    try:
        tr_params, from_cache = _trained_guard_params(mcfg)
        out["unet512_int8_guard_params_cached"] = from_cache
        gds = SyntheticSegmentation(batch_size=8, hw=(512, 512), seed=11)
        prep_t = _bf16_tree(fast.prepare(tr_params))
        calib = [b["image"] for b in (gds.get_batch(),)]  # in-dist
        prep_q = _bf16_tree(q.prepare(tr_params, calib_batches=calib))

        infer_t = jax.jit(lambda x: fast.apply_argmax(prep_t, x))
        infer_qg = jax.jit(lambda x: q.apply_argmax(prep_q, x))
        held = SyntheticSegmentation(batch_size=8, hw=(512, 512), seed=101)

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
        out["unet512_int8_mask_agreement"] = round(agree, 5)
        out["unet512_miou_bf16"] = round(miou_f, 4)
        out["unet512_miou_int8"] = round(miou_q, 4)
        out["unet512_int8_miou_delta"] = round(delta, 5)
        guard_ok = agree >= 0.985 and delta <= 0.005
        out["unet512_int8_guard_ok"] = guard_ok
    except Exception as e:  # noqa: BLE001
        out["unet512_int8_guard_ok"] = f"failed: {str(e)[:200]}"
        # fall back to random weights so the throughput rows (value-
        # independent) still get measured; headline stays bf16.
        calib = [
            np.random.default_rng(7).random((4, 512, 512, 3)).astype(
                np.float32
            )
        ]
        prep_q = _bf16_tree(q.prepare(params, calib_batches=calib))

    @jax.jit
    def infer_q1(x):
        return q.apply_argmax(prep_q, x)

    best_q = 0.0
    sweep_q = {}
    # Small batches: the serial-scan probe measured B=32 at 2,999 img/s
    # device-side vs 2,845 at B=128 (activation residency;
    # benchmarks/latency_b8.py) — give the dispatch-amortized methodology
    # the same range.
    # B=768 probes whether the batch-amortization trend (+1.8 % from
    # 256→512) continues; a compile-helper crash there degrades one row.
    for bq in (32, 64, 128, 256, 512, 768):
        try:
            ips = _queued_throughput(infer_q1, bq, 1, note)
            best_q = max(best_q, ips)
            sweep_q[str(bq)] = round(ips, 1)
        except Exception as e:  # noqa: BLE001
            sweep_q[str(bq)] = f"failed: {type(e).__name__}: {str(e)[:200]}"
            if "RESOURCE_EXHAUSTED" in str(e):
                out["unet512_int8_sweep"] = dict(sweep_q)
                break  # backend poisoned — keep what's measured
        out["unet512_int8_sweep"] = dict(sweep_q)
    out["unet512_int8_images_per_sec"] = round(best_q, 1)


def _train_setup():
    import jax
    import jax.numpy as jnp
    import optax

    from segmentation_tpu.models.unet_fast import UNetS2D
    from segmentation_tpu.nn import module as hk

    mcfg = _flagship_cfg()
    s2d_model = UNetS2D(mcfg)
    tfwd = hk.transform(lambda x: s2d_model(x))
    opt = optax.adam(1e-4)
    tparams, tstate = tfwd.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 192, 192, 3), jnp.bfloat16), train=True,
    )
    return tfwd, opt, tparams, tstate


def sec_train(out: SectionWriter):
    """Train-step throughput. The flat packed layout fits B=128 without
    remat; remat stays in the sweep as the config for bigger
    batches/models. NOTE: no plain B>=160 config — those compiles OOM
    (even with remat; measured 2026-08-18). B=192 ships as grad_accum=2
    (TrainConfig.grad_accum / --grad-accum): one optimizer update
    consuming 2x96 microbatches."""
    import jax
    import jax.numpy as jnp
    import optax

    from segmentation_tpu.nn.shapes import center_crop_or_pad
    from segmentation_tpu.training import losses as L

    tfwd, opt, tparams, tstate = _train_setup()

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

        # Steps per dispatch: the serving rows amortize this
        # environment's ~26 ms tunnel round-trip over K=8 queued
        # dispatches; the train rows ride the same production construct
        # (Trainer.train_steps — n steps in ONE dispatch). Device-side
        # per-step time is dispatch-count invariant (measured round 3);
        # Kt only removes the tunnel artifact from the host-observed
        # number. Kt=4 at B=192 bounds the staged-input HBM.
        Kt = 8 if Bt <= 128 else 4
        xs = jax.jit(
            lambda key: jax.random.uniform(
                key, (Kt, Bt, 512, 512, 3), jnp.bfloat16
            )
        )(jax.random.PRNGKey(2))
        xs.block_until_ready()
        ys = jax.jit(
            lambda key: jax.random.bernoulli(
                key, 0.5, (Kt, Bt, 512, 512, 1)
            ).astype(jnp.uint8)
        )(jax.random.PRNGKey(3))
        carry = (tparams, tstate, opt_state)
        carry_s = _retry_compile(lambda: train_many(carry, xs, ys))
        carry2, s = carry_s
        float(s)
        best = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            carry2, s = train_many(carry2, xs, ys)
            float(s)
            best = max(best, Kt * Bt / (time.perf_counter() - t0))
        for a in (xs, ys):
            a.delete()
        jax.tree_util.tree_map(lambda a: a.delete(), carry2)
        return best

    tsweep = {}
    for Bt, remat, acc in (
        (128, False, 1), (128, True, 1), (192, False, 2),
    ):
        key = f"B{Bt}{'_remat' if remat else ''}" + (
            f"_accum{acc}" if acc > 1 else ""
        )
        try:
            tsweep[key] = round(train_throughput(Bt, remat, accum=acc), 1)
        except Exception as e:  # noqa: BLE001
            tsweep[key] = f"failed: {type(e).__name__}: {str(e)[:200]}"
        out["unet512_train_sweep"] = dict(tsweep)
    best_train = max(
        (v for v in tsweep.values() if isinstance(v, float)), default=0.0
    )
    out["unet512_train_images_per_sec"] = best_train


def sec_bayesian(out: SectionWriter):
    """Bayesian MC-dropout 1024² tiles (BASELINE.md config #5). Route
    order is deliberate: hk (the known-good fallback) FIRST, serial
    second, the packed fast layout LAST — the round-4 run wedged inside
    the fast route's compile, and this ordering plus the section budget
    means a repeat costs only the fast row."""
    import jax
    import jax.numpy as jnp

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet_fast import UNetS2D, UNetS2DInference
    from segmentation_tpu.nn import module as hk
    from segmentation_tpu.training.bayesian import mc_sample, mc_sample_fast

    bcfg = ModelConfig(
        name="unet", n_classes=2, input_dims=(1024, 1024),
        n_kernels=32, bayesian=True,
    )
    bmodel = UNetS2D(bcfg)
    bfwd = hk.transform(lambda x: bmodel(x))
    bparams, bstate = bfwd.init(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 192, 192, 3), jnp.bfloat16), train=False,
    )
    bparams = _bf16_tree(bparams)

    S, Bmc = 8, 2

    def make_mc(sp):
        @jax.jit
        def mc(x, rng):
            def apply_fn(p, ms, k, xx, train):
                return bfwd.apply(p, ms, k, xx, train=train)

            samples = mc_sample(apply_fn, bparams, bstate, rng, x, S, sp)
            return jnp.mean(samples, 0).sum() + jnp.var(samples, 0).sum()

        return mc

    xb = _device_batch(Bmc, 4, hw=1024)
    # samples_per_pass=1 is the serial-map formulation; sp=4 rides 4
    # MC samples on the batch axis per forward (iid-identical —
    # dropout masks are per batch element; see training/bayesian.py).
    for sp, key in ((4, "bayesian_mc8_1024_tiles_per_sec_hk"),
                    (1, "bayesian_mc8_1024_tiles_per_sec_serial")):
        try:
            mc = make_mc(sp)
            _retry_compile(lambda: float(mc(xb, jax.random.PRNGKey(4))))
            dt = min(
                _measure_once(lambda: float(mc(xb, jax.random.PRNGKey(5))))
                for _ in range(2)
            )
            out[key] = round(Bmc / dt, 2)
        except Exception as e:  # noqa: BLE001
            out[key] = f"failed: {str(e)[:200]}"

    # Provisional headline = hk: if the fast route below wedges and the
    # section is killed, the metric row is already a number.
    hk_rate = out.get("bayesian_mc8_1024_tiles_per_sec_hk")
    if isinstance(hk_rate, float):
        out["bayesian_mc8_1024_tiles_per_sec"] = hk_rate
        out["bayesian_mc8_1024_route"] = "hk"

    # fast-layout MC (packed serving graph with explicit per-pass dropout
    # keys — models/unet_fast.py mc_keys; training/bayesian.py
    # mc_sample_fast). Statistical parity locked in tests/test_mc_fast.py.
    # samples_per_pass=1: the batch-tiled sp=4 body (B=8 at 1024²)
    # deterministically crashes the AOT compile helper, while the sp=1
    # form compiles and measured 17.88 tiles/s (benchmarks/
    # mc1024_probe.py formulation ladder, round 5).
    try:
        bfast = UNetS2DInference(bcfg)
        bprep = _bf16_tree(bfast.prepare(jax.device_get(bparams)))

        # plain (non-MC) packed serving at 1024² — BASELINE config #5
        # geometry coverage; compiles fine (the MC failure is batch-
        # tiling, not the 1024² region)
        try:
            @jax.jit
            def plain1024(x):
                return bfast.apply_argmax(bprep, x)

            ips = _queued_throughput(plain1024, Bmc, 6, iters=3, K=4,
                                     hw=1024)
            out["unet1024_infer_tiles_per_sec"] = round(ips, 2)
        except Exception as e:  # noqa: BLE001
            out["unet1024_infer_tiles_per_sec"] = f"failed: {str(e)[:160]}"

        @jax.jit
        def mcf(x, rng):
            s = mc_sample_fast(bfast, bprep, rng, x, S, 1)
            return jnp.mean(s, 0).sum() + jnp.var(s, 0).sum()

        _retry_compile(lambda: float(mcf(xb, jax.random.PRNGKey(4))))
        dt = min(
            _measure_once(lambda: float(mcf(xb, jax.random.PRNGKey(5))))
            for _ in range(2)
        )
        fast_rate = round(Bmc / dt, 2)
        out["bayesian_mc8_1024_tiles_per_sec_fast"] = fast_rate
        # The fast route takes the headline only by MEASURING faster
        # (VERDICT r4 item 2: never default to an unmeasured path).
        if not isinstance(hk_rate, float) or fast_rate > hk_rate:
            out["bayesian_mc8_1024_tiles_per_sec"] = fast_rate
            out["bayesian_mc8_1024_route"] = "fast"
    except Exception as e:  # noqa: BLE001
        out["bayesian_mc8_1024_tiles_per_sec_fast"] = (
            f"failed: {str(e)[:200]}")
    xb.delete()


def sec_pipeline(out: SectionWriter):
    """END-TO-END data path: disk → C++ loader → prefetch → train step.
    (VERDICT round-1 item 5: the synthetic headline says what the chip can
    eat; this says what the pipeline can feed it, per worker count.)"""
    import tempfile

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from segmentation_tpu.data import native
    from segmentation_tpu.data.pipeline import DevicePrefetcher
    from segmentation_tpu.nn.shapes import center_crop_or_pad
    from segmentation_tpu.training import losses as L

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

    if not native.available():
        out["pipeline_native_scaling"] = "skipped: native loader unavailable"
        return

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
        out["pipeline_native_scaling"] = dict(scaling)
    out["pipeline_native_MBps"] = max(v["MBps"] for v in scaling.values())

    # (b) full path: loader → DevicePrefetcher → jitted train step
    tfwd, opt, tparams, tstate = _train_setup()
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
            yy = center_crop_or_pad(y, logits.shape[1], logits.shape[2])
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
    out["e2e_transfer_MBps"] = round(best_tx, 1)

    def fetch():
        b = pf.get_batch()
        y = b["mask"][..., None] if b["mask"].ndim == 3 else b["mask"]
        return b["image"], y

    # TWO warm steps: the first compiles with uncommitted params,
    # the second with the step outputs' shardings — timing after
    # both avoids counting a recompile as data-path time.
    x, y = fetch()
    tp, ms, os_, loss = _retry_compile(
        lambda: train_step_e(tparams, tstate, opt_state_e, x, y)
    )
    float(loss)
    x, y = fetch()
    tp, ms, os_, loss = train_step_e(tp, ms, os_, x, y)
    float(loss)
    n_steps = 5
    best_dt = 1e9
    for _ in range(2):  # best-of-2 windows: the 1-core host's loader
        t0 = time.perf_counter()  # threads contend with the feed loop
        for _ in range(n_steps):
            x, y = fetch()
            tp, ms, os_, loss = train_step_e(tp, ms, os_, x, y)
        float(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)
    out["e2e_disk_to_step_images_per_sec"] = round(
        n_steps * Be / best_dt, 1)
    ds.close()


def sec_fcn(out: SectionWriter):
    """FCN-8s 256² inference (BASELINE config #2 analog)."""
    import jax
    import jax.numpy as jnp

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.fcn import FCN
    from segmentation_tpu.nn import module as hk

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
    fparams = _bf16_tree(fparams)
    Kf, Bf = 4, 256

    @jax.jit
    def infer_f(xs):
        def one(x):
            o, _ = ffwd.apply(
                fparams, fstate, jax.random.PRNGKey(0), x, train=False
            )
            return jnp.argmax(o, -1).astype(jnp.uint8)

        return jax.lax.map(one, xs).sum()

    xf = jax.jit(
        lambda key: jax.random.uniform(
            key, (Kf, Bf, 256, 256, 3), jnp.bfloat16
        )
    )(jax.random.PRNGKey(6))
    xf.block_until_ready()
    _retry_compile(lambda: float(infer_f(xf)))
    dt = min(_measure_once(lambda: float(infer_f(xf))) for _ in range(3))
    xf.delete()
    out["fcn8s_256_infer_images_per_sec"] = round(Kf * Bf / dt, 1)


def sec_adversarial(out: SectionWriter):
    """Adversarial U-Net training (BASELINE config #4): chip throughput of
    the canonical jitted adversarial step (dual optimizers, Luc losses)
    on a device-resident batch; the host feed is measured separately by
    the pipeline rows."""
    import jax

    from segmentation_tpu.core.config import ModelConfig, TrainConfig
    from segmentation_tpu.data.synthetic import SyntheticSegmentation
    from segmentation_tpu.models.base import SegmentationTrainer
    from segmentation_tpu.models.unet import UNet

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
    batch = atrainer._place_batch(ads.get_batch())
    st_a = atrainer.state
    st_a, m = _retry_compile(lambda: atrainer._train_step(st_a, batch))
    st_a, m = atrainer._train_step(st_a, batch)  # steady-state shardings
    float(jax.device_get(m["seg_loss"]))
    n = 8
    best_dt = 1e9
    for _ in range(2):  # best-of-2 windows (run-to-run host variance)
        t0 = time.perf_counter()
        for _ in range(n):
            st_a, m = atrainer._train_step(st_a, batch)
        float(jax.device_get(m["seg_loss"]))
        best_dt = min(best_dt, time.perf_counter() - t0)
    out["unet256_adversarial_train_images_per_sec"] = round(
        n * Ba / best_dt, 1)


def sec_mnist(out: SectionWriter):
    """MNIST conv autoencoder (BASELINE config #1)."""
    from segmentation_tpu.core.config import ModelConfig, TrainConfig
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
    _retry_compile(lambda: aet.train_steps(n))  # compile the scanned window
    dt = min(  # n steps in ONE dispatch (Trainer.train_steps); best-of-2
        _measure_once(lambda: aet.train_steps(n)) for _ in range(2)
    )
    out["mnist_autoencoder_steps_per_sec"] = round(n / dt, 1)


def sec_convergence(out: SectionWriter):
    """Deterministic convergence run → recorded mIoU (VERDICT item 6b)."""
    from segmentation_tpu.core.config import ModelConfig, TrainConfig
    from segmentation_tpu.data.synthetic import SyntheticSegmentation
    from segmentation_tpu.models.base import SegmentationTrainer
    from segmentation_tpu.models.unet import UNet

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
    out["convergence_miou_synthetic"] = round(
        float(m.get("miou", float("nan"))), 4
    )
    out["convergence_steps"] = 150
    out["parity_strategy"] = (
        "reference is bit-rotted TF1 (SURVEY §2.9); parity is locked "
        "against analytic oracles (torch conv/deconv + loss math, "
        "scipy/closed-form bilinear kernels, TF crop semantics), exact "
        "s2d-vs-standard forward equality, and committed golden-forward "
        "fingerprints (tests/test_golden_parity.py); "
        "convergence_miou_synthetic is the recorded deterministic "
        "convergence artifact"
    )


SECTION_FNS = {
    "serving_bf16": sec_serving_bf16,
    "serving_int8": sec_serving_int8,
    "train": sec_train,
    "bayesian": sec_bayesian,
    "pipeline": sec_pipeline,
    "fcn": sec_fcn,
    "adversarial": sec_adversarial,
    "mnist": sec_mnist,
    "convergence": sec_convergence,
}


def run_section(name, out_path):
    out = SectionWriter(out_path)
    try:
        SECTION_FNS[name](out)
        return 0
    except Exception as e:  # noqa: BLE001 — recorded, section rc != 0
        out[f"section_{name}_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", choices=sorted(SECTION_FNS))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.section:
        return run_section(
            args.section, args.out or f"/tmp/bench_section_{args.section}.json"
        )
    return orchestrate()


if __name__ == "__main__":
    sys.exit(main())
