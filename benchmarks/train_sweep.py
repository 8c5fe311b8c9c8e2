"""Train-step throughput sweep for the s2d U-Net (select-VJP pool path).

Times the full jitted train step (fwd+bwd+Adam) at 512² over a batch
sweep — the VERDICT round-2 target is ≥450 img/s @ B=128 and a B=192
config that compiles (the round-2 blocker was 4× lane padding of
C=32-minor backward buffers; the select-VJP pool keeps backward
activations in the packed 4C layout).

Usage: python benchmarks/train_sweep.py [iters] [b1 b2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(iters=20, batches=(128, 160, 192)):
    import jax
    import jax.numpy as jnp
    import optax

    from segmentation_tpu.core.config import ModelConfig
    from segmentation_tpu.models.unet_fast import UNetS2D
    from segmentation_tpu.nn import module as hk
    from segmentation_tpu.nn.shapes import center_crop_or_pad
    from segmentation_tpu.training import losses as L

    print(f"[{time.strftime('%H:%M:%S')}] init {jax.devices()[0]}",
          flush=True)
    mcfg = ModelConfig(input_dims=(512, 512), n_kernels=32, n_classes=2)
    model = UNetS2D(mcfg)
    fwd = hk.transform(lambda x: model(x))
    params, st = fwd.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 192, 192, 3), jnp.bfloat16),
        train=True,
    )
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    def make_step(remat):
        apply_train = lambda p, s_, x: fwd.apply(  # noqa: E731
            p, s_, jax.random.PRNGKey(0), x, train=True
        )
        if remat:
            apply_train = jax.checkpoint(apply_train)

        @jax.jit
        def step(p, s, os_, x, y):
            def loss_fn(p):
                logits, ns = apply_train(p, s, x)
                yy = center_crop_or_pad(
                    y, logits.shape[1], logits.shape[2]
                )
                return L.segmentation_xentropy(logits, yy, 2), ns

            (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            u, os_ = opt.update(g, os_, p)
            return optax.apply_updates(p, u), ns, os_, l

        return step

    step_plain = make_step(False)
    step_remat = None

    def make_accum_step(k):
        """ONE optimizer step whose batch is consumed as k microbatches
        (grad accumulation) — the production config for batches past the
        per-chip memory wall (B>=160 at 512² fails to compile even with
        remat; 2x96 compiles and trains)."""

        @jax.jit
        def step(p, s, os_, x, y):
            xb = x.reshape(k, x.shape[0] // k, *x.shape[1:])
            yb = y.reshape(k, y.shape[0] // k, *y.shape[1:])

            def body(s_, xs):
                xi, yi = xs

                def loss_fn(p):
                    logits, ns = fwd.apply(
                        p, s_, jax.random.PRNGKey(0), xi, train=True
                    )
                    yy = center_crop_or_pad(
                        yi, logits.shape[1], logits.shape[2]
                    )
                    return L.segmentation_xentropy(logits, yy, 2), ns

                (l, ns), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(p)
                return ns, (g, l)

            s_out, (gs, ls) = jax.lax.scan(body, s, (xb, yb))
            g = jax.tree_util.tree_map(lambda v: v.mean(0), gs)
            u, os_ = opt.update(g, os_, p)
            return optax.apply_updates(p, u), s_out, os_, ls[-1]

        return step

    def make_scan_step(inner, k=8):
        """k train steps per dispatch (lax.scan) — isolates tunnel
        dispatch overhead: if wall/k << the single-step wall, the
        single-step number is dispatch-bound, not compute-bound. This
        is also the CLI's production --steps-per-dispatch mode."""

        @jax.jit
        def stepk(p, s, os_, x, y):
            def body(carry, _):
                p, s, os_ = carry
                p, s, os_, l = inner(p, s, os_, x, y)
                return (p, s, os_), l

            (p, s, os_), ls = jax.lax.scan(
                body, (p, s, os_), None, length=k
            )
            return p, s, os_, ls[-1]

        return stepk

    for spec in batches:
        spec = str(spec)
        remat = spec.startswith("r")
        scan = spec.startswith("s")
        accum = spec.startswith("a")
        batch = int(spec[1:]) if (remat or scan or accum) else int(spec)
        if remat and step_remat is None:
            step_remat = make_step(True)
        step = step_remat if remat else step_plain
        spd = 8 if scan else 1
        if scan:
            step = make_scan_step(step_plain, spd)
        if accum:
            step = make_accum_step(2)
        try:
            x = jax.jit(
                lambda k: jax.random.uniform(
                    k, (batch, 512, 512, 3), jnp.bfloat16
                )
            )(jax.random.PRNGKey(2))
            y = jax.jit(
                lambda k: jax.random.bernoulli(
                    k, 0.5, (batch, 512, 512, 1)
                ).astype(jnp.uint8)
            )(jax.random.PRNGKey(3))
            x.block_until_ready()
            print(f"B={batch}{' remat' if remat else ''} compiling...",
                  flush=True)
            p2, s2, o2, l = step(params, st, opt_state, x, y)
            float(l)
            p2, s2, o2, l = step(p2, s2, o2, x, y)  # post-reshard steady
            float(l)
            t0 = time.perf_counter()
            for _ in range(max(1, iters // spd)):
                p2, s2, o2, l = step(p2, s2, o2, x, y)
            float(l)
            dt = (time.perf_counter() - t0) / (max(1, iters // spd) * spd)
            tag = ("r" if remat else
                   "s" if scan else "a" if accum else " ")
            print(
                f"B={batch:4d}{tag} "
                f"{dt * 1e3:7.2f} ms/step  {batch / dt:7.1f} img/s",
                flush=True,
            )
            del p2, s2, o2, x, y
        except Exception as e:  # noqa: BLE001
            print(f"B={batch} FAILED: {str(e)[:300]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    it = int(a[0]) if a else 20
    bs = tuple(a[1:]) or (128, "a192")  # r=remat s=scan a=grad-accum-2
    main(it, bs)
