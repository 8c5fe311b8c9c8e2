"""Self-contained MLP GAN — the framework-free sanity script.

Rebuild of reference scripts/gan_script.py (a standalone MLP GAN with the
same loss/variable-partition recipe as the main GAN class, kept as a
minimal, single-file reference implementation). Pure JAX + optax; trains a
2-layer MLP generator/discriminator on MNIST (or the offline digits
fallback) and writes a grid of samples.

  python scripts/gan_script.py --steps 2000
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mnist-dir", default="./data/mnist")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--zed-dim", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--out", default="./debug/gan_samples.png")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from segmentation_tpu.data import MNISTDataSet
    from segmentation_tpu.training.losses import gan_losses

    ds = MNISTDataSet(args.mnist_dir, args.batch_size)
    D = 28 * 28

    def init_mlp(key, sizes):
        params = []
        for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
            key, k = jax.random.split(key)
            params.append(
                (jax.random.normal(k, (a, b)) * jnp.sqrt(2.0 / a),
                 jnp.zeros((b,)))
            )
        return params

    def mlp(params, x, final_act=None):
        for i, (w, b) in enumerate(params):
            x = x @ w + b
            if i < len(params) - 1:
                x = jax.nn.leaky_relu(x, 0.2)
        return final_act(x) if final_act else x

    key = jax.random.PRNGKey(0)
    kg, kd, key = jax.random.split(key, 3)
    # the gen_/dis_ variable partition of the reference becomes two pytrees
    g_params = init_mlp(kg, [args.zed_dim, args.hidden, args.hidden, D])
    d_params = init_mlp(kd, [D, args.hidden, args.hidden, 1])
    g_opt = optax.adam(args.lr, b1=0.5)
    d_opt = optax.adam(args.lr, b1=0.5)
    g_state, d_state = g_opt.init(g_params), d_opt.init(d_params)

    @jax.jit
    def step(g_params, d_params, g_state, d_state, x, key):
        kz1, kz2 = jax.random.split(key)
        z = jax.random.uniform(kz1, (x.shape[0], args.zed_dim), minval=-1,
                               maxval=1)

        def d_loss(dp):
            fake = jax.lax.stop_gradient(mlp(g_params, z, jnp.tanh))
            lr_, lf_, _ = gan_losses(mlp(dp, x), mlp(dp, fake))
            return lr_ + lf_

        def g_loss(gp):
            z2 = jax.random.uniform(kz2, (x.shape[0], args.zed_dim),
                                    minval=-1, maxval=1)
            fake = mlp(gp, z2, jnp.tanh)
            _, _, g = gan_losses(jnp.zeros((1, 1)), mlp(d_params, fake))
            return g

        dl, gd = jax.value_and_grad(d_loss)(d_params)
        du, d_state = d_opt.update(gd, d_state, d_params)
        d_params = optax.apply_updates(d_params, du)
        gl, gg = jax.value_and_grad(g_loss)(g_params)
        gu, g_state = g_opt.update(gg, g_state, g_params)
        g_params = optax.apply_updates(g_params, gu)
        return g_params, d_params, g_state, d_state, dl, gl

    t0 = time.time()
    for i in range(args.steps):
        x, _ = ds.next_batch()
        x = jnp.asarray(x.reshape(-1, D) * 2.0 - 1.0)
        key, k = jax.random.split(key)
        g_params, d_params, g_state, d_state, dl, gl = step(
            g_params, d_params, g_state, d_state, x, k
        )
        if i % 200 == 0:
            print(f"step {i}: D={float(dl):.3f} G={float(gl):.3f}")
    print(f"{args.steps} steps in {time.time() - t0:.1f}s")

    # sample grid
    z = jax.random.uniform(jax.random.PRNGKey(7), (64, args.zed_dim),
                           minval=-1, maxval=1)
    imgs = np.asarray(mlp(g_params, z, jnp.tanh)).reshape(64, 28, 28)
    imgs = ((imgs + 1) * 127.5).astype(np.uint8)
    grid = imgs.reshape(8, 8, 28, 28).transpose(0, 2, 1, 3).reshape(224, 224)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    try:
        import cv2

        cv2.imwrite(args.out, grid)
        print(f"wrote {args.out}")
    except ImportError:
        np.save(args.out + ".npy", grid)


if __name__ == "__main__":
    main()
