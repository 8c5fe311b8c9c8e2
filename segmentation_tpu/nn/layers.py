"""Functional layer library — the slim + utils/ops.py replacement.

Every layer is a pure function using the segmentation_tpu.nn.module context
for parameter access. Semantics track the reference's layer stack:

  conv2d / conv2d_transpose  ← slim.convolution2d{,_transpose}
                               (reference models/*.py) and the vendored DCGAN
                               ops (reference utils/ops.py:58-94)
  max_pool                   ← slim.max_pool2d (VALID default)
  batch_norm                 ← slim.batch_norm incl. the UPDATE_OPS moving-
                               average dance (reference models/basemodel.py:
                               340-342) made explicit as returned state
  dropout                    ← slim.dropout; stays live under bayesian mode
                               (reference §2 #16 MC-dropout mechanism)
  dense                      ← slim.fully_connected
  lrelu                      ← reference models/gan.py:388-391 / utils/ops.py:96
  conv_cond_concat           ← reference utils/ops.py:51-56 / models/gan.py:394

TPU notes: convs run through lax.conv_general_dilated in NHWC/HWIO with
activations in the policy compute dtype (bfloat16 by default; the MXU
accumulates bf16 products in float32 in hardware). XLA fuses the
bias/activation chains; no hand scheduling.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from segmentation_tpu.nn import initializers as init
from segmentation_tpu.nn import module as hk

_DN = ("NHWC", "HWIO", "NHWC")


def relu(x):
    return jax.nn.relu(x)


@jax.custom_vjp
def relu_out(x):
    """ReLU whose VJP residual is the OUTPUT instead of the input.

    Standard ``jax.nn.relu`` saves its *pre-activation* for the backward
    mask; saving the *post-activation* instead is gradient-identical —
    ``y > 0`` and ``x > 0`` select the same elements because
    ``y = max(x, 0)`` is 0 exactly when ``x <= 0`` — and in principle
    frees the pre-activation (the residual becomes the next layer's
    input, which is live anyway), halving the relu-residual footprint.

    MEASURED (512²/B=128 v5e train step, benchmarks/profile_train_cats):
    this does NOT change the compiled program's speed — 305.4 ms/step
    before and after, with byte-identical fusion structure (the
    standalone ``broadcast_maximum`` bias+relu passes remain). XLA:TPU's
    decision not to fold the relu into the conv fusion is a backend
    fusion-rule/layout artifact, not a consequence of which tensor
    autodiff saves. Kept because the output-residual form is never
    worse and documents the falsified hypothesis.

    Forward is bit-identical to ``jax.nn.relu``; gradients differ from
    the stock VJP only on the measure-zero set ``x == 0`` (stock relu's
    subgradient there is also 0, so in fact they agree everywhere).
    """
    return jnp.maximum(x, 0)


def _relu_out_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_out_bwd(y, g):
    return (jnp.where(y > 0, g, jnp.zeros_like(g)),)


relu_out.defvjp(_relu_out_fwd, _relu_out_bwd)


def lrelu(x, alpha: float = 0.2):
    """Leaky ReLU (reference models/gan.py:388-391)."""
    return jnp.maximum(alpha * x, x)


def conv2d(
    x: jnp.ndarray,
    features: int,
    kernel: int = 3,
    stride: int = 1,
    padding: str = "SAME",
    *,
    name: str,
    activation: Optional[Callable] = relu,
    use_bias: bool = True,
    w_init=init.default_weight,
    b_init=init.zeros,
) -> jnp.ndarray:
    """slim.convolution2d semantics: conv + bias + activation (ReLU default)."""
    cin = x.shape[-1]
    if 0 in x.shape[1:3] or (
        padding == "VALID"
        and (x.shape[1] < kernel or x.shape[2] < kernel)
    ):
        # An empty/undersized input silently yields an all-zero network
        # downstream (seen with the deconv/stacked encoders below ~128px) —
        # fail loudly with the layer name instead.
        raise ValueError(
            f"conv2d '{name}': spatial input {x.shape[1]}x{x.shape[2]} too "
            f"small for a {kernel}x{kernel} {padding} conv — increase the "
            "crop/input size for this architecture"
        )
    w = hk.param(f"{name}/w", (kernel, kernel, cin, features), w_init)
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DN,
    )
    if use_bias:
        b = hk.param(f"{name}/b", (features,), b_init)
        y = y + b.astype(y.dtype)
    if activation is not None:
        y = activation(y)
    return y.astype(x.dtype)


def conv2d_transpose(
    x: jnp.ndarray,
    features: int,
    kernel: int = 3,
    stride: int = 2,
    padding: str = "VALID",
    *,
    name: str,
    activation: Optional[Callable] = relu,
    use_bias: bool = True,
    w_init=init.default_weight,
    b_init=init.zeros,
) -> jnp.ndarray:
    """slim.convolution2d_transpose semantics.

    Output sizing matches tf.nn.conv2d_transpose: VALID → (n-1)*s + k,
    SAME → n*s (see segmentation_tpu.nn.shapes.deconv_out).
    """
    cin = x.shape[-1]
    w = hk.param(f"{name}/w", (kernel, kernel, cin, features), w_init)
    # transpose_kernel=True + [h, w, out, in] layout reproduces the
    # gradient-of-conv semantics of tf.nn.conv2d_transpose / slim. The
    # transpose below is folded into the weight constant by XLA.
    y = lax.conv_transpose(
        x,
        jnp.swapaxes(w, 2, 3).astype(x.dtype),
        strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DN,
        transpose_kernel=True,
    )
    if use_bias:
        b = hk.param(f"{name}/b", (features,), b_init)
        y = y + b.astype(y.dtype)
    if activation is not None:
        y = activation(y)
    return y.astype(x.dtype)


def fixed_conv2d_transpose(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int,
    padding: str = "SAME",
) -> jnp.ndarray:
    """Transposed conv with a constant (non-learned) kernel — the FCN bilinear
    upsampling heads (reference models/fcn.py:138-142, 153-156, 184-189 use
    tf.constant bilinear kernels)."""
    y = lax.conv_transpose(
        x,
        jnp.swapaxes(jnp.asarray(w), 2, 3).astype(x.dtype),
        strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DN,
        transpose_kernel=True,
    )
    return y.astype(x.dtype)


def dense(
    x: jnp.ndarray,
    features: int,
    *,
    name: str,
    activation: Optional[Callable] = relu,
    use_bias: bool = True,
    w_init=init.default_weight,
    b_init=init.zeros,
) -> jnp.ndarray:
    """slim.fully_connected semantics (ReLU default activation)."""
    w = hk.param(f"{name}/w", (x.shape[-1], features), w_init)
    y = jnp.dot(x, w.astype(x.dtype))
    if use_bias:
        b = hk.param(f"{name}/b", (features,), b_init)
        y = y + b.astype(y.dtype)
    if activation is not None:
        y = activation(y)
    return y.astype(x.dtype)


def max_pool(
    x: jnp.ndarray, window: int = 2, stride: Optional[int] = None,
    padding: str = "VALID"
) -> jnp.ndarray:
    """slim.max_pool2d (defaults: stride=window, VALID)."""
    stride = window if stride is None else stride
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )


def flatten(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1)


def batch_norm(
    x: jnp.ndarray,
    *,
    name: str,
    decay: float = 0.999,
    epsilon: float = 1e-3,
    center: bool = True,
    scale: bool = False,
    cross_replica_axes=None,
) -> jnp.ndarray:
    """slim.batch_norm with explicit running-stats state.

    Training: normalize by batch statistics, update moving averages (the
    reference's UPDATE_OPS control-dependency dance, models/basemodel.py:
    340-342, becomes a returned-state update). Eval: use moving averages.
    Statistics are computed in float32 regardless of compute dtype.

    Under pjit, a jnp.mean over the batch axis of a sharded tensor is already
    a global (cross-replica) reduction — XLA inserts the psum. The
    ``cross_replica_axes`` arg exists for explicit shard_map regions.
    """
    c = x.shape[-1]
    mov_mean = hk.state(f"{name}/moving_mean", (c,), init.zeros)
    mov_var = hk.state(f"{name}/moving_var", (c,), init.ones)

    if hk.is_training():
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        if cross_replica_axes:
            mean = lax.pmean(mean, cross_replica_axes)
            var = lax.pmean(var, cross_replica_axes)
        hk.set_state(
            f"{name}/moving_mean", decay * mov_mean + (1 - decay) * mean
        )
        hk.set_state(
            f"{name}/moving_var", decay * mov_var + (1 - decay) * var
        )
    else:
        mean, var = mov_mean, mov_var

    inv = lax.rsqrt(var + epsilon)
    if scale:
        gamma = hk.param(f"{name}/gamma", (c,), init.ones)
        inv = inv * gamma
    y = (x.astype(jnp.float32) - mean) * inv
    if center:
        beta = hk.param(f"{name}/beta", (c,), init.zeros)
        y = y + beta
    return y.astype(x.dtype)


def dropout(
    x: jnp.ndarray,
    rate: float = 0.5,
    *,
    deterministic: Optional[bool] = None,
) -> jnp.ndarray:
    """slim.dropout. ``deterministic=None`` follows the training flag; pass
    ``deterministic=False`` to keep sampling at inference (the Bayesian
    MC-dropout mechanism, reference §2 #16 / examples/inference.py:31-38)."""
    if deterministic is None:
        deterministic = not hk.is_training()
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(hk.next_rng_key(), keep, x.shape)
    # Under explicit-sharding jit the mask traces replicated while x is
    # sharded, and jnp.where rejects the mix; replicated→sharded is a local
    # slice (no comms). Auto meshes trace with an all-None spec → no-op.
    try:
        x_spec, m_spec = x.aval.sharding.spec, mask.aval.sharding.spec
    except AttributeError:  # plain numpy input outside jit
        x_spec = m_spec = None
    if x_spec != m_spec and x_spec is not None and any(
        s is not None for s in x_spec
    ):
        mask = jax.sharding.reshard(mask, x.aval.sharding)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


def bilinear_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """tf.image.resize_bilinear equivalent (reference models/basemodel.py:227,
    models/deconvolution.py:163)."""
    out = jax.image.resize(
        x.astype(jnp.float32),
        (x.shape[0], h, w, x.shape[3]),
        method="bilinear",
    )
    return out.astype(x.dtype)


def conv_cond_concat(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Concat a [N,1,1,D] condition tensor onto every spatial position
    (reference utils/ops.py:51-56, models/gan.py:394-403)."""
    n, h, w, _ = x.shape
    y_tiled = jnp.broadcast_to(y, (n, h, w, y.shape[-1])).astype(x.dtype)
    return jnp.concatenate([x, y_tiled], axis=-1)
