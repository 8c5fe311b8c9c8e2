"""Weight initializers.

Matches the reference's two conventions:
  - slim defaults (xavier/glorot for conv+fc weights, zeros for biases) —
    what every segmentation model actually used (reference models use
    slim.convolution2d with default initializers).
  - DCGAN truncated-normal sigma=0.02 (reference utils/ops.py:62-63, and GAN
    arg_scopes at models/gan.py:290,343) for GAN generator/discriminator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def constant(value):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


def _fans(shape):
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:
        return shape[0], shape[1]
    # conv kernels HWIO
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    return shape[-2] * receptive, shape[-1] * receptive


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def xavier_normal(key, shape, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    std = jnp.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def truncated_normal(stddev=0.02, mean=0.0):
    def init(key, shape, dtype=jnp.float32):
        # TF truncated_normal: resample beyond 2 sigma → use jax's
        # truncated_normal on [-2, 2] scaled.
        return mean + stddev * jax.random.truncated_normal(
            key, -2.0, 2.0, shape, dtype
        )

    return init


def normal(stddev=0.02, mean=0.0):
    def init(key, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.normal(key, shape, dtype)

    return init


# The slim default for conv/fc weights.
default_weight = xavier_uniform
# The DCGAN convention (reference utils/ops.py:62-63).
dcgan_weight = truncated_normal(0.02)
dcgan_dense_weight = normal(0.02)
