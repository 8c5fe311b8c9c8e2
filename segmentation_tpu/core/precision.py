"""Mixed-precision policy for TPU.

The reference ran everything in float32 (TF1 default). On TPU the MXU natively
consumes bfloat16, doubling matmul/conv throughput and halving HBM traffic, so
the framework default is: parameters and optimizer state in float32, compute
(activations, conv inputs) in bfloat16, losses and reductions in float32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.dtype(jnp.float32)
    compute_dtype: jnp.dtype = jnp.dtype(jnp.bfloat16)
    output_dtype: jnp.dtype = jnp.dtype(jnp.float32)

    def cast_to_compute(self, tree):
        import jax

        def _c(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.compute_dtype)
            return x

        return jax.tree_util.tree_map(_c, tree)

    def cast_to_param(self, tree):
        import jax

        def _c(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.param_dtype)
            return x

        return jax.tree_util.tree_map(_c, tree)

    def cast_to_output(self, x):
        return x.astype(self.output_dtype)


DEFAULT = Policy()
F32 = Policy(
    param_dtype=jnp.dtype(jnp.float32),
    compute_dtype=jnp.dtype(jnp.float32),
    output_dtype=jnp.dtype(jnp.float32),
)


def policy_from_config(train_cfg) -> Policy:
    return Policy(
        param_dtype=jnp.dtype(train_cfg.param_dtype),
        compute_dtype=jnp.dtype(train_cfg.compute_dtype),
        output_dtype=jnp.dtype(jnp.float32),
    )
