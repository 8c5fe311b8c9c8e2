"""PRNG key threading.

Replaces the reference's global-seed determinism devices: the paired queue
seed (reference utils/datasets.py:108,134-143) and ad-hoc np.random calls
(reference models/gan.py:125). Everything stochastic in this framework —
shuffling, crops, dropout, VAE sampling, GAN z draws — flows from explicit
``jax.random`` keys, so a fixed root seed gives bitwise-reproducible runs
(the determinism-test contract of SURVEY §5 'race detection').
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp


class RngStream:
    """A stateful convenience wrapper over jax.random key splitting for
    host-side (non-jit) code. Inside jit, thread keys explicitly."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def next_n(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs

    def fold_in(self, data: int) -> "RngStream":
        return RngStream(jax.random.fold_in(self._key, data))

    def __iter__(self) -> Iterator[jax.Array]:
        while True:
            yield self.next()


def step_key(root: jax.Array, step) -> jax.Array:
    """Deterministic per-step key (usable inside jit: step may be traced)."""
    return jax.random.fold_in(root, jnp.asarray(step, jnp.uint32))
