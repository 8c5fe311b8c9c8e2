"""Minimal functional module system.

The reference leaned on ``tf.contrib.slim`` + variable_scope reuse for weight
sharing (reference models/basemodel.py:397 rebuilds the net with reuse=True for
the test branch). In JAX, weight sharing is just calling the same pure function
with the same params — no reuse machinery needed. What we do need is *shape
inference at init time* (the reference relied on TF graph shapes, e.g.
models/autoencoder.py:269-272 storing conv_shape/pre_zed_dim), so this module
provides a tiny transform: write the model as a plain function using
``param(...)`` / ``state(...)`` getters; ``transform`` turns it into

    init(rng, *args)            -> (params, state)
    apply(params, state, rng, *args, train=...) -> (out, new_state)

Params and state are nested dicts keyed by '/'-joined scope paths; leaves are
jnp arrays. Everything is a pytree → works directly under jit/pjit/grad.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

_local = threading.local()


class _Frame:
    def __init__(self, params, state, rng, train, initializing):
        self.params: Dict[str, Any] = params
        self.state: Dict[str, Any] = state
        self.rng = rng
        self.train = train
        self.initializing = initializing
        self.scope_stack = []
        self.used_names = set()

    def full_name(self, name: str) -> str:
        return "/".join(self.scope_stack + [name])


def _frame() -> _Frame:
    fr = getattr(_local, "frame", None)
    if fr is None:
        raise RuntimeError(
            "param()/state() used outside of transform().init/apply"
        )
    return fr


@contextlib.contextmanager
def scope(name: str):
    fr = _frame()
    fr.scope_stack.append(name)
    try:
        yield
    finally:
        fr.scope_stack.pop()


def next_rng_key() -> jax.Array:
    fr = _frame()
    if fr.rng is None:
        raise RuntimeError("no rng available; pass rng to init/apply")
    fr.rng, sub = jax.random.split(fr.rng)
    return sub


def is_initializing() -> bool:
    return _frame().initializing


def is_training() -> bool:
    return _frame().train


def param(
    name: str,
    shape: Tuple[int, ...],
    init: Callable[[jax.Array, Tuple[int, ...], Any], jax.Array],
    dtype=jnp.float32,
) -> jax.Array:
    fr = _frame()
    full = fr.full_name(name)
    if fr.initializing:
        if full not in fr.params:
            fr.params[full] = init(next_rng_key(), shape, dtype)
    p = fr.params[full]
    if tuple(p.shape) != tuple(shape):
        raise ValueError(f"param {full}: have {p.shape}, want {shape}")
    return p


def state(
    name: str,
    shape: Tuple[int, ...],
    init: Callable[..., jax.Array],
    dtype=jnp.float32,
) -> jax.Array:
    fr = _frame()
    full = fr.full_name(name)
    if fr.initializing and full not in fr.state:
        fr.state[full] = init(None, shape, dtype)
    return fr.state[full]


def set_state(name: str, value: jax.Array):
    fr = _frame()
    fr.state[fr.full_name(name)] = value


class Transformed(NamedTuple):
    init: Callable
    apply: Callable


def transform(fn: Callable) -> Transformed:
    """Lift ``fn(*args, **kwargs)`` using param()/state() into pure fns."""

    def init(rng, *args, train: bool = True, **kwargs):
        prev = getattr(_local, "frame", None)
        fr = _Frame({}, {}, rng, train, initializing=True)
        _local.frame = fr
        try:
            fn(*args, **kwargs)
        finally:
            _local.frame = prev
        return fr.params, fr.state

    def apply(params, st, rng, *args, train: bool = False, **kwargs):
        prev = getattr(_local, "frame", None)
        fr = _Frame(dict(params), dict(st), rng, train, initializing=False)
        _local.frame = fr
        try:
            out = fn(*args, **kwargs)
        finally:
            _local.frame = prev
        return out, fr.state

    return Transformed(init=init, apply=apply)


def split_params(params: Dict[str, Any], prefix: str):
    """Partition a flat params dict by scope-path prefix — the explicit
    replacement for the reference's name-substring variable partition
    ('dis_'/'gen_', reference models/gan.py:200-208)."""
    inside = {k: v for k, v in params.items() if k.startswith(prefix)}
    outside = {k: v for k, v in params.items() if not k.startswith(prefix)}
    return inside, outside


def param_labels(params: Dict[str, Any], rules, default: str):
    """Label each param by the first matching prefix rule — feeds
    optax.multi_transform for per-subnet optimizers."""
    out = {}
    for k in params:
        out[k] = default
        for prefix, label in rules:
            if k.startswith(prefix):
                out[k] = label
                break
    return out
