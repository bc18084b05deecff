"""Parameter initialization helpers.

Initializers run on the host (numpy) instead of eager jax.random: model
construction would otherwise trigger one XLA compile per weight shape.
Determinism is preserved by seeding numpy from the JAX PRNG key data.

For LARGE models on a remote/tunneled device, host init is unusable (the
weights would cross the host->device link). ``build_on_device`` builds
the whole module inside ONE jitted program, switching these helpers to
traced ``jax.random`` so every weight is generated in device HBM.
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp
import numpy as np

_tls = threading.local()


def _device_init_active() -> bool:
    return getattr(_tls, "device_init", False)


def _skip_init_active() -> bool:
    return getattr(_tls, "skip_init", False)


@contextlib.contextmanager
def device_init_scope():
    prev = getattr(_tls, "device_init", False)
    _tls.device_init = True
    try:
        yield
    finally:
        _tls.device_init = prev


@contextlib.contextmanager
def skip_init_scope():
    """All initializers return zeros: for constructing a module twin whose
    every parameter is immediately overwritten (post-training quantizers),
    skipping the RNG work and the transient random weights entirely."""
    prev = getattr(_tls, "skip_init", False)
    _tls.skip_init = True
    try:
        yield
    finally:
        _tls.skip_init = prev


def build_on_device(ctor, *args, **kwargs):
    """Construct ``ctor(*args, **kwargs)`` (a pytree Module) inside one
    jitted program: all weights are generated on-device — no per-weight
    host RNG, no host->device weight transfer."""

    def make():
        with device_init_scope():
            return ctor(*args, **kwargs)

    return jax.jit(make)()


def _rng_from_key(key) -> np.random.Generator:
    data = np.asarray(jax.random.key_data(key)).astype(np.uint32).ravel()
    return np.random.default_rng([int(x) for x in data])


def uniform(key, shape, dtype, minval: float, maxval: float) -> jax.Array:
    if _skip_init_active():
        return jnp.zeros(shape, dtype)
    if _device_init_active():
        return jax.random.uniform(key, shape, jnp.float32, minval, maxval).astype(dtype)
    rng = _rng_from_key(key)
    return jnp.asarray(rng.uniform(minval, maxval, shape), dtype=dtype)


def normal(key, shape, dtype, stddev: float = 1.0) -> jax.Array:
    if _skip_init_active():
        return jnp.zeros(shape, dtype)
    if _device_init_active():
        return (jax.random.normal(key, shape, jnp.float32) * stddev).astype(dtype)
    rng = _rng_from_key(key)
    return jnp.asarray(rng.normal(0.0, stddev, shape), dtype=dtype)
