"""Parameter initialization helpers.

Initializers run on the host (numpy) instead of eager jax.random: model
construction would otherwise trigger one XLA compile per weight shape.
Determinism is preserved by seeding numpy from the JAX PRNG key data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _rng_from_key(key) -> np.random.Generator:
    data = np.asarray(jax.random.key_data(key)).astype(np.uint32).ravel()
    return np.random.default_rng([int(x) for x in data])


def uniform(key, shape, dtype, minval: float, maxval: float) -> jax.Array:
    rng = _rng_from_key(key)
    return jnp.asarray(rng.uniform(minval, maxval, shape), dtype=dtype)


def normal(key, shape, dtype, stddev: float = 1.0) -> jax.Array:
    rng = _rng_from_key(key)
    return jnp.asarray(rng.normal(0.0, stddev, shape), dtype=dtype)
