"""Misc math helpers (reference mojo_opset/core/operators/misc.py)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def hadamard(n: int, dtype=jnp.float32):
    """Walsh-Hadamard matrix of size n (power of two), Sylvester construction."""
    assert n > 0 and (n & (n - 1)) == 0, "hadamard size must be a power of 2"
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return jnp.asarray(h, dtype=dtype)
