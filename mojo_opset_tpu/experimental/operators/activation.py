"""Experimental activations.

Parity: reference mojo_opset/experimental/operators/activation.py:9
(MojoRotateActivation — normalized Walsh-Hadamard rotation).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.misc import hadamard


class MojoRotateActivation(MojoOperator):
    def forward(self, x: jax.Array) -> jax.Array:
        """Apply a normalized Hadamard transform over the last dim
        (zero-padded to the next power of two, scaled by dim**-0.5)."""
        x_shape = x.shape
        dim = x.shape[-1]
        x2 = x.reshape(-1, dim)
        dim_padded = 2 ** math.ceil(math.log2(dim))
        if dim != dim_padded:
            x2 = jnp.pad(x2, ((0, 0), (0, dim_padded - dim)))
        h = hadamard(dim_padded, dtype=jnp.float32)
        out = jnp.matmul(x2.astype(jnp.float32), h.T, preferred_element_type=jnp.float32)
        out = out * (dim**-0.5)
        return out[..., :dim].reshape(x_shape).astype(x.dtype)
