"""Training RoPE function.

Parity: reference mojo_opset/core/functions/position_embedding.py:6
(MojoApplyRoPEFunction, fwd+bwd pair).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.function import MojoFunction
from mojo_opset_tpu.core.operators.position_embedding import rotate_half


class MojoApplyRoPEFunction(MojoFunction):
    def forward(
        self,
        q: jax.Array,
        k: jax.Array,
        cos: jax.Array,
        sin: jax.Array,
        head_first: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        # cos/sin are positional tables, non-trainable by contract: the
        # reference backward returns None for them on every tier
        # (reference core/functions/position_embedding.py:63-80 and
        # backends/ttx/functions/position_embedding.py:27-36).  stop_gradient
        # here keeps the golden's autodiff consistent with the Pallas tier's
        # hand-written backward, which also zeroes these cotangents.
        cos = jax.lax.stop_gradient(cos)
        sin = jax.lax.stop_gradient(sin)
        if head_first:
            cos = jnp.expand_dims(cos, -3)
            sin = jnp.expand_dims(sin, -3)
        else:
            cos = jnp.expand_dims(cos, -2)
            sin = jnp.expand_dims(sin, -2)
        q_rot = (q * cos + rotate_half(q) * sin).astype(q.dtype)
        k_rot = (k * cos + rotate_half(k) * sin).astype(k.dtype)
        return q_rot, k_rot
