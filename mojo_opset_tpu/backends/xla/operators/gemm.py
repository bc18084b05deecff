"""XLA-tier GEMM implementations."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operators.gemm import MojoGroupGemm


class XlaGroupGemm(MojoGroupGemm):
    """Jittable ragged grouped GEMM on the MXU via ``jax.lax.ragged_dot``
    (the TPU-native replacement for the reference's per-group loop,
    reference core/operators/gemm.py:116-118)."""

    def forward(self, input: jax.Array, group_list: jax.Array) -> jax.Array:
        weight = self._canonical_weight()
        group_sizes = jnp.asarray(group_list, dtype=jnp.int32)
        out = jax.lax.ragged_dot(
            input,
            weight,
            group_sizes=group_sizes,
            preferred_element_type=jnp.float32,
        )
        return out.astype(input.dtype)
