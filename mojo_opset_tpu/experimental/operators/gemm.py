"""Experimental GEMM ops.

Parity: reference mojo_opset/experimental/operators/gemm.py
(MojoQuantBatchGemmReduceSum :6 — quantized batch GEMM + reduce-sum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator


class MojoQuantBatchGemmReduceSum(MojoOperator):
    def __init__(self, weight: jax.Array, trans_weight: bool = False):
        super().__init__()
        if not isinstance(trans_weight, bool):
            raise TypeError("trans_weight must be bool.")
        self.trans_weight = trans_weight
        self.weight = weight

    def forward(self, input: jax.Array, x1_scale: jax.Array, x2_scale: jax.Array) -> jax.Array:
        """(B, M, K) int8 x (B, K, N) int8 -> scaled fp -> sum over B ->
        (M, N) bf16."""
        assert input.ndim == 3, "input must be 3D"
        assert self.weight.ndim == 3, "weight must be 3D"
        weight = jnp.swapaxes(self.weight, 1, 2) if self.trans_weight else self.weight
        b, m, k = input.shape
        assert weight.shape[0] == b and weight.shape[1] == k

        out = jnp.einsum(
            "bmk,bkn->bmn", input.astype(jnp.float32), weight.astype(jnp.float32)
        )
        out = out * x2_scale.astype(jnp.float32)[None, None, :]
        out = out * x1_scale.astype(jnp.float32)[:, :, None]
        # reference accumulates per-batch in bf16 (gemm.py:63-66)
        acc = jnp.zeros((m, weight.shape[2]), jnp.bfloat16)
        for i in range(b):
            acc = acc + out[i].astype(jnp.bfloat16)
        return acc
