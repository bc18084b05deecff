"""Fused gated attention output for dual-path (full + SWA) attention.

Parity: reference mojo_opset/experimental/operators/attention_gate.py
(MojoFusedAttnOutputGate :7): two per-path gate weights kept separate for
checkpoint compatibility, concatenated into a single GEMM + sigmoid +
broadcast-multiply.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.utils import init as winit


class MojoFusedAttnOutputGate(MojoOperator):
    def __init__(
        self,
        hidden_size: int,
        num_heads_full: int,
        num_heads_swa: int,
        head_dim: int,
        bias: bool = False,
        key=None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        assert num_heads_full > 0 and num_heads_swa > 0
        self.hidden_size = hidden_size
        self.num_heads_full = num_heads_full
        self.num_heads_swa = num_heads_swa
        self.num_heads_total = num_heads_full + num_heads_swa
        self.head_dim = head_dim
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        dtype = self.param_dtype or jnp.float32
        bound = 1.0 / (hidden_size**0.5)
        self.full_gate_weight = winit.uniform(k1, (num_heads_full, hidden_size), dtype, -bound, bound)
        self.swa_gate_weight = winit.uniform(k2, (num_heads_swa, hidden_size), dtype, -bound, bound)
        self.full_gate_bias = winit.uniform(k3, (num_heads_full,), dtype, -bound, bound) if bias else None
        self.swa_gate_bias = winit.uniform(k4, (num_heads_swa,), dtype, -bound, bound) if bias else None

    def forward(
        self,
        hidden_states: jax.Array,  # (T, hidden)
        full_attn_output: jax.Array,  # (T, N_full, D) or (T, N_full*D)
        swa_attn_output: jax.Array,  # (T, N_swa, D) or (T, N_swa*D)
    ) -> jax.Array:
        T = hidden_states.shape[0]
        full = full_attn_output.reshape(T, self.num_heads_full, self.head_dim)
        swa = swa_attn_output.reshape(T, self.num_heads_swa, self.head_dim)

        weight = jnp.concatenate([self.full_gate_weight, self.swa_gate_weight], axis=0)
        gate = jnp.matmul(
            hidden_states.astype(jnp.float32), weight.T.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if self.full_gate_bias is not None:
            gate = gate + jnp.concatenate(
                [self.full_gate_bias, self.swa_gate_bias]
            ).astype(jnp.float32)
        gate = jax.nn.sigmoid(gate)

        attn_cat = jnp.concatenate([full, swa], axis=1).astype(jnp.float32)
        gated = attn_cat * gate[..., None]
        return gated.reshape(T, self.num_heads_total * self.head_dim).astype(hidden_states.dtype)

    def extra_repr(self) -> str:
        return (
            f"hidden_size={self.hidden_size}, num_heads_full={self.num_heads_full}, "
            f"num_heads_swa={self.num_heads_swa}, head_dim={self.head_dim}, "
            f"bias={self.full_gate_bias is not None}"
        )
