"""Experimental MoE fusions.

Parity: reference mojo_opset/experimental/operators/moe.py
(MojoMoEInitRoutingDynamicQuant :92 — routing sort + smooth-scale +
block-wise dynamic quant in one pass; MojoFusedSwiGLUMoEScaleDynamicQuantize
:152 — SwiGLU + per-route smooth-scale + per-route dynamic quant).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.moe import count_expert_tokens
from mojo_opset_tpu.core.operators.quantize import _repeat_by_counts


def _block_dynamic_quant(input_fp: jax.Array, quant_block_size: int):
    if input_fp.shape[-1] % quant_block_size != 0:
        raise ValueError(
            f"Last dim {input_fp.shape[-1]} must be divisible by quant_block_size {quant_block_size}."
        )
    blocks = input_fp.reshape(*input_fp.shape[:-1], -1, quant_block_size)
    scale = jnp.clip(jnp.max(jnp.abs(blocks), axis=-1), min=1e-12) / 127.0
    q = jnp.clip(jnp.round(blocks / scale[..., None]), -128, 127)
    return q.reshape(input_fp.shape).astype(jnp.int8), scale


class MojoMoEInitRoutingDynamicQuant(MojoOperator):
    """Fused routing sort + optional per-expert smooth scale + block-wise
    dynamic int8 quant. Returns
    (quantized (T, K, H), sorted_gates (T, K, 1), sorted_token_indices
    (T, K, 1) int32, token_count (E,), scale (T, K, H/qbs))."""

    def __init__(
        self,
        num_experts: int,
        top_k: int,
        quant_block_size: int = 8,
        quant_dtype=jnp.int8,
        start_expert_id: int = 0,
        end_expert_id: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if jnp.dtype(quant_dtype) != jnp.int8:
            raise NotImplementedError(f"Unsupported quant_dtype: {quant_dtype}, expected int8.")
        self.num_experts = num_experts
        self.top_k = top_k
        self.quant_block_size = quant_block_size
        self.quant_dtype = jnp.dtype(quant_dtype)
        self.start_expert_id = start_expert_id
        self.end_expert_id = num_experts if end_expert_id is None else end_expert_id

    def forward(
        self,
        hidden_states: jax.Array,  # (T, H)
        top_k_gates: jax.Array,  # (T, K)
        top_k_indices: jax.Array,  # (T, K)
        smooth_scale: Optional[jax.Array] = None,  # (E, H)
        quant_mode: int = 0,
    ):
        if quant_mode not in (0, 1):
            raise NotImplementedError(f"Unsupported quant_mode: {quant_mode}, expected 0 or 1.")
        T, K = top_k_indices.shape
        H = hidden_states.shape[-1]

        flat_hidden = jnp.repeat(hidden_states, K, axis=0)  # (T*K, H)
        flat_gates = top_k_gates.reshape(-1, 1)
        flat_experts = top_k_indices.reshape(-1).astype(jnp.int32)
        flat_token = jnp.repeat(jnp.arange(T, dtype=jnp.int32), K)

        order = jnp.argsort(flat_experts, stable=True)
        sorted_experts = flat_experts[order]
        sorted_hidden = flat_hidden[order].astype(jnp.float32)
        sorted_gates = flat_gates[order].reshape(T, K, 1).astype(jnp.float32)
        sorted_token = flat_token[order].reshape(T, K, 1)

        if smooth_scale is not None:
            if smooth_scale.ndim != 2 or smooth_scale.shape[0] != self.num_experts:
                raise ValueError(
                    "smooth_scale must be (num_experts, hidden_size), got "
                    f"{smooth_scale.shape} with num_experts={self.num_experts}"
                )
            sorted_hidden = sorted_hidden * smooth_scale[sorted_experts].astype(jnp.float32)

        sorted_hidden = sorted_hidden.reshape(T, K, H)
        quantized, scale = _block_dynamic_quant(sorted_hidden, self.quant_block_size)
        token_count = count_expert_tokens(top_k_indices.astype(jnp.int32), self.num_experts)
        return (
            quantized.astype(self.quant_dtype),
            sorted_gates,
            sorted_token.astype(jnp.int32),
            token_count,
            scale,
        )

    def extra_repr(self) -> str:
        return (
            f"num_experts={self.num_experts}, top_k={self.top_k}, "
            f"quant_block_size={self.quant_block_size}"
        )


class MojoFusedSwiGLUMoEScaleDynamicQuantize(MojoOperator):
    """SwiGLU (with beta) + grouped smooth scale + per-route dynamic int8
    quant; input (T, K, 2H) -> (q (T, K, H), scale (T, K))."""

    def __init__(self, quant_dtype=jnp.int8, **kwargs):
        super().__init__(**kwargs)
        if jnp.dtype(quant_dtype) != jnp.int8:
            raise NotImplementedError(f"Unsupported quant_dtype: {quant_dtype}, expected int8.")
        self.quant_dtype = jnp.dtype(quant_dtype)

    def forward(
        self,
        input: jax.Array,  # (T, K, 2H)
        smooth_scale: Optional[jax.Array],  # (E, H) or (H,)
        token_count: jax.Array,  # (E,)
        beta: float = 1.0,
        quant_mode: int = 0,
    ):
        if input.ndim != 3:
            raise ValueError(f"input must be 3D, got {input.shape}")
        if input.shape[-1] % 2 != 0:
            raise ValueError(f"input last dim must be even for SwiGLU, got {input.shape[-1]}")
        if beta == 0:
            raise ValueError("beta must be non-zero.")
        if quant_mode not in (0, 1):
            raise NotImplementedError(f"Unsupported quant_mode: {quant_mode}, expected 0 or 1.")

        T, K, twoH = input.shape
        left, right = jnp.split(input.astype(jnp.float32), 2, axis=-1)
        output = (jax.nn.silu(left * beta) / beta) * right  # (T, K, H)

        if smooth_scale is not None:
            scale_fp = smooth_scale.astype(jnp.float32)
            if scale_fp.ndim == 1:
                output = output * scale_fp[None, None, :]
            else:
                # reference validates the routing counts (_validate_moe_
                # token_count); without this, JAX's clamped gather would
                # silently apply the LAST expert's scales to overflow rows
                counts = np.asarray(token_count)
                if counts.shape[0] != scale_fp.shape[0]:
                    raise ValueError(
                        f"token_count has {counts.shape[0]} entries for "
                        f"{scale_fp.shape[0]} experts"
                    )
                if int(counts.sum()) != T * K:
                    raise ValueError(
                        f"token_count sums to {int(counts.sum())}, expected T*K={T * K}"
                    )
                expanded = _repeat_by_counts(scale_fp, jnp.asarray(token_count), T * K)
                output = output * expanded.reshape(T, K, -1)

        scale = jnp.clip(jnp.max(jnp.abs(output), axis=-1), min=1e-12) / 127.0
        q = jnp.clip(jnp.round(output / scale[..., None]), -128, 127)
        return q.astype(self.quant_dtype), scale
