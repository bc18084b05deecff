"""Quantization ops.

Parity: reference mojo_opset/core/operators/quantize.py:9-360
(MojoStaticQuant :9, MojoDequant :77, MojoDynamicQuant :120,
MojoMoEDynamicQuant :178, MojoDequantSwiGLUQuant :250).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator

_FP8_E4M3_MAX = 448.0


def _quant_range(quant_dtype):
    quant_dtype = jnp.dtype(quant_dtype)
    if quant_dtype == jnp.int8:
        return -128.0, 127.0
    if quant_dtype == jnp.dtype("float8_e4m3fn"):
        return -_FP8_E4M3_MAX, _FP8_E4M3_MAX
    raise NotImplementedError(f"Unsupported quant_dtype: {quant_dtype}")


def _repeat_by_counts(values: jax.Array, counts: jax.Array, total: int) -> jax.Array:
    """Row-wise repeat_interleave with a static total row count.

    Expands ``values[g]`` ``counts[g]`` times along axis 0 — jittable
    (fixed output size ``total``): builds the group id of each output row
    via a cumulative-count comparison.
    """
    ends = jnp.cumsum(counts)
    row_ids = jnp.arange(total)
    group_of_row = jnp.sum(row_ids[:, None] >= ends[None, :], axis=-1)
    return values[group_of_row]


class MojoStaticQuant(MojoOperator):
    """Quantize with a static scale parameter; returns ``(q, scale)``."""

    def __init__(self, input_size: Union[int, Tuple[int, ...]], quant_dtype=jnp.int8, **kwargs):
        super().__init__(**kwargs)
        self.input_size = (input_size,) if isinstance(input_size, int) else tuple(input_size)
        self.scale = jnp.ones(self.input_size, self.param_dtype or jnp.float32)
        self.quant_dtype = jnp.dtype(quant_dtype)
        self.q_min, self.q_max = _quant_range(quant_dtype)

    def forward(self, input: jax.Array):
        if tuple(input.shape[-len(self.input_size):]) != self.input_size:
            raise ValueError(
                f"input trailing dims {tuple(input.shape[-len(self.input_size):])} must "
                f"match scale shape {self.input_size}."
            )
        input_fp = input.astype(jnp.float32)
        output = jnp.clip(jnp.round(input_fp / self.scale.astype(jnp.float32)), self.q_min, self.q_max)
        return output.astype(self.quant_dtype), self.scale

    def extra_repr(self) -> str:
        return f"input_size={self.input_size}, quant_dtype={self.quant_dtype}"


class MojoDequant(MojoOperator):
    def __init__(self, output_dtype=jnp.bfloat16, **kwargs):
        super().__init__(**kwargs)
        output_dtype = jnp.dtype(output_dtype)
        if output_dtype not in (jnp.dtype(jnp.float16), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32)):
            raise NotImplementedError(f"Unsupported output_dtype: {output_dtype}")
        self.output_dtype = output_dtype

    def forward(self, input: jax.Array, scale: jax.Array) -> jax.Array:
        return (input.astype(jnp.float32) * scale.astype(jnp.float32)).astype(self.output_dtype)

    def extra_repr(self) -> str:
        return f"output_dtype={self.output_dtype}"


class MojoDynamicQuant(MojoOperator):
    """Per-token symmetric dynamic int8 quant with optional SmoothQuant
    ``inv_smooth_scale``; returns ``(q_int8, scale)``."""

    def __init__(self, input_size: Optional[int] = None, quant_dtype=jnp.int8, **kwargs):
        super().__init__(**kwargs)
        self.input_size = input_size
        self.inv_smooth_scale = (
            None if input_size is None else jnp.ones((input_size,), jnp.float32)
        )
        self.quant_dtype = jnp.dtype(quant_dtype)
        if self.quant_dtype != jnp.int8:
            raise NotImplementedError(f"Unsupported quant_dtype: {quant_dtype}, expected int8.")
        self.q_min, self.q_max = -128.0, 127.0

    def forward(self, input: jax.Array):
        input_fp = input.astype(jnp.float32)
        if self.inv_smooth_scale is not None:
            input_fp = input_fp * self.inv_smooth_scale
        scale = jnp.clip(jnp.max(jnp.abs(input_fp), axis=-1, keepdims=True), min=1e-12) / self.q_max
        scale = jnp.where(scale < 1e-6, 1.0, scale)
        output = jnp.clip(jnp.round(input_fp / scale), self.q_min, self.q_max)
        return output.astype(self.quant_dtype), scale

    def extra_repr(self) -> str:
        return f"input_size={self.input_size}, quant_dtype={self.quant_dtype}"


class MojoMoEDynamicQuant(MojoOperator):
    """Per-token dynamic int8 quant with per-expert-grouped smooth scales
    ``(expert_num, input_size)``; rows are grouped by ``token_count``."""

    def __init__(self, expert_num: int, input_size: int, quant_dtype=jnp.int8, **kwargs):
        super().__init__(**kwargs)
        self.expert_num = expert_num
        self.input_size = input_size
        self.inv_smooth_scale = jnp.ones((expert_num, input_size), jnp.float32)
        self.quant_dtype = jnp.dtype(quant_dtype)
        if self.quant_dtype != jnp.int8:
            raise NotImplementedError(f"Unsupported quant_dtype: {quant_dtype}, expected int8.")
        self.q_min, self.q_max = -128.0, 127.0

    def forward(self, input: jax.Array, token_count: jax.Array):
        if input.ndim < 2:
            raise ValueError(f"input must have at least 2 dims for MoE dynamic quant, got {input.ndim}.")
        rows = input.reshape(-1, input.shape[-1])
        input_fp = rows.astype(jnp.float32)
        expanded_scale = _repeat_by_counts(
            self.inv_smooth_scale.astype(jnp.float32), jnp.asarray(token_count), rows.shape[0]
        )
        input_fp = input_fp * expanded_scale
        scale = jnp.clip(jnp.max(jnp.abs(input_fp), axis=-1, keepdims=True), min=1e-12) / self.q_max
        scale = jnp.where(scale < 1e-6, 1.0, scale)
        output = jnp.clip(jnp.round(input_fp / scale), self.q_min, self.q_max)
        output = output.astype(self.quant_dtype).reshape(input.shape)
        scale = scale.reshape(input.shape[:-1] + (1,))
        return output, scale

    def extra_repr(self) -> str:
        return f"expert_num={self.expert_num}, input_size={self.input_size}, quant_dtype={self.quant_dtype}"


class MojoDequantSwiGLUQuant(MojoOperator):
    """Fused dequant -> SwiGLU -> requant (the W8A8 MoE inner activation).

    Input ``(tokens, 2H)`` is dequantized with per-expert ``weight_scale``
    (and optional runtime ``activation_scale``), split, activated, scaled
    by per-expert ``quant_scale`` and re-quantized per-token.
    Returns ``(q_int8 (tokens, H), scale (tokens, 1))``.
    Reference quantize.py:250-360.
    """

    def __init__(
        self,
        expert_num: int,
        hidden_size: int,
        quant_dtype=jnp.int8,
        activate_left: bool = False,
        quant_mode: int = 1,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.expert_num = expert_num
        self.hidden_size = hidden_size
        dtype = self.param_dtype or jnp.float32
        self.weight_scale = jnp.ones((expert_num, hidden_size * 2), dtype)
        self.quant_scale = jnp.ones((expert_num, hidden_size), dtype)
        self.quant_dtype = jnp.dtype(quant_dtype)
        self.activate_left = activate_left
        self.quant_mode = quant_mode
        if self.quant_dtype != jnp.int8:
            raise NotImplementedError(f"Unsupported quant_dtype: {quant_dtype}, expected int8.")
        if quant_mode != 1:
            raise NotImplementedError("Only dynamic quant_mode=1 is currently supported.")
        self.q_min, self.q_max = -128.0, 127.0

    def forward(
        self,
        x: jax.Array,
        activation_scale: Optional[jax.Array] = None,
        bias: Optional[jax.Array] = None,
        quant_offset: Optional[jax.Array] = None,
        token_count: Optional[jax.Array] = None,
    ):
        if x.ndim != 2:
            raise ValueError(f"x must be 2D (tokens, 2H), got {tuple(x.shape)}")
        if x.shape[-1] % 2 != 0:
            raise ValueError(f"x last dim must be even for SwiGLU split, got {x.shape[-1]}")
        if quant_offset is not None:
            raise NotImplementedError("quant_offset is not supported.")

        tokens = x.shape[0]
        x_fp = x.astype(jnp.float32)

        weight_scale = self.weight_scale.astype(jnp.float32)
        if token_count is not None:
            weight_scale = _repeat_by_counts(weight_scale, jnp.asarray(token_count), tokens)
        x_fp = x_fp * weight_scale
        if activation_scale is not None:
            x_fp = x_fp * activation_scale.astype(jnp.float32)[:, None]
        if bias is not None:
            bias_fp = bias.astype(jnp.float32)
            if token_count is not None and bias_fp.ndim == 2:
                bias_fp = _repeat_by_counts(bias_fp, jnp.asarray(token_count), tokens)
            x_fp = x_fp + bias_fp

        left, right = jnp.split(x_fp, 2, axis=-1)
        out_fp = jax.nn.silu(left) * right if self.activate_left else jax.nn.silu(right) * left

        quant_scale = self.quant_scale.astype(jnp.float32)
        if token_count is not None:
            quant_scale = _repeat_by_counts(quant_scale, jnp.asarray(token_count), tokens)
        out_fp = out_fp * quant_scale

        scale = jnp.clip(jnp.max(jnp.abs(out_fp), axis=-1, keepdims=True), min=1e-12) / self.q_max
        output = jnp.clip(jnp.round(out_fp / scale), self.q_min, self.q_max)
        return output.astype(self.quant_dtype), scale

    def extra_repr(self) -> str:
        return (
            f"expert_num={self.expert_num}, hidden_size={self.hidden_size}, "
            f"quant_dtype={self.quant_dtype}, activate_left={self.activate_left}, "
            f"quant_mode={self.quant_mode}"
        )
