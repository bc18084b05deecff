"""Normalization ops (plus fused residual-add and quant variants).

Parity: reference mojo_opset/core/operators/normalization.py:19-646
(LayerNorm :19, RMSNorm :71, GroupRMSNorm :114, RMSNormQuant :136,
LayerNormQuant :216, ResidualAdd{RMS,Layer}Norm :308/:365,
ResidualAdd{RMS,Layer}NormQuant :434/:536).

TPU notes: statistics are computed in fp32 and cast back (the reference
computes norms in fp32 for the quant variants and relies on torch
internals elsewhere); on TPU these single-pass norms fuse into one VPU
kernel under XLA, and a dedicated Pallas tier covers the residual-add and
quant fusions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator

_FP8_E4M3_MAX = 448.0


def _quant_range(quant_dtype, symmetric: bool = True):
    quant_dtype = jnp.dtype(quant_dtype)
    if quant_dtype == jnp.int8:
        return (-128.0 if symmetric else 0.0), 127.0
    if quant_dtype == jnp.dtype("float8_e4m3fn"):
        return -_FP8_E4M3_MAX, _FP8_E4M3_MAX
    raise NotImplementedError(
        f"Unsupported quant_dtype: {quant_dtype}, expected int8 or float8_e4m3fn"
    )


def _rms_norm(x: jax.Array, weight: Optional[jax.Array], eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        normed = normed * weight.astype(jnp.float32)
    return normed


def _layer_norm(
    x: jax.Array, weight: Optional[jax.Array], bias: Optional[jax.Array], eps: float
) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        normed = normed * weight.astype(jnp.float32)
    if bias is not None:
        normed = normed + bias.astype(jnp.float32)
    return normed


def _dynamic_quant(normed_fp: jax.Array, smooth_scale, q_min, q_max, quant_dtype):
    if smooth_scale is not None:
        scale_fp = smooth_scale.astype(jnp.float32)
        normed_fp = normed_fp * scale_fp
    scale = jnp.clip(jnp.max(jnp.abs(normed_fp), axis=-1, keepdims=True), min=1e-12) / q_max
    output = jnp.clip(jnp.round(normed_fp / scale), q_min, q_max)
    return output.astype(quant_dtype), scale


class MojoLayerNorm(MojoOperator):
    def __init__(self, norm_size: int, eps: float = 1e-5, elementwise_affine: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.norm_size = norm_size
        self.elementwise_affine = elementwise_affine
        dtype = self.param_dtype or jnp.float32
        self.weight = jnp.ones((norm_size,), dtype) if elementwise_affine else None
        self.bias = jnp.zeros((norm_size,), dtype) if elementwise_affine else None
        self.variance_epsilon = eps

    def forward(self, hidden_state: jax.Array) -> jax.Array:
        """LayerNorm over the last dim; same shape/dtype as input."""
        return _layer_norm(hidden_state, self.weight, self.bias, self.variance_epsilon).astype(
            hidden_state.dtype
        )

    def extra_repr(self) -> str:
        return f"norm_size={self.norm_size}, variance_epsilon={self.variance_epsilon}, elementwise_affine={self.elementwise_affine}"


class MojoRMSNorm(MojoOperator):
    def __init__(self, norm_size: int, eps: float = 1e-5, **kwargs):
        super().__init__(**kwargs)
        self.norm_size = norm_size
        self.weight = jnp.ones((norm_size,), self.param_dtype or jnp.float32)
        self.variance_epsilon = eps

    def forward(self, hidden_state: jax.Array) -> jax.Array:
        """RMSNorm over the last dim; same shape/dtype as input."""
        return _rms_norm(hidden_state, self.weight, self.variance_epsilon).astype(hidden_state.dtype)

    def extra_repr(self) -> str:
        return f"norm_size={self.norm_size}, variance_epsilon={self.variance_epsilon}"


class MojoGroupRMSNorm(MojoOperator):
    """RMSNorm applied independently to a list of group tensors with a
    per-group weight row (reference normalization.py:114-134)."""

    def __init__(self, num_groups: int, norm_size: int, eps: float, elementwise_affine: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.num_groups = num_groups
        self.norm_size = norm_size
        self.elementwise_affine = elementwise_affine
        dtype = self.param_dtype or jnp.float32
        self.weight = jnp.ones((num_groups, norm_size), dtype) if elementwise_affine else None
        self.variance_epsilon = eps

    def forward(self, input_groups: Sequence[jax.Array]) -> list[jax.Array]:
        output_groups = []
        for group_id in range(self.num_groups):
            x = input_groups[group_id]
            w = self.weight[group_id] if self.weight is not None else None
            output_groups.append(_rms_norm(x, w, self.variance_epsilon).astype(x.dtype))
        return output_groups

    def extra_repr(self) -> str:
        return f"num_groups={self.num_groups}, norm_size={self.norm_size}, variance_epsilon={self.variance_epsilon}"


class MojoRMSNormQuant(MojoOperator):
    """Fused RMSNorm + dynamic per-token quantization; returns (q, scale).

    Reference normalization.py:136-213 — norm in fp32, per-token scale
    ``amax(|normed|)/q_max``, round+clamp.
    """

    def __init__(self, norm_size: int, eps: float = 1e-5, quant_dtype=jnp.int8, symmetric: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.norm_size = norm_size
        self.variance_epsilon = eps
        self.weight = jnp.ones((norm_size,), self.param_dtype or jnp.float32)
        self.quant_dtype = jnp.dtype(quant_dtype)
        self.symmetric = symmetric
        self.q_min, self.q_max = _quant_range(quant_dtype, symmetric)

    def forward(self, hidden_state: jax.Array, smooth_scale: Optional[jax.Array] = None):
        normed = _rms_norm(hidden_state, self.weight, self.variance_epsilon)
        return _dynamic_quant(normed, smooth_scale, self.q_min, self.q_max, self.quant_dtype)

    def extra_repr(self) -> str:
        return (
            f"norm_size={self.norm_size}, variance_epsilon={self.variance_epsilon}, "
            f"quant_dtype={self.quant_dtype}, symmetric={self.symmetric}"
        )


class MojoLayerNormQuant(MojoOperator):
    """Fused LayerNorm + dynamic per-token quantization; returns (q, scale).
    Reference normalization.py:216-305."""

    def __init__(
        self,
        norm_size: int,
        eps: float = 1e-5,
        elementwise_affine: bool = True,
        quant_dtype=jnp.int8,
        symmetric: bool = True,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.norm_size = norm_size
        self.variance_epsilon = eps
        self.elementwise_affine = elementwise_affine
        dtype = self.param_dtype or jnp.float32
        self.weight = jnp.ones((norm_size,), dtype) if elementwise_affine else None
        self.bias = jnp.zeros((norm_size,), dtype) if elementwise_affine else None
        self.quant_dtype = jnp.dtype(quant_dtype)
        self.symmetric = symmetric
        self.q_min, self.q_max = _quant_range(quant_dtype, symmetric)

    def forward(self, hidden_state: jax.Array, smooth_scale: Optional[jax.Array] = None):
        normed = _layer_norm(hidden_state, self.weight, self.bias, self.variance_epsilon)
        return _dynamic_quant(normed, smooth_scale, self.q_min, self.q_max, self.quant_dtype)

    def extra_repr(self) -> str:
        return (
            f"norm_size={self.norm_size}, variance_epsilon={self.variance_epsilon}, "
            f"elementwise_affine={self.elementwise_affine}, quant_dtype={self.quant_dtype}, "
            f"symmetric={self.symmetric}"
        )


class MojoResidualAddRMSNorm(MojoOperator):
    """Residual add + RMSNorm; returns (hidden, residual).

    Reference normalization.py:308-362:
      * pre:  residual = hidden + residual; hidden = rms(residual)
      * post: hidden = hidden + residual; hidden = rms(hidden); residual = hidden
    """

    def __init__(self, norm_size: int, eps: float = 1e-5, norm_pos: str = "pre", **kwargs):
        super().__init__(**kwargs)
        if norm_pos not in ("pre", "post"):
            raise ValueError("norm_pos should be 'pre' or 'post'")
        self.norm_size = norm_size
        self.variance_epsilon = float(eps)
        self.weight = jnp.ones((norm_size,), self.param_dtype or jnp.float32)
        self.norm_pos = norm_pos

    def forward(self, hidden_state: jax.Array, residual: jax.Array):
        dtype = hidden_state.dtype
        if self.norm_pos == "pre":
            residual = hidden_state + residual
            hidden_state = _rms_norm(residual, self.weight, self.variance_epsilon).astype(dtype)
        else:
            hidden_state = hidden_state + residual
            hidden_state = _rms_norm(hidden_state, self.weight, self.variance_epsilon).astype(dtype)
            residual = hidden_state
        return hidden_state, residual

    def extra_repr(self) -> str:
        return f"norm_size={self.norm_size}, variance_epsilon={self.variance_epsilon}, norm_pos={self.norm_pos!r}"


class MojoResidualAddLayerNorm(MojoOperator):
    """Residual add + LayerNorm; returns (hidden, residual).
    Reference normalization.py:365-432."""

    def __init__(self, norm_size: int, eps: float = 1e-5, norm_pos: str = "pre", **kwargs):
        super().__init__(**kwargs)
        if norm_pos not in ("pre", "post"):
            raise ValueError("norm_pos should be 'pre' or 'post'")
        self.norm_size = norm_size
        self.variance_epsilon = float(eps)
        dtype = self.param_dtype or jnp.float32
        self.weight = jnp.ones((norm_size,), dtype)
        self.bias = jnp.zeros((norm_size,), dtype)
        self.norm_pos = norm_pos

    def forward(self, hidden_state: jax.Array, residual: jax.Array):
        dtype = hidden_state.dtype
        if self.norm_pos == "pre":
            residual = hidden_state + residual
            hidden_state = _layer_norm(residual, self.weight, self.bias, self.variance_epsilon).astype(dtype)
        else:
            hidden_state = hidden_state + residual
            hidden_state = _layer_norm(hidden_state, self.weight, self.bias, self.variance_epsilon).astype(dtype)
            residual = hidden_state
        return hidden_state, residual

    def extra_repr(self) -> str:
        return f"norm_size={self.norm_size}, variance_epsilon={self.variance_epsilon}, norm_pos={self.norm_pos!r}"


class MojoResidualAddRMSNormQuant(MojoOperator):
    """Fused residual-add + RMSNorm + dynamic per-token quantization.

    Returns ``(quant_output, residual, scale)``.
    Reference normalization.py:434-533 — note the ``post`` branch keeps the
    fp32 normed value as the residual.
    """

    def __init__(
        self,
        norm_size: int,
        eps: float = 1e-5,
        norm_pos: str = "pre",
        quant_dtype=jnp.int8,
        symmetric: bool = True,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if norm_pos not in ("pre", "post"):
            raise ValueError("norm_pos should be 'pre' or 'post'")
        self.norm_size = norm_size
        self.variance_epsilon = float(eps)
        self.norm_pos = norm_pos
        self.weight = jnp.ones((norm_size,), self.param_dtype or jnp.float32)
        self.quant_dtype = jnp.dtype(quant_dtype)
        self.symmetric = symmetric
        self.q_min, self.q_max = _quant_range(quant_dtype, symmetric)

    def forward(
        self,
        hidden_state: jax.Array,
        residual: jax.Array,
        smooth_scale: Optional[jax.Array] = None,
    ):
        if self.norm_pos == "pre":
            residual = hidden_state + residual
            normed = _rms_norm(residual, self.weight, self.variance_epsilon)
        else:
            hidden_state = hidden_state + residual
            normed = _rms_norm(hidden_state, self.weight, self.variance_epsilon)
            residual = normed  # fp32 normed kept as residual (reference :521)
        q, scale = _dynamic_quant(normed, smooth_scale, self.q_min, self.q_max, self.quant_dtype)
        return q, residual, scale

    def extra_repr(self) -> str:
        return (
            f"norm_size={self.norm_size}, variance_epsilon={self.variance_epsilon}, "
            f"norm_pos={self.norm_pos!r}, quant_dtype={self.quant_dtype}, symmetric={self.symmetric}"
        )


class MojoResidualAddLayerNormQuant(MojoOperator):
    """Fused residual-add + LayerNorm + dynamic per-token quantization.
    Returns ``(quant_output, residual, scale)``. Reference normalization.py:536-646."""

    def __init__(
        self,
        norm_size: int,
        eps: float = 1e-5,
        elementwise_affine: bool = True,
        norm_pos: str = "pre",
        quant_dtype=jnp.int8,
        symmetric: bool = True,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if norm_pos not in ("pre", "post"):
            raise ValueError("norm_pos should be 'pre' or 'post'")
        self.norm_size = norm_size
        self.variance_epsilon = float(eps)
        self.norm_pos = norm_pos
        self.elementwise_affine = elementwise_affine
        dtype = self.param_dtype or jnp.float32
        self.weight = jnp.ones((norm_size,), dtype) if elementwise_affine else None
        self.bias = jnp.zeros((norm_size,), dtype) if elementwise_affine else None
        self.quant_dtype = jnp.dtype(quant_dtype)
        self.symmetric = symmetric
        self.q_min, self.q_max = _quant_range(quant_dtype, symmetric)

    def forward(
        self,
        hidden_state: jax.Array,
        residual: jax.Array,
        smooth_scale: Optional[jax.Array] = None,
    ):
        if self.norm_pos == "pre":
            residual = hidden_state + residual
            normed = _layer_norm(residual, self.weight, self.bias, self.variance_epsilon)
        else:
            hidden_state = hidden_state + residual
            normed = _layer_norm(hidden_state, self.weight, self.bias, self.variance_epsilon)
            residual = hidden_state  # reference :634 keeps the un-normed sum
        q, scale = _dynamic_quant(normed, smooth_scale, self.q_min, self.q_max, self.quant_dtype)
        return q, residual, scale

    def extra_repr(self) -> str:
        return (
            f"norm_size={self.norm_size}, variance_epsilon={self.variance_epsilon}, "
            f"elementwise_affine={self.elementwise_affine}, norm_pos={self.norm_pos!r}, "
            f"quant_dtype={self.quant_dtype}, symmetric={self.symmetric}"
        )
