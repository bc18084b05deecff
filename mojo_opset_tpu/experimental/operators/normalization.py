"""Experimental normalization ops.

Parity: reference mojo_opset/experimental/operators/normalization.py
(MojoGroupLayerNorm :7, MojoChannelRMSNorm :32 (VAE), MojoRMSNormInplace
:95, MojoGroupRMSNormInplace :145).  "Inplace" is a torch memory
optimization; JAX is functional, so the flag is kept for API parity and
the in-place semantics arise from buffer donation under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.normalization import _layer_norm, _rms_norm


class MojoGroupLayerNorm(MojoOperator):
    def __init__(self, num_groups, norm_size, eps, elementwise_affine=True, **kwargs):
        super().__init__(**kwargs)
        self.num_groups = num_groups
        self.norm_size = norm_size
        self.elementwise_affine = elementwise_affine
        dtype = self.param_dtype or jnp.float32
        self.weight = jnp.ones((num_groups, norm_size), dtype) if elementwise_affine else None
        self.bias = jnp.zeros((num_groups, norm_size), dtype) if elementwise_affine else None
        self.variance_epsilon = eps

    def forward(self, input_groups):
        outs = []
        for g in range(self.num_groups):
            x = input_groups[g]
            w = self.weight[g] if self.weight is not None else None
            b = self.bias[g] if self.bias is not None else None
            outs.append(_layer_norm(x, w, b, self.variance_epsilon).astype(x.dtype))
        return outs

    def extra_repr(self) -> str:
        return (
            f"num_groups={self.num_groups}, norm_size={self.norm_size}, "
            f"variance_epsilon={self.variance_epsilon}, elementwise_affine={self.elementwise_affine}"
        )


class MojoChannelRMSNorm(MojoOperator):
    """Channel-axis L2 normalization scaled by sqrt(C) (VAE norm).

    channel_first=True expects NCHW / NCTHW; otherwise channels-last."""

    def __init__(self, norm_size: int, channel_first: bool = True, images: bool = True,
                 bias: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.norm_size = norm_size
        self.images = images
        self.has_bias = bias
        b_dims = (1, 1) if images else (1, 1, 1)
        shape = (norm_size, *b_dims) if channel_first else (norm_size,)
        self.scale = norm_size**0.5
        dtype = self.param_dtype or jnp.float32
        self.weight = jnp.ones(shape, dtype)
        self.bias = jnp.zeros(shape, dtype) if bias else None
        self.channel_first = channel_first

    def forward(self, hidden_state: jax.Array) -> jax.Array:
        axis = 1 if self.channel_first else -1
        xf = hidden_state.astype(jnp.float32)
        norm = jnp.linalg.norm(xf, axis=axis, keepdims=True)
        out = xf / jnp.maximum(norm, 1e-12) * self.scale
        out = out * self.weight.astype(jnp.float32)
        if self.bias is not None:
            out = out + self.bias.astype(jnp.float32)
        return out.astype(hidden_state.dtype)

    def extra_repr(self) -> str:
        return (
            f"norm_size={self.norm_size}, channel_first={self.channel_first}, "
            f"images={self.images}, has_bias={self.has_bias}, scale={self.scale}"
        )


class MojoRMSNormInplace(MojoOperator):
    def __init__(self, norm_size: int, eps: float = 1e-5, inplace: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.norm_size = norm_size
        self.weight = jnp.ones((norm_size,), self.param_dtype or jnp.float32)
        self.variance_epsilon = eps
        self.inplace = inplace

    def forward(self, hidden_state: jax.Array) -> jax.Array:
        return _rms_norm(hidden_state, self.weight, self.variance_epsilon).astype(
            hidden_state.dtype
        )

    def extra_repr(self) -> str:
        return f"norm_size={self.norm_size}, variance_epsilon={self.variance_epsilon}"


class MojoGroupRMSNormInplace(MojoOperator):
    def __init__(self, num_groups, norm_size, eps, elementwise_affine=True, inplace=False, **kwargs):
        super().__init__(**kwargs)
        self.num_groups = num_groups
        self.norm_size = norm_size
        self.elementwise_affine = elementwise_affine
        self.weight = (
            jnp.ones((num_groups, norm_size), self.param_dtype or jnp.float32)
            if elementwise_affine
            else None
        )
        self.variance_epsilon = eps
        self.inplace = inplace

    def forward(self, input_groups):
        outs = []
        for g in range(self.num_groups):
            x = input_groups[g]
            w = self.weight[g] if self.weight is not None else None
            outs.append(_rms_norm(x, w, self.variance_epsilon).astype(x.dtype))
        return outs

    def extra_repr(self) -> str:
        return (
            f"num_groups={self.num_groups}, norm_size={self.norm_size}, "
            f"variance_epsilon={self.variance_epsilon}, elementwise_affine={self.elementwise_affine}"
        )
