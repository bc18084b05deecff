"""Causal Conv1d ops (Mamba-style state update).

Parity: reference mojo_opset/core/operators/convolution.py:9
(MojoCausalConv1dUpdateState) and the shared ``causal_conv1d`` math of
core/functions/convolution.py:12-66.

TPU notes: depthwise conv maps to ``lax.conv_general_dilated`` with
``feature_group_count=dim``; the state update is functional — the op
returns ``(out, new_conv_state)`` instead of mutating its input.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator


def depthwise_conv1d(x_bdt: jax.Array, weight: jax.Array, bias: Optional[jax.Array]) -> jax.Array:
    """x (B, D, T_padded) * weight (D, W) depthwise, VALID padding."""
    D, W = weight.shape
    out = jax.lax.conv_general_dilated(
        x_bdt.astype(jnp.float32),
        weight.astype(jnp.float32)[:, None, :],  # (D, 1, W)
        window_strides=(1,),
        padding="VALID",
        feature_group_count=D,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None]
    return out


def causal_conv1d(
    x: jax.Array,  # (B, T, D)
    weight: jax.Array,  # (D, W)
    bias: Optional[jax.Array] = None,
    initial_state: Optional[jax.Array] = None,  # (B, D, W-1)
    output_final_state: bool = False,
    activation: Optional[str] = None,
    residual: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Reference core/functions/convolution.py:12-66 semantics."""
    if activation not in (None, "silu", "swish"):
        raise NotImplementedError("activation must be None, silu, or swish")
    dtype_in = x.dtype
    xt = jnp.swapaxes(x, 1, 2)  # (B, D, T)
    D, W = weight.shape
    T = xt.shape[-1]

    if initial_state is None:
        padded = jnp.pad(xt, ((0, 0), (0, 0), (W - 1, 0)))
    else:
        padded = jnp.concatenate([initial_state.astype(xt.dtype), xt], axis=-1)
    out = depthwise_conv1d(padded, weight, bias)[..., :T]

    final_state = None
    if output_final_state:
        # last W-1 columns of (initial_state ++ x): a chunk shorter than
        # W-1 must CARRY the older history, not zero-pad over it
        final_state = padded[..., padded.shape[-1] - (W - 1):].astype(dtype_in)

    if activation is not None:
        out = jax.nn.silu(out)
    out = jnp.swapaxes(out, 1, 2).astype(dtype_in)
    if residual is not None:
        out = out + residual
    return out, final_state


class MojoCausalConv1dUpdateState(MojoOperator):
    """Causal conv over (conv_state ++ hidden_states); returns
    ``(out, new_conv_state)`` — the functional form of the reference's
    in-place ``conv_state.copy_`` (convolution.py:36)."""

    def forward(
        self,
        hidden_states: jax.Array,  # (B, D, T)
        conv_state: jax.Array,  # (B, D, state_len)
        weight: jax.Array,  # (D, W)
        bias: Optional[jax.Array] = None,
        activation: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        B, D, T = hidden_states.shape
        state_len = conv_state.shape[-1]
        combined = jnp.concatenate([conv_state, hidden_states], axis=-1).astype(weight.dtype)
        new_state = combined[:, :, -state_len:]
        out = depthwise_conv1d(combined, weight, bias)[..., -T:]
        if activation in ("silu", "swish"):
            out = jax.nn.silu(out)
        return out.astype(hidden_states.dtype), new_state.astype(conv_state.dtype)
