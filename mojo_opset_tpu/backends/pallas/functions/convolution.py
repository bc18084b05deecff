"""Pallas-tier training function: fused causal conv1d fwd+bwd.

Replaces autodiff-of-golden (which differentiates through
``lax.conv_general_dilated``) with the hand-written recompute kernel
pair in kernels/conv1d_vjp.py — the analogue of the reference's
TTXCausalConv1dFunction (reference backends/ttx/functions/convolution.py
+ kernels/npu/a2/convolution.py:1).  Varlen (cu_seqlens) and
lane-unaligned channel counts fall back to the golden.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.conv1d_vjp import conv1d_train
from mojo_opset_tpu.core.functions.convolution import MojoCausalConv1dFunction
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


class PallasCausalConv1dFunction(MojoCausalConv1dFunction):
    # Not the default tier: on-chip (r5) XLA autodiff-of-golden measures
    # 4600 µs vs 8763 µs for this pair at B=8 T=8192 D=2048 W=4 (0.53x) —
    # the W-tap shifted-window conv fuses cleanly under XLA.
    # Reachable via MOJO_BACKEND=pallas.
    dispatch_default = False

    def forward(
        self,
        x: jax.Array,
        weight: jax.Array,
        bias: Optional[jax.Array] = None,
        residual: Optional[jax.Array] = None,
        initial_state: Optional[jax.Array] = None,
        output_final_state: bool = False,
        activation: Optional[str] = None,
        cu_seqlens: Optional[jax.Array] = None,
    ):
        D, W = weight.shape
        if (
            cu_seqlens is not None
            or x.ndim != 3
            or x.shape[-1] != D
            or D % 128 != 0
            or W + 1 > 16
            or activation not in (None, "silu", "swish")
            or not jnp.issubdtype(x.dtype, jnp.floating)
        ):
            return super().forward(
                x, weight, bias, residual, initial_state,
                output_final_state, activation, cu_seqlens,
            )
        B, T, _ = x.shape
        if initial_state is not None:
            state = jnp.swapaxes(initial_state, 1, 2).astype(x.dtype)  # (B, W-1, D)
        else:
            state = jnp.zeros((B, W - 1, D), x.dtype)
        out = conv1d_train(x, weight, bias, state,
                           activation is not None, pallas_interpret_mode())
        if residual is not None:
            out = out + residual
        final_state = None
        if output_final_state:
            # last W-1 stream rows, carrying older history for short chunks
            stream = jnp.concatenate([state, x], axis=1)
            final_state = jnp.swapaxes(stream[:, stream.shape[1] - (W - 1):],
                                       1, 2).astype(x.dtype)  # (B, D, W-1)
        return out, final_state
