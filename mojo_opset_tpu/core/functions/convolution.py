"""Training causal-conv1d function.

Parity: reference mojo_opset/core/functions/convolution.py:137
(MojoCausalConv1dFunction fwd+bwd; varlen path :67-135).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mojo_opset_tpu.core.function import MojoFunction
from mojo_opset_tpu.core.operators.convolution import causal_conv1d


class MojoCausalConv1dFunction(MojoFunction):
    """x (B, T, D) -> (out, final_state); supports varlen via cu_seqlens
    (per-sequence independent convolution, eager golden path)."""

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
        if cu_seqlens is None:
            return causal_conv1d(
                x, weight, bias,
                initial_state=initial_state,
                output_final_state=output_final_state,
                activation=activation,
                residual=residual,
            )
        cu = np.asarray(cu_seqlens)
        outs, states = [], []
        for i in range(cu.shape[0] - 1):
            s, e = int(cu[i]), int(cu[i + 1])
            chunk_res = residual[:, s:e] if residual is not None else None
            chunk_state = initial_state[i : i + 1] if initial_state is not None else None
            o, st = causal_conv1d(
                x[:, s:e], weight, bias,
                initial_state=chunk_state,
                output_final_state=output_final_state,
                activation=activation,
                residual=chunk_res,
            )
            outs.append(o)
            if output_final_state:
                states.append(st)
        out = jnp.concatenate(outs, axis=1)
        final = jnp.concatenate(states, axis=0) if (output_final_state and states) else None
        return out, final
