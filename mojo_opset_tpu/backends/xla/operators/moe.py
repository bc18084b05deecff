"""XLA-tier MoE implementations.

The fused-path analogue of the reference's vendor MoE backends
(e.g. ixformer IxformerMoE, backends/ixformer/operators/moe.py:463):
experts run as ragged grouped matmuls on the MXU; the surrounding
pipeline stages (gating/dispatch/combine) reuse the golden math, which
XLA fuses fully under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operators.moe import (
    MojoExperts,
    MojoMoE,
    MojoQuantMoE,
)


class XlaExperts(MojoExperts):
    """Jittable grouped SwiGLU via two ragged grouped matmuls on the MXU."""

    def forward(self, sorted_hidden_states: jax.Array, tokens_per_expert: jax.Array):
        group_sizes = tokens_per_expert.astype(jnp.int32)
        w_up = jnp.swapaxes(self.up_proj_weight, 1, 2)  # (E, H, 2I)
        fc1 = jax.lax.ragged_dot(
            sorted_hidden_states, w_up, group_sizes=group_sizes,
            preferred_element_type=jnp.float32,
        )
        gate, up = jnp.split(fc1, 2, axis=-1)
        act = (jax.nn.silu(gate) * up).astype(sorted_hidden_states.dtype)
        w_down = jnp.swapaxes(self.down_proj_weight, 1, 2)  # (E, I, H)
        out = jax.lax.ragged_dot(
            act, w_down, group_sizes=group_sizes, preferred_element_type=jnp.float32
        )
        return out.astype(sorted_hidden_states.dtype)


class XlaMoE(MojoMoE):
    """Full MoE pipeline with the xla experts tier (jittable end-to-end
    in the single-rank and shard_map EP paths)."""


class XlaQuantMoE(MojoQuantMoE):
    """Quantized MoE pipeline under the xla backend wiring."""
