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
    MojoQuantExperts,
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


class XlaQuantExperts(MojoQuantExperts):
    """Jittable w8a8 / w4a8 grouped SwiGLU: int8 ragged_dot on the MXU with
    per-token activation scales and per-expert/channel weight scales
    applied on the int32 accumulators (the golden is an eager per-expert
    loop, reference moe.py:452-667). int4-packed weights are unpacked on
    the fly (bitwise ops fuse into the weight load); group-wise weight
    scales keep the golden path."""

    @staticmethod
    def _ragged_quant_linear(x_int8, x_scale, w, w_scale, gs, gid, group_size):
        """int8 ragged grouped matmul with per-channel or K-grouped weight
        scales, fully jittable. ``w`` is (E, OUT, K) int8 (already
        unpacked); ``w_scale`` is (E, OUT) or (E, OUT, G)."""
        if group_size <= 0:
            out = jax.lax.ragged_dot(
                x_int8, jnp.swapaxes(w, 1, 2), group_sizes=gs,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            return out * x_scale.astype(jnp.float32) * w_scale[gid].astype(jnp.float32)
        K = x_int8.shape[-1]
        n_groups = -(-K // group_size)
        acc = 0.0
        for g in range(n_groups):  # static trip count: unrolls under jit
            sl = slice(g * group_size, min((g + 1) * group_size, K))
            part = jax.lax.ragged_dot(
                x_int8[:, sl], jnp.swapaxes(w[:, :, sl], 1, 2), group_sizes=gs,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            acc = acc + part * w_scale[:, :, g][gid].astype(jnp.float32)
        return acc * x_scale.astype(jnp.float32)

    def forward(self, sorted_hidden_states: jax.Array, tokens_per_expert: jax.Array):
        from mojo_opset_tpu.core.operators.moe import unpack_int4

        up_w = self.up_proj_weight
        if self.up_weight_dtype == "int4":
            up_w = jax.vmap(unpack_int4)(up_w)  # (E, 2I, H) int8
        down_w = self.down_proj_weight
        if self.down_weight_dtype == "int4":
            down_w = jax.vmap(unpack_int4)(down_w)  # (E, H, I) int8

        M = sorted_hidden_states.shape[0]
        dtype = sorted_hidden_states.dtype
        gs = tokens_per_expert.astype(jnp.int32)
        # expert id of each sorted row (rows past the total map to the
        # last expert; their outputs are never combined)
        ends = jnp.cumsum(gs)
        gid = jnp.sum(jnp.arange(M)[:, None] >= ends[None, :], axis=-1)
        gid = jnp.clip(gid, 0, self.num_experts - 1)

        x_int8, x_scale = self.up_proj_quantize(sorted_hidden_states, tokens_per_expert)
        fc1 = self._ragged_quant_linear(
            x_int8, x_scale, up_w, self.up_proj_weight_scale, gs, gid,
            self.up_quant_group_size,
        )
        gate, up = jnp.split(fc1, 2, axis=-1)
        act = (jax.nn.silu(gate) * up).astype(dtype)

        y_int8, y_scale = self.down_proj_quantize(act, tokens_per_expert)
        out = self._ragged_quant_linear(
            y_int8, y_scale, down_w, self.down_proj_weight_scale, gs, gid,
            self.down_quant_group_size,
        )
        return out.astype(dtype)


class XlaMoE(MojoMoE):
    """Full MoE pipeline with the xla experts tier (jittable end-to-end
    in the single-rank and shard_map EP paths)."""


class XlaQuantMoE(MojoQuantMoE):
    """Quantized MoE pipeline under the xla backend wiring."""
