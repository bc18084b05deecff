"""MoE operator chain: Gating -> Dispatch -> Experts -> Combine.

Parity: reference mojo_opset/core/operators/moe.py:12-716
(MojoMoE :12, MojoQuantMoE :132, MojoMoEGating :277, MojoMoEDispatch :330,
MojoExperts :402, MojoQuantExperts :452, MojoMoECombine :670).

Each stage is independently backend-swappable; ``MojoMoE.__init__`` wires
sub-ops from its own backend's registry (reference moe.py:53-65).  The
bucket-internal token order is explicitly NOT part of the dispatch
contract (reference moe.py:367-373) — tests compare buckets as sets.

TPU notes:
  * dispatch sort / bincount / combine scatter-add are fully jittable
    (static ``T * top_k`` row count);
  * the XLA expert tier maps the per-expert loop onto
    ``jax.lax.ragged_dot`` (MXU-native ragged grouped matmul);
  * EP: ``ep_axis_name`` selects the shard_map path — the token range for
    local experts is taken with a fixed-capacity ``dynamic_slice`` (full
    sorted length) + row masking so the whole MoE jits; partial outputs
    are summed with ``psum`` (or all_gather + psum_scatter in dp_input
    mode), replacing the reference's torch.distributed calls
    (moe.py:82-127).
  * int4 weights are packed two per int8 along the output dim
    (reference moe.py:566-573); the unpack keeps the same layout contract.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.quantize import MojoMoEDynamicQuant
from mojo_opset_tpu.utils import init as winit


class MojoMoEGating(MojoOperator):
    """fp32 gate matmul -> softmax -> topk -> renormalize;
    returns (int32 indices, fp32 gates)."""

    def __init__(self, hidden_size: int, num_experts: int, top_k: int, key=None, **kwargs):
        super().__init__(**kwargs)
        if key is None:
            key = jax.random.PRNGKey(0)
        self.gate_weight = winit.normal(
            key, (hidden_size, num_experts), jnp.float32, stddev=0.02
        )
        self.top_k = top_k

    def forward(self, hidden_states: jax.Array) -> Tuple[jax.Array, jax.Array]:
        logits = jnp.matmul(
            hidden_states.astype(jnp.float32), self.gate_weight,
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(logits, axis=-1)
        top_k_probs, top_k_indices = jax.lax.top_k(probs, self.top_k)
        top_k_gates = top_k_probs / jnp.sum(top_k_probs, axis=-1, keepdims=True)
        return top_k_indices.astype(jnp.int32), top_k_gates

    def extra_repr(self) -> str:
        return (
            f"hidden_size={self.gate_weight.shape[0]}, "
            f"num_experts={self.gate_weight.shape[1]}, top_k={self.top_k}"
        )


def count_expert_tokens(top_k_indices: jax.Array, num_experts: int) -> jax.Array:
    flat = top_k_indices.reshape(-1)
    return jnp.zeros((num_experts,), jnp.int32).at[flat].add(1, mode="drop")


class MojoMoEDispatch(MojoOperator):
    """Sort token copies by expert id; returns
    (sorted_hidden, tokens_per_expert, sorted_gates, token_indices)."""

    def __init__(self, num_experts: int, **kwargs):
        super().__init__(**kwargs)
        self.num_experts = num_experts

    def forward(
        self,
        hidden_states: jax.Array,  # (T, H)
        top_k_gates: jax.Array,  # (T, K) fp32
        top_k_indices: jax.Array,  # (T, K) int32
    ):
        assert top_k_gates.dtype == jnp.float32, "top_k_gates must be float32"
        assert top_k_indices.dtype == jnp.int32, "top_k_indices must be int32"
        T, K = top_k_indices.shape
        batch_token_indices = jnp.repeat(jnp.arange(T, dtype=jnp.int32), K)
        flat_gates = top_k_gates.reshape(-1, 1)
        flat_indices = top_k_indices.reshape(-1)

        expert_sort = jnp.argsort(flat_indices)  # bucket-internal order unspecified
        token_indices = batch_token_indices[expert_sort]
        tokens_per_expert = count_expert_tokens(flat_indices, self.num_experts)
        sorted_gates = flat_gates[expert_sort]
        sorted_hidden_states = hidden_states[token_indices]
        return sorted_hidden_states, tokens_per_expert, sorted_gates, token_indices


class MojoExperts(MojoOperator):
    """Grouped SwiGLU FFN over expert buckets.

    Weights: ``up_proj_weight (E, 2I, H)``, ``down_proj_weight (E, H, I)``
    (reference layout, moe.py:427-432).  The golden runs an eager
    per-expert loop (mocked GroupGemm); the XLA tier uses ragged_dot.
    """

    def __init__(
        self,
        num_experts: int,
        hidden_size: int,
        intermediate_size: int,
        activation: str = "swiglu",
        key=None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if activation != "swiglu":
            raise NotImplementedError(f"MojoExperts: Activation {activation} is not supported.")
        self.activation = activation
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        dtype = self.param_dtype or jnp.float32
        bound = 1.0 / (hidden_size**0.5)
        self.up_proj_weight = winit.uniform(
            k1, (num_experts, intermediate_size * 2, hidden_size), dtype, -bound, bound
        )
        bound2 = 1.0 / (intermediate_size**0.5)
        self.down_proj_weight = winit.uniform(
            k2, (num_experts, hidden_size, intermediate_size), dtype, -bound2, bound2
        )

    def forward(self, sorted_hidden_states: jax.Array, tokens_per_expert: jax.Array):
        counts = np.asarray(tokens_per_expert)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        outs = []
        for e in range(counts.shape[0]):
            x = sorted_hidden_states[int(starts[e]) : int(starts[e] + counts[e])].astype(jnp.float32)
            fc1 = x @ self.up_proj_weight[e].astype(jnp.float32).T
            gate, up = jnp.split(fc1, 2, axis=-1)
            act = jax.nn.silu(gate) * up
            outs.append(act @ self.down_proj_weight[e].astype(jnp.float32).T)
        return jnp.concatenate(outs, axis=0).astype(sorted_hidden_states.dtype)


def unpack_int4(weight: jax.Array) -> jax.Array:
    """Unpack int4 values stored two-per-int8 along the output dim
    (reference moe.py:566-573): even rows = low nibble, odd = high."""
    assert weight.ndim == 2
    low = (weight & 0x0F).astype(jnp.int8)
    high = ((weight >> 4) & 0x0F).astype(jnp.int8)
    stacked = jnp.stack([low, high], axis=1).reshape(weight.shape[0] * 2, weight.shape[1])
    return jnp.where(stacked >= 8, stacked - 16, stacked)


class MojoQuantExperts(MojoOperator):
    """w8a8 / w4a8 grouped experts: dynamic-quant activations per stage,
    int8(/packed int4) weights with per-channel (or grouped) scales.
    Reference moe.py:452-667."""

    def __init__(
        self,
        num_experts: int,
        hidden_size: int,
        intermediate_size: int,
        activation: str = "swiglu",
        quant_dtype=jnp.int8,
        up_quant_group_size: int = -1,
        up_weight_dtype: Union[str, object] = jnp.int8,
        down_quant_group_size: int = -1,
        down_weight_dtype: Union[str, object] = jnp.int8,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if activation != "swiglu":
            raise NotImplementedError(f"MojoQuantExperts: Activation {activation} is not supported.")
        if jnp.dtype(quant_dtype) != jnp.int8:
            raise ValueError(f"MojoQuantExperts: quant_dtype must be int8, got {quant_dtype}.")

        def _norm_wdtype(d):
            return d if d == "int4" else jnp.dtype(d)

        self.up_weight_dtype = _norm_wdtype(up_weight_dtype)
        self.down_weight_dtype = _norm_wdtype(down_weight_dtype)
        for d in (self.up_weight_dtype, self.down_weight_dtype):
            if d not in ("int4", jnp.dtype(jnp.int8)):
                raise NotImplementedError("MojoQuantExperts currently only supports w4 or w8.")

        self.activation = activation
        self.quant_dtype = jnp.dtype(quant_dtype)
        self.up_quant_group_size = up_quant_group_size
        self.down_quant_group_size = down_quant_group_size
        self.qmax, self.qmin = 127, -128
        self.num_experts = num_experts
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size

        self.up_proj_quantize = MojoMoEDynamicQuant._registry.get(self._backend)(
            num_experts, hidden_size
        )
        self.down_proj_quantize = MojoMoEDynamicQuant._registry.get(self._backend)(
            num_experts, intermediate_size
        )

        up_rows = intermediate_size * 2 if self.up_weight_dtype != "int4" else intermediate_size
        down_rows = hidden_size if self.down_weight_dtype != "int4" else hidden_size // 2
        self.up_proj_weight = jnp.zeros((num_experts, up_rows, hidden_size), jnp.int8)
        self.down_proj_weight = jnp.zeros((num_experts, down_rows, intermediate_size), jnp.int8)

        if up_quant_group_size > 0:
            groups = -(-hidden_size // up_quant_group_size)
            self.up_proj_weight_scale = jnp.ones(
                (num_experts, intermediate_size * 2, groups), jnp.bfloat16
            )
        else:
            self.up_proj_weight_scale = jnp.ones((num_experts, intermediate_size * 2), jnp.bfloat16)
        if down_quant_group_size > 0:
            groups = -(-intermediate_size // down_quant_group_size)
            self.down_proj_weight_scale = jnp.ones((num_experts, hidden_size, groups), jnp.bfloat16)
        else:
            self.down_proj_weight_scale = jnp.ones((num_experts, hidden_size), jnp.bfloat16)

    @staticmethod
    def _quant_linear(
        x_int8: jax.Array,  # (n, K)
        x_scale: jax.Array,  # (n, 1)
        weight: jax.Array,  # (N_out or N_out//2, K) int8/packed
        weight_scale: jax.Array,  # (N_out,) or (N_out, G)
        output_dtype,
        weight_dtype,
        quant_group_size: int = -1,
    ) -> jax.Array:
        if weight_dtype == "int4":
            weight = unpack_int4(weight)
        if quant_group_size > 0:
            K = x_int8.shape[-1]
            n_groups = -(-K // quant_group_size)
            outs = []
            for g in range(n_groups):
                sl = slice(g * quant_group_size, min((g + 1) * quant_group_size, K))
                part = jax.lax.dot_general(
                    x_int8[:, sl].astype(jnp.int8), weight[:, sl].astype(jnp.int8),
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                outs.append(part)
            out = jnp.stack(outs, axis=-1)  # (n, N, G)
            out = (out * weight_scale.astype(jnp.float32)[None] * x_scale.astype(jnp.float32)[..., None]).sum(-1)
        else:
            out = jax.lax.dot_general(
                x_int8.astype(jnp.int8), weight.astype(jnp.int8),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            out = out * weight_scale.astype(jnp.float32)[None, :] * x_scale.astype(jnp.float32)
        return out.astype(output_dtype)

    def forward(self, sorted_hidden_states: jax.Array, tokens_per_expert: jax.Array):
        x_int8, x_scale = self.up_proj_quantize(sorted_hidden_states, tokens_per_expert)
        counts = np.asarray(tokens_per_expert)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        dtype = sorted_hidden_states.dtype

        activated = []
        for e in range(self.num_experts):
            sl = slice(int(starts[e]), int(starts[e] + counts[e]))
            if counts[e] == 0:
                activated.append(jnp.zeros((0, self.intermediate_size), jnp.float32))
                continue
            fc1 = self._quant_linear(
                x_int8[sl], x_scale[sl], self.up_proj_weight[e], self.up_proj_weight_scale[e],
                dtype, self.up_weight_dtype, self.up_quant_group_size,
            )
            gate, up = jnp.split(fc1.astype(jnp.float32), 2, axis=-1)
            activated.append(jax.nn.silu(gate) * up)
        activated = jnp.concatenate(activated, axis=0)

        y_int8, y_scale = self.down_proj_quantize(activated, tokens_per_expert)
        outputs = []
        for e in range(self.num_experts):
            sl = slice(int(starts[e]), int(starts[e] + counts[e]))
            if counts[e] == 0:
                outputs.append(jnp.zeros((0, self.hidden_size), dtype))
                continue
            outputs.append(
                self._quant_linear(
                    y_int8[sl], y_scale[sl], self.down_proj_weight[e],
                    self.down_proj_weight_scale[e], dtype,
                    self.down_weight_dtype, self.down_quant_group_size,
                )
            )
        return jnp.concatenate(outputs, axis=0)

    def extra_repr(self) -> str:
        return (
            f"num_experts={self.num_experts}, intermediate_size={self.intermediate_size}, "
            f"hidden_size={self.hidden_size}, quant_dtype={self.quant_dtype}, "
            f"up_weight_dtype={self.up_weight_dtype}, down_weight_dtype={self.down_weight_dtype}"
        )


class MojoMoECombine(MojoOperator):
    """Scatter-add of gate-weighted expert outputs back to token order."""

    def __init__(self, multiply_by_gates: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.multiply_by_gates = multiply_by_gates

    def forward(
        self,
        output_buffer: jax.Array,  # (T, H)
        expert_outputs: jax.Array,  # (rows, H)
        sorted_gates: jax.Array,  # (rows, 1)
        token_indices: jax.Array,  # (rows,)
    ) -> jax.Array:
        vals = expert_outputs.astype(jnp.float32)
        if self.multiply_by_gates:
            vals = vals * sorted_gates.astype(jnp.float32)
        combined = jnp.zeros(output_buffer.shape, jnp.float32).at[token_indices].add(
            vals, mode="drop"
        )
        return combined.astype(expert_outputs.dtype)


class _MoEBase:
    """Shared pipeline mixin for MojoMoE / MojoQuantMoE (reference
    moe.py:79-129).  Plain mixin — only the concrete classes below are
    dispatchable core ops."""

    _use_fused_moe = False

    def _init_parallel(self, num_experts, ep_size, ep_rank, ep_axis_name, dp_input):
        if ep_axis_name is not None and num_experts % ep_size != 0:
            raise ValueError("shard_map EP requires num_experts divisible by ep_size")
        self.ep_size = ep_size
        self.ep_rank = ep_rank
        self.ep_axis_name = ep_axis_name
        base = num_experts // ep_size
        rem = num_experts % ep_size
        self.num_experts_local = base + 1 if ep_rank < rem else base
        self.ep_start = base * ep_rank + min(ep_rank, rem)
        self.ep_end = self.ep_start + self.num_experts_local
        self.dp_input = dp_input

    def _pipeline(self, hidden_states: jax.Array) -> jax.Array:
        in_shard_map = self.ep_axis_name is not None
        if self.dp_input and self.ep_size > 1:
            if not in_shard_map:
                raise ValueError("dp_input EP requires ep_axis_name (shard_map path)")
            hidden_states = jax.lax.all_gather(
                hidden_states, self.ep_axis_name, axis=0, tiled=True
            )

        top_k_indices, top_k_gates = self.gating(hidden_states)
        sorted_hidden, tokens_per_expert, sorted_gates, token_indices = self.dispatch(
            hidden_states, top_k_gates, top_k_indices
        )

        if self.ep_size > 1:
            if in_shard_map:
                # jittable fixed-capacity slice: window of the full sorted
                # length starting at this rank's token offset, rows beyond
                # the local count masked out.
                ep_rank = jax.lax.axis_index(self.ep_axis_name)
                base = self.gating.gate_weight.shape[1] // self.ep_size
                rem = self.gating.gate_weight.shape[1] % self.ep_size
                ep_start = base * ep_rank + jnp.minimum(ep_rank, rem)
                n_local = base + (ep_rank < rem).astype(jnp.int32)
                cumsum = jnp.cumsum(tokens_per_expert)
                tok_start = jnp.where(ep_start == 0, 0, cumsum[jnp.maximum(ep_start - 1, 0)])
                tok_end = cumsum[ep_start + n_local - 1]
                rows = sorted_hidden.shape[0]
                # pad to 2*rows so dynamic_slice never clamps tok_start
                sorted_hidden = jax.lax.dynamic_slice_in_dim(
                    jnp.pad(sorted_hidden, ((0, rows), (0, 0))), tok_start, rows, 0
                )
                sorted_gates = jax.lax.dynamic_slice_in_dim(
                    jnp.pad(sorted_gates, ((0, rows), (0, 0))), tok_start, rows, 0
                )
                token_indices_l = jax.lax.dynamic_slice_in_dim(
                    jnp.pad(token_indices, (0, rows), constant_values=-1), tok_start, rows, 0
                )
                local_rows = jnp.arange(rows) < (tok_end - tok_start)
                sorted_gates = jnp.where(local_rows[:, None], sorted_gates, 0.0)
                token_indices = jnp.where(local_rows, token_indices_l, -1)  # dropped by scatter
                tokens_per_expert = jax.lax.dynamic_slice_in_dim(
                    jnp.pad(tokens_per_expert, (0, self.ep_size)), ep_start,
                    self.num_experts_local, 0,
                )
            else:
                cumsum = np.cumsum(np.asarray(tokens_per_expert))
                tok_start = 0 if self.ep_start == 0 else int(cumsum[self.ep_start - 1])
                tok_end = int(cumsum[self.ep_end - 1])
                sorted_hidden = sorted_hidden[tok_start:tok_end]
                tokens_per_expert = tokens_per_expert[self.ep_start : self.ep_end]
                sorted_gates = sorted_gates[tok_start:tok_end]
                token_indices = token_indices[tok_start:tok_end]

        expert_outputs = self.experts(sorted_hidden, tokens_per_expert)
        output_buffer = jnp.zeros_like(hidden_states)
        combined = self.combine(output_buffer, expert_outputs, sorted_gates, token_indices)

        if self.ep_size > 1 and in_shard_map:
            if self.dp_input:
                combined = jax.lax.psum_scatter(
                    combined, self.ep_axis_name, scatter_dimension=0, tiled=True
                )
            else:
                combined = jax.lax.psum(combined, self.ep_axis_name)
        return combined


class MojoMoE(_MoEBase, MojoOperator):
    def __init__(
        self,
        num_experts: int,
        top_k: int,
        hidden_size: int,
        intermediate_size: Optional[int] = None,
        activation: str = "swiglu",
        ep_size: int = 1,
        ep_rank: int = 0,
        ep_axis_name: Optional[str] = None,
        dp_input: bool = False,
        key=None,
        **kwargs,
    ):
        super().__init__()
        if activation != "swiglu":
            raise NotImplementedError(f"MojoMoE: Activation {activation} is not supported.")
        if intermediate_size is None:
            raise ValueError("MojoMoE: intermediate_size must be provided.")
        self.num_experts = num_experts
        self.top_k = top_k
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self._init_parallel(num_experts, ep_size, ep_rank, ep_axis_name, dp_input)
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)

        backend = self._backend
        self.gating = MojoMoEGating._registry.get(backend)(
            hidden_size=hidden_size, num_experts=num_experts, top_k=top_k, key=k1, **kwargs
        )
        self.dispatch = MojoMoEDispatch._registry.get(backend)(num_experts=num_experts, **kwargs)
        self.experts = MojoExperts._registry.get(backend)(
            num_experts=self.num_experts_local, hidden_size=hidden_size,
            intermediate_size=intermediate_size, activation=activation, key=k2, **kwargs
        )
        self.combine = MojoMoECombine._registry.get(backend)(multiply_by_gates=True, **kwargs)

    def forward(self, hidden_states: jax.Array) -> jax.Array:
        return self._pipeline(hidden_states)

    def extra_repr(self) -> str:
        return (
            f"num_experts={self.num_experts}, top_k={self.top_k}, "
            f"hidden_size={self.hidden_size}, intermediate_size={self.intermediate_size}, "
            f"ep_size={self.ep_size}, dp_input={self.dp_input}"
        )


class MojoQuantMoE(_MoEBase, MojoOperator):
    def __init__(
        self,
        num_experts: int,
        top_k: int,
        hidden_size: int,
        intermediate_size: Optional[int] = None,
        activation: str = "swiglu",
        quant_dtype=jnp.int8,
        up_quant_group_size: int = -1,
        up_weight_dtype=jnp.int8,
        down_quant_group_size: int = -1,
        down_weight_dtype=jnp.int8,
        ep_size: int = 1,
        ep_rank: int = 0,
        ep_axis_name: Optional[str] = None,
        dp_input: bool = False,
        key=None,
        **kwargs,
    ):
        super().__init__()
        if activation != "swiglu":
            raise NotImplementedError(f"MojoQuantMoE: Activation {activation} is not supported.")
        if intermediate_size is None:
            raise ValueError("MojoQuantMoE: intermediate_size must be provided.")
        self.num_experts = num_experts
        self.top_k = top_k
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self._init_parallel(num_experts, ep_size, ep_rank, ep_axis_name, dp_input)
        if key is None:
            key = jax.random.PRNGKey(0)

        backend = self._backend
        self.gating = MojoMoEGating._registry.get(backend)(
            hidden_size=hidden_size, num_experts=num_experts, top_k=top_k, key=key, **kwargs
        )
        self.dispatch = MojoMoEDispatch._registry.get(backend)(num_experts=num_experts, **kwargs)
        self.experts = MojoQuantExperts._registry.get(backend)(
            num_experts=self.num_experts_local, hidden_size=hidden_size,
            intermediate_size=intermediate_size, activation=activation,
            quant_dtype=quant_dtype,
            up_quant_group_size=up_quant_group_size, up_weight_dtype=up_weight_dtype,
            down_quant_group_size=down_quant_group_size, down_weight_dtype=down_weight_dtype,
            **kwargs,
        )
        self.combine = MojoMoECombine._registry.get(backend)(multiply_by_gates=True, **kwargs)

    def forward(self, hidden_states: jax.Array) -> jax.Array:
        return self._pipeline(hidden_states)

    def extra_repr(self) -> str:
        return (
            f"num_experts={self.num_experts}, top_k={self.top_k}, "
            f"hidden_size={self.hidden_size}, intermediate_size={self.intermediate_size}, "
            f"ep_size={self.ep_size}, dp_input={self.dp_input}"
        )
