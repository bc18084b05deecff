"""Compute+Comm fused ops — the SP/TP/Ulysses building blocks.

Parity: reference mojo_opset/core/operators/compute_with_comm.py:57-489
(MojoGemmAllReduce :57, MojoAllGatherGemm :119, MojoGemmAll2All :187,
MojoGemmReduceScatter :264, MojoQuantGemmAll2All :343,
MojoAll2AllQuantGemm :416).

TPU-native design: these run inside ``shard_map`` regions over a Mesh
axis (``axis_name``); collectives are jax.lax primitives riding ICI
(psum / all_gather / all_to_all / psum_scatter) instead of
torch.distributed + aclshmem symmetric memory.  ``axis_name=None`` is the
single-rank identity-collective contract (reference :53-54).  The xla
tier overlaps comm and compute with ppermute-pipelined collective
matmuls (the latency-hiding role the reference's aclshmem Triton kernels
play, backends/ttx/kernels/npu/a2/allgather_gemm.py etc.).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator


def _gemm(input, weight, bias, trans_weight):
    w = weight if trans_weight else weight.T
    out = jnp.matmul(input, w, preferred_element_type=jnp.float32).astype(input.dtype)
    if bias is not None:
        out = out + bias
    return out


def _quant_gemm(input, weight, weight_scale, per_token_scale, trans_weight, output_dtype):
    input_fp = input.astype(jnp.float32)
    weight_fp = weight.astype(jnp.float32)
    out = input_fp @ (weight_fp if trans_weight else weight_fp.T)
    scale = weight_scale.astype(jnp.float32)
    token_scale = per_token_scale.astype(jnp.float32)
    while scale.ndim < out.ndim:
        scale = scale[None]
    while token_scale.ndim < out.ndim:
        token_scale = token_scale[..., None]
    return (out * scale * token_scale).astype(output_dtype)


class _CommGemmBase:
    """Shared config mixin (plain class — concrete ops are core ops)."""

    def _init_common(self, weight, bias, trans_weight, axis_name):
        if not isinstance(trans_weight, bool):
            raise TypeError("trans_weight must be bool.")
        self.weight = weight
        self.bias = bias
        self.trans_weight = trans_weight
        self.axis_name = axis_name

    def extra_repr(self) -> str:
        return (
            f"weight_shape={tuple(self.weight.shape)}, has_bias={self.bias is not None}, "
            f"trans_weight={self.trans_weight}, axis_name={self.axis_name!r}"
        )


class MojoGemmAllReduce(_CommGemmBase, MojoOperator):
    """Row-parallel TP: partial GEMM -> all-reduce(sum).

    ``output = psum(input @ weight [+ bias], axis_name)``; bias is added
    AFTER the reduce (each rank holds the full bias)."""

    def __init__(self, weight, bias=None, trans_weight: bool = False, axis_name: Optional[str] = None):
        super().__init__()
        self._init_common(weight, bias, trans_weight, axis_name)

    def forward(self, input: jax.Array) -> jax.Array:
        output = _gemm(input, self.weight, None, self.trans_weight)
        if self.axis_name is not None:
            output = jax.lax.psum(output, self.axis_name)
        if self.bias is not None:
            output = output + self.bias
        return output


class MojoAllGatherGemm(_CommGemmBase, MojoOperator):
    """Sequence-parallel: all-gather(seq dim) -> GEMM."""

    def __init__(
        self, weight, bias=None, trans_weight: bool = False,
        axis_name: Optional[str] = None, gather_dim: int = 0,
    ):
        super().__init__()
        self._init_common(weight, bias, trans_weight, axis_name)
        self.gather_dim = gather_dim

    def forward(self, input: jax.Array) -> jax.Array:
        if self.axis_name is not None:
            input = jax.lax.all_gather(input, self.axis_name, axis=self.gather_dim, tiled=True)
        return _gemm(input, self.weight, self.bias, self.trans_weight)


class MojoGemmAll2All(_CommGemmBase, MojoOperator):
    """Ulysses: GEMM -> all-to-all switching the shard axis
    (seq <-> head)."""

    def __init__(
        self, weight, bias=None, trans_weight: bool = False,
        axis_name: Optional[str] = None, scatter_dim: int = 0, gather_dim: int = 1,
    ):
        super().__init__()
        self._init_common(weight, bias, trans_weight, axis_name)
        self.scatter_dim = scatter_dim
        self.gather_dim = gather_dim

    def forward(self, input: jax.Array) -> jax.Array:
        output = _gemm(input, self.weight, self.bias, self.trans_weight)
        if self.axis_name is not None:
            output = jax.lax.all_to_all(
                output, self.axis_name,
                split_axis=self.scatter_dim, concat_axis=self.gather_dim, tiled=True,
            )
        return output

    def extra_repr(self) -> str:
        return super().extra_repr() + f", scatter_dim={self.scatter_dim}, gather_dim={self.gather_dim}"


class MojoGemmReduceScatter(_CommGemmBase, MojoOperator):
    """SP: GEMM -> reduce-scatter back to sequence shards."""

    def __init__(
        self, weight, bias=None, trans_weight: bool = False,
        axis_name: Optional[str] = None, scatter_dim: int = 0,
    ):
        super().__init__()
        self._init_common(weight, bias, trans_weight, axis_name)
        self.scatter_dim = scatter_dim

    def forward(self, input: jax.Array) -> jax.Array:
        output = _gemm(input, self.weight, self.bias, self.trans_weight)
        if self.axis_name is not None:
            output = jax.lax.psum_scatter(
                output, self.axis_name, scatter_dimension=self.scatter_dim, tiled=True
            )
        return output

    def extra_repr(self) -> str:
        return super().extra_repr() + f", scatter_dim={self.scatter_dim}"


class MojoQuantGemmAll2All(_CommGemmBase, MojoOperator):
    """int8 GEMM -> all-to-all (split output columns, gather rows).
    ``estimate_shmem_size_mb`` kept for API parity with symmetric-memory
    backends (reference :404-406); ICI collectives need no user shmem."""

    def __init__(
        self, weight, weight_scale, trans_weight: bool = False,
        axis_name: Optional[str] = None, output_dtype=jnp.bfloat16,
        use_internal_format: bool = True, comm_context=None,
    ):
        super().__init__()
        self._init_common(weight, None, trans_weight, axis_name)
        self.weight_scale = weight_scale
        self.output_dtype = jnp.dtype(output_dtype)
        self.use_internal_format = use_internal_format
        self.comm_context = comm_context

    def forward(self, input, per_token_scale, workspace=None):
        output = _quant_gemm(
            input, self.weight, self.weight_scale, per_token_scale,
            self.trans_weight, self.output_dtype,
        )
        if self.axis_name is not None:
            output = jax.lax.all_to_all(
                output, self.axis_name,
                split_axis=output.ndim - 1, concat_axis=0, tiled=True,
            )
        return output

    def estimate_shmem_size_mb(self, **kwargs) -> int:
        return 20


class MojoAll2AllQuantGemm(_CommGemmBase, MojoOperator):
    """all-to-all (split rows, gather K shards) -> int8 GEMM."""

    def __init__(
        self, weight, weight_scale, trans_weight: bool = False,
        axis_name: Optional[str] = None, output_dtype=jnp.bfloat16,
        use_internal_format: bool = True, comm_context=None,
    ):
        super().__init__()
        self._init_common(weight, None, trans_weight, axis_name)
        self.weight_scale = weight_scale
        self.output_dtype = jnp.dtype(output_dtype)
        self.use_internal_format = use_internal_format
        self.comm_context = comm_context

    def forward(self, input, per_token_scale, workspace=None):
        if self.axis_name is not None:
            n = jax.lax.axis_size(self.axis_name)
            rank = jax.lax.axis_index(self.axis_name)
            input = jax.lax.all_to_all(
                input, self.axis_name, split_axis=0, concat_axis=input.ndim - 1, tiled=True
            )
            rows_per_rank = per_token_scale.shape[0] // n
            per_token_scale = jax.lax.dynamic_slice_in_dim(
                per_token_scale, rank * rows_per_rank, rows_per_rank, 0
            )
        return _quant_gemm(
            input, self.weight, self.weight_scale, per_token_scale,
            self.trans_weight, self.output_dtype,
        )

    def estimate_shmem_size_mb(self, **kwargs) -> int:
        return 20
