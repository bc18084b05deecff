"""XLA-tier ComputeComm ops: ppermute-pipelined collective matmuls.

The latency-hiding analogue of the reference's aclshmem-based Triton
comm-fused kernels (backends/ttx/kernels/npu/a2/allgather_gemm.py,
gemm_reduce_scatter.py): comm rides the ICI ring while the MXU works on
the chunk already in VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operators.compute_with_comm import (
    MojoAllGatherGemm,
    MojoGemmReduceScatter,
    _gemm,
)


class XlaAllGatherGemm(MojoAllGatherGemm):
    """ppermute-pipelined collective matmul: each ring step multiplies the
    chunk just received while the next chunk is in flight — comm hides
    under MXU work (the scaling-book collective-matmul recipe; replaces
    the reference's aclshmem allgather_gemm.py Triton kernel)."""

    def forward(self, input: jax.Array) -> jax.Array:
        if self.axis_name is None:
            return _gemm(input, self.weight, self.bias, self.trans_weight)
        axis = self.axis_name
        n = jax.lax.axis_size(axis)
        if n == 1 or self.gather_dim != 0:
            return MojoAllGatherGemm.forward(self, input)
        idx = jax.lax.axis_index(axis)
        perm_fwd = [(i, (i + 1) % n) for i in range(n)]

        chunk = input
        # step 0: our own chunk
        outs = []
        srcs = []
        for step in range(n):
            src = (idx - step) % n
            outs.append(_gemm(chunk, self.weight, self.bias, self.trans_weight))
            srcs.append(src)
            if step + 1 < n:
                chunk = jax.lax.ppermute(chunk, axis, perm_fwd)
        # scatter the n partial outputs into source order along dim 0
        local = input.shape[0]
        total = jnp.zeros((n * local,) + outs[0].shape[1:], outs[0].dtype)
        for step in range(n):
            total = jax.lax.dynamic_update_slice_in_dim(total, outs[step], srcs[step] * local, 0)
        return total



class XlaGemmReduceScatter(MojoGemmReduceScatter):
    """ppermute-pipelined matmul+reduce-scatter: the accumulator rides the
    ring while each step adds the partial for the chunk it is about to
    forward (replaces the reference's aclshmem gemm_reduce_scatter.py)."""

    def forward(self, input: jax.Array) -> jax.Array:
        if self.axis_name is None:
            return _gemm(input, self.weight, self.bias, self.trans_weight)
        axis = self.axis_name
        n = jax.lax.axis_size(axis)
        if n == 1 or self.scatter_dim != 0:
            return MojoGemmReduceScatter.forward(self, input)
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n) for i in range(n)]
        local_rows = input.shape[0] // n

        acc = None
        for step in range(n):
            # the acc travels (n-1-step) more hops, so compute the chunk
            # that lands on its final rank: (idx + n-1-step) % n
            target = (idx + n - 1 - step) % n
            rows = jax.lax.dynamic_slice_in_dim(input, target * local_rows, local_rows, 0)
            partial = _gemm(rows, self.weight, None, self.trans_weight)
            acc = partial if acc is None else acc + partial
            if step + 1 < n:
                acc = jax.lax.ppermute(acc, axis, perm)
        if self.bias is not None:
            acc = acc + self.bias
        return acc


