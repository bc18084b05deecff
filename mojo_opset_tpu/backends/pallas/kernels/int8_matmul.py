"""Pallas TPU kernel: dense int8 x int8 -> int32 matmul with fused dequant.

Replaces the reference TTX ``int8_gemm`` Triton kernel
(backends/ttx/kernels/npu/a2/int8_gemm.py) behind ``MojoQuantGemm``.  The
XLA ``dot_general`` tier measures ~83% of the v5e int8 MXU peak at 4096³
because the per-token x per-channel dequant epilogue runs as a separate
fp32 fusion over the (M, N) output; here the epilogue is folded into the
final K step of the blocked matmul, so the int32 accumulator never leaves
VMEM and the output is written once, already dequantized, in the target
dtype.

Canonical pipelined form: grid (m, n, k) with k innermost-arbitrary,
Mosaic double-buffers the x/w block DMAs; an fp32-free int32 VMEM
accumulator carries across k steps.  Scales ride as (1, M)/(1, N) rows so
their VMEM tiles stay lane-major.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.backends.pallas.kernels._compat import mosaic_f16_compat


def _int8_mm_kernel(x_ref, w_ref, is_ref, ws_ref, o_ref, acc_ref, *,
                    k_chunks: int, trans_weight: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dims = (((1,), (1,) if trans_weight else (0,)), ((), ()))
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], dims, preferred_element_type=jnp.int32
    )

    @pl.when(k == k_chunks - 1)
    def _():
        scale = is_ref[0, :][:, None] * ws_ref[0, :][None, :]
        o_ref[...] = (acc_ref[...].astype(jnp.float32) * scale).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "bm", "bn", "bk", "trans_weight", "interpret"),
)
@mosaic_f16_compat
def int8_scaled_matmul(
    x: jax.Array,            # (M, K) int8
    w: jax.Array,            # (K, N) int8; (N, K) when trans_weight
    input_scale: jax.Array,  # (M,) fp
    weight_scale: jax.Array, # (N,) fp
    out_dtype=jnp.bfloat16,
    bm: int = 512,
    bn: int = 512,
    bk: int = 4096,
    trans_weight: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """out[m, n] = (sum_k x[m,k]·w[k,n]) · input_scale[m] · weight_scale[n]."""
    M, K = x.shape
    N = w.shape[0] if trans_weight else w.shape[1]
    bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
    if K % bk:
        # deepest dividing K chunk at or under the requested bk, so direct
        # callers with e.g. K=5120/6144 tile instead of raising
        bk = next((b for b in (4096, 2048, 1024, 512, 256, 128)
                   if b <= bk and K % b == 0), bk)
    if M % bm or N % bn or K % bk or bm % 8 or bn % 128 or bk % 128:
        raise ValueError(f"unsupported int8 gemm geometry M={M} K={K} N={N} "
                         f"bm={bm} bn={bn} bk={bk}")
    k_chunks = K // bk
    is_row = input_scale.astype(jnp.float32).reshape(1, M)
    ws_row = weight_scale.astype(jnp.float32).reshape(1, N)

    w_spec = (
        pl.BlockSpec((bn, bk), lambda i, j, k: (j, k))
        if trans_weight
        else pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))
    )
    kernel = pl.pallas_call(
        functools.partial(_int8_mm_kernel, k_chunks=k_chunks,
                          trans_weight=trans_weight),
        grid=(M // bm, N // bn, k_chunks),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            w_spec,
            pl.BlockSpec((1, bm), lambda i, j, k: (0, i)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K + K * N + M * N * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )
    return kernel(x, w, is_row, ws_row)
