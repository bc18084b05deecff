"""Pallas TPU kernel: packed-int4 x int8 -> int32 matmul, fused dequant.

Dense w4a8 serving GEMM: weights ride HBM at 0.5 bytes/param (the decode
bottleneck at small M is weight bandwidth), are unpacked to int8 nibbles
in VMEM and fed to the int8 MXU path; the per-token x per-channel dequant
epilogue runs on the int32 accumulator before the single output write.

Packed format (``pack_int4_rows`` in core/operators/gemm.py): weights are
stored transposed (N, K) and packed along N in 128-row blocks — packed
row ``j*64 + r`` holds output channels ``j*128 + r`` (low nibble, two's
complement) and ``j*128 + 64 + r`` (high nibble).  A kernel step covers
``bn`` channels = ``bn/128`` packed groups; the unpack reshapes to
(groups, 64, bk), splits nibbles, and concatenates per group so channel
order is preserved:

    lo = ((p & 15) ^ 8) - 8        hi = p >> 4   (arithmetic)
    U  = concat([lo, hi], axis=1)  # (groups, 128, bk) rows in order

Block sizing note (v1 lesson): BN=128 with bk=512 made every weight DMA
32 KB — 240 grid steps at M=8/qkv and ~110 GB/s effective.  Wide bn and
full-K chunks push the weight stream to MB-scale transfers.

Extends the reference's w4a8 support (int4 experts only, reference
moe.py:566-667) to dense projections — used for the MojoQuantGemm
``weight_dtype=int4`` contract and the cheap speculative-decoding draft.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 128  # packed-format channel group (64 packed rows -> 128 channels)


def _unpack_block(p, groups: int):
    """(groups*64, bk) packed int8 -> (groups*128, bk) int8, rows in order.

    Nibble arithmetic runs in int32: Mosaic has no 8-bit vector
    sub/shift lowering (`failed to legalize arith.subi` on vector<i8>).
    """
    bk = p.shape[-1]
    p32 = p.astype(jnp.int32).reshape(groups, 64, bk)
    lo = jnp.bitwise_xor(jnp.bitwise_and(p32, 15), 8) - 8
    hi = jnp.right_shift(p32, 4)  # arithmetic: sign of the byte rides the high nibble
    u = jnp.concatenate([lo, hi], axis=1)  # (groups, 128, bk)
    return u.reshape(groups * BN, bk).astype(jnp.int8)


def _int4_mm_kernel(x_ref, w_ref, is_ref, ws_ref, o_ref, acc_ref,
                    *, k_chunks: int, groups: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    u = _unpack_block(w_ref[...], groups)  # (bn, bk) int8
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], u, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == k_chunks - 1)
    def _():
        scale = is_ref[0, :][:, None] * ws_ref[0, :][None, :]
        o_ref[...] = (acc_ref[...].astype(jnp.float32) * scale).astype(o_ref.dtype)


def _pick_bk(K: int, cap: int = 4096) -> int:
    best = 0
    for mult in range(1, K // 128 + 1):
        bk = 128 * mult
        if K % bk == 0 and bk <= cap:
            best = bk
    return best or K


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "interpret"))
def int4_scaled_matmul(
    x: jax.Array,            # (M, K) int8
    w_packed: jax.Array,     # (N//2, K) int8, pack_int4_rows format
    input_scale: jax.Array,  # (M,) fp
    weight_scale: jax.Array, # (N,) fp
    out_dtype=jnp.bfloat16,
    bm: int = 256,
    bn: int = 512,
    bk: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """out[m, n] = (sum_k x[m,k]·unpack(w)[n,k]) · input_scale[m] · weight_scale[n]."""
    M, K = x.shape
    N = w_packed.shape[0] * 2
    bm = min(bm, M)
    bn = min(bn, N)
    while N % bn:  # e.g. vocab-sized N = 128 * prime
        bn -= BN
    if bk is None:
        bk = _pick_bk(K)
    bk = min(bk, K)
    if M % bm or K % bk or N % bn or bn % BN or bm % 8 or bk % 128:
        raise ValueError(f"unsupported int4 gemm geometry M={M} K={K} N={N} "
                         f"bm={bm} bn={bn} bk={bk}")
    k_chunks = K // bk
    groups = bn // BN
    is_row = input_scale.astype(jnp.float32).reshape(1, M)
    ws_row = weight_scale.astype(jnp.float32).reshape(1, N)

    kernel = pl.pallas_call(
        functools.partial(_int4_mm_kernel, k_chunks=k_chunks, groups=groups),
        grid=(M // bm, N // bn, k_chunks),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn // 2, bk), lambda i, j, k: (j, k)),
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
            bytes_accessed=M * K + K * N // 2 + M * N * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )
    return kernel(x, w_packed, is_row, ws_row)
