"""Pallas TPU kernels: single-pass fused normalization family.

Replaces the reference TTX Triton kernels rmsnorm.py / layernorm.py /
fused_add_{rms,layer}norm.py (backends/ttx/kernels/npu/a2/) with Mosaic
kernels: one VMEM pass per row block computes the statistics in fp32 and
writes normalized (+ residual / + int8-quantized) outputs without
round-tripping HBM between the fused stages.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.backends.pallas.kernels._compat import mosaic_f16_compat


def _row_block(T: int, D: int = 0, n_io: int = 2) -> int:
    """Largest row block whose VMEM footprint stays inside the ~16 MB
    scoped budget: n_io 2-byte IO buffers plus fp32 temps per row block.
    (blk=256, D=4096, n_io=4 was observed to exceed the 16 MB limit.)"""
    budget = 4 * 1024 * 1024
    for cand in (256, 128, 64, 32, 16, 8):
        if T % cand == 0 and (D == 0 or cand * D * 2 * n_io <= budget):
            return cand
    return T


# -- rmsnorm -----------------------------------------------------------


def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    normed = x * jax.lax.rsqrt(var + eps)
    o_ref[...] = (normed * w_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@mosaic_f16_compat
def rmsnorm(x: jax.Array, weight: jax.Array, eps: float, interpret: bool = False) -> jax.Array:
    orig_shape = x.shape
    D = orig_shape[-1]
    x2 = x.reshape(-1, D)
    T = x2.shape[0]
    blk = _row_block(T, D, n_io=2)
    out = pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        grid=(T // blk,),
        in_specs=[
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), x.dtype),
        interpret=interpret,
    )(x2, weight)
    return out.reshape(orig_shape)


# -- residual add + rmsnorm -------------------------------------------


def _add_rmsnorm_kernel(x_ref, r_ref, w_ref, o_ref, res_ref, *, eps: float, norm_pos: str):
    x = x_ref[...].astype(jnp.float32)
    r = r_ref[...].astype(jnp.float32)
    s = x + r
    var = jnp.mean(s * s, axis=-1, keepdims=True)
    normed = s * jax.lax.rsqrt(var + eps) * w_ref[...].astype(jnp.float32)
    o_ref[...] = normed.astype(o_ref.dtype)
    if norm_pos == "pre":
        res_ref[...] = s.astype(res_ref.dtype)
    else:
        res_ref[...] = normed.astype(res_ref.dtype)


@mosaic_f16_compat
def residual_add_rmsnorm(
    hidden: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    eps: float,
    norm_pos: str = "pre",
    interpret: bool = False,
):
    orig_shape = hidden.shape
    D = orig_shape[-1]
    x2 = hidden.reshape(-1, D)
    r2 = residual.reshape(-1, D)
    T = x2.shape[0]
    blk = _row_block(T, D, n_io=4)
    out, res = pl.pallas_call(
        functools.partial(_add_rmsnorm_kernel, eps=eps, norm_pos=norm_pos),
        grid=(T // blk,),
        in_specs=[
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, D), hidden.dtype),
            jax.ShapeDtypeStruct((T, D), hidden.dtype),
        ],
        interpret=interpret,
    )(x2, r2, weight)
    return out.reshape(orig_shape), res.reshape(orig_shape)


# -- rmsnorm + dynamic per-token int8 quant ----------------------------


def _rmsnorm_quant_kernel(x_ref, w_ref, q_ref, s_ref, *, eps: float, q_max: float, q_min: float):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    normed = x * jax.lax.rsqrt(var + eps) * w_ref[...].astype(jnp.float32)
    scale = jnp.clip(jnp.max(jnp.abs(normed), axis=-1, keepdims=True), min=1e-12) / q_max
    q = jnp.clip(jnp.round(normed / scale), q_min, q_max)
    q_ref[...] = q.astype(q_ref.dtype)
    s_ref[...] = jnp.broadcast_to(scale, s_ref.shape)


@mosaic_f16_compat
def rmsnorm_quant(
    x: jax.Array, weight: jax.Array, eps: float, q_min: float, q_max: float,
    quant_dtype=jnp.int8, interpret: bool = False,
):
    orig_shape = x.shape
    D = orig_shape[-1]
    x2 = x.reshape(-1, D)
    T = x2.shape[0]
    blk = _row_block(T, D, n_io=3)
    q, s = pl.pallas_call(
        functools.partial(_rmsnorm_quant_kernel, eps=eps, q_max=q_max, q_min=q_min),
        grid=(T // blk,),
        in_specs=[
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, D), quant_dtype),
            jax.ShapeDtypeStruct((T, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x2, weight)
    return q.reshape(orig_shape), s[:, :1].reshape(orig_shape[:-1] + (1,))
