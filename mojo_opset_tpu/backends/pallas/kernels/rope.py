"""Pallas TPU kernel: rotate-half RoPE application.

Replaces the reference TTX rope kernels
(backends/ttx/kernels/npu/a2/rope.py) as the accelerated tier.  RoPE is
pure HBM streaming; the XLA golden at (32,32,8192,128) bf16 measures
~4.4x the roofline because the fp32 cos/sin tables promote the whole
elementwise chain to fp32 in HBM.  The kernel keeps IO at the tensor
dtype (2 bytes/elem for bf16), computes in fp32 in VMEM, and rotates the
half-lanes in registers — traffic is exactly read(q,k,cos,sin) +
write(q,k).

Two layouts (one kernel each):
  head-first  (B, H, S, D) with cos/sin (S, D) — benchmark/prefill shape
  token-first (T, H, D)  with cos/sin (T, D) — varlen model shape
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.backends.pallas.kernels._compat import mosaic_f16_compat


def _pick_block(n: int, row_bytes: int, budget: int = 2 * 1024 * 1024) -> int:
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n % cand == 0 and cand * row_bytes <= budget:
            return cand
    return n


def _rotate(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _head_first_kernel(x_ref, c_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    c = c_ref[...].astype(jnp.float32)[None]
    s = s_ref[...].astype(jnp.float32)[None]
    o_ref[...] = (x * c + _rotate(x) * s).astype(o_ref.dtype)


def _token_first_kernel(x_ref, c_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    c = c_ref[...].astype(jnp.float32)[:, None, :]
    s = s_ref[...].astype(jnp.float32)[:, None, :]
    o_ref[...] = (x * c + _rotate(x) * s).astype(o_ref.dtype)


@mosaic_f16_compat
def rope_head_first(x: jax.Array, cos: jax.Array, sin: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """x (B, H, S, D), cos/sin (S, D) -> rotated x."""
    B, H, S, D = x.shape
    x3 = x.reshape(B * H, S, D)
    blk = _pick_block(S, D * max(x.dtype.itemsize, 2))
    out = pl.pallas_call(
        _head_first_kernel,
        grid=(B * H, S // blk),
        in_specs=[
            pl.BlockSpec((1, blk, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), x.dtype),
        interpret=interpret,
    )(x3, cos, sin)
    return out.reshape(B, H, S, D)


@mosaic_f16_compat
def rope_token_first(x: jax.Array, cos: jax.Array, sin: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """x (T, H, D), cos/sin (T, D) -> rotated x."""
    T, H, D = x.shape
    blk = _pick_block(T, H * D * max(x.dtype.itemsize, 2))
    return pl.pallas_call(
        _token_first_kernel,
        grid=(T // blk,),
        in_specs=[
            pl.BlockSpec((blk, H, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, H, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, H, D), x.dtype),
        interpret=interpret,
    )(x, cos, sin)
