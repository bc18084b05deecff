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

_F16_DT = jnp.dtype(jnp.float16)


def _pick_block(n: int, row_bytes: int, budget: int = 2 * 1024 * 1024) -> int:
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n % cand == 0 and cand * row_bytes <= budget:
            return cand
    return n


def _fits(n: int, row_bytes: int, budget: int = 12 * 1024 * 1024) -> bool:
    return _pick_block(n, row_bytes, budget) * row_bytes <= budget


_HEAD_FIRST_BUDGET = 8 * 1024 * 1024


def _head_first_row_bytes(H: int, D: int, dtype) -> int:
    # must mirror rope_head_first's block picker exactly, including the
    # f16 -> f32 upcast performed by mosaic_f16_compat before the picker
    # ever sees the array
    dt = jnp.dtype(dtype)
    if dt == _F16_DT:
        dt = jnp.dtype(jnp.float32)
    return H * D * (2 * max(dt.itemsize, 2) + 8)


def head_first_supported(S: int, H: int, D: int, dtype) -> bool:
    """True iff rope_head_first will tile (·, H, S, D) within its VMEM budget.

    Dispatch guards must call this (not a hand-rolled byte formula): it is
    derived from the same row-bytes expression and budget the kernel's
    block picker uses, so a geometry that passes can never land in
    ``_pick_block``'s blk=S fallback and oversubscribe VMEM.
    """
    row = _head_first_row_bytes(H, D, dtype)
    return _pick_block(S, row, _HEAD_FIRST_BUDGET) * row <= _HEAD_FIRST_BUDGET


def _rotate(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _half_slice(x, c, s, out_dtype):
    """rotate-half as two half-lane FMAs + one concat — measured 3-8%
    faster than materializing rot(x) (tools/exp_rope.py, half=1 rows)."""
    h = x.shape[-1] // 2
    xl, xh = x[..., :h], x[..., h:]
    lo = xl * c[..., :h] - xh * s[..., :h]
    hi = xh * c[..., h:] + xl * s[..., h:]
    return jnp.concatenate([lo, hi], axis=-1).astype(out_dtype)


def _head_first_kernel(x_ref, c_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    c = c_ref[...].astype(jnp.float32)[None, None]
    s = s_ref[...].astype(jnp.float32)[None, None]
    o_ref[...] = _half_slice(x, c, s, o_ref.dtype)


def _token_first_kernel(x_ref, c_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    c = c_ref[...].astype(jnp.float32)[:, None, :]
    s = s_ref[...].astype(jnp.float32)[:, None, :]
    o_ref[...] = _half_slice(x, c, s, o_ref.dtype)


@mosaic_f16_compat
def rope_head_first(x: jax.Array, cos: jax.Array, sin: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """x (B, H, S, D), cos/sin (S, D) -> rotated x.

    Blocks carry ALL heads for one sequence window, and the batch axis is
    the innermost grid dim with an s-indexed cos/sin spec: Pallas skips
    the table re-fetch while the s-block is unchanged, so the fp32 tables
    stream from HBM once per sequence window instead of once per head
    (which cost 268 MB of the 396 MB measured at (32,8192) — the
    difference between 427 µs and the ~205 µs roofline).
    """
    B, H, S, D = x.shape
    # io (2 dtype-width buffers) + fp32 compute temps per (H, blk, D) tile
    blk = _pick_block(S, H * D * (2 * max(x.dtype.itemsize, 2) + 8),
                      budget=8 * 1024 * 1024)
    out = pl.pallas_call(
        _head_first_kernel,
        grid=(S // blk, B),
        in_specs=[
            pl.BlockSpec((1, H, blk, D), lambda j, b: (b, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda j, b: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda j, b: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, blk, D), lambda j, b: (b, 0, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), x.dtype),
        interpret=interpret,
    )(x, cos, sin)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def rope_train(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array,
               interpret: bool = False):
    """Training RoPE (head-first) with a hand-written backward.

    Third kernel pair of the accelerated training-function tier (after
    flce.py and rmsnorm_vjp.py), the analogue of the reference's TTX rope
    fwd+bwd functions (backends/ttx/functions/ +
    backends/ttx/kernels/npu/a2/rope.py).  rotate_half is a rotation
    (R^T = -R = R^{-1}), so the cotangent rule

        dq = g*cos + R^T(g)*sin = g*cos - R(g)*sin

    is the SAME kernel applied with negated sin — forward and backward
    both stream at IO dtype instead of autodiff-of-golden's fp32-promoted
    HBM chain.  cos/sin are positional tables: their grads are zeros.
    """
    qr = rope_head_first(q, cos, sin, interpret=interpret)
    kr = rope_head_first(k, cos, sin, interpret=interpret)
    return qr, kr


def _rope_train_fwd(q, k, cos, sin, interpret):
    return rope_train(q, k, cos, sin, interpret), (cos, sin)


def _rope_train_bwd(interpret, res, g):
    cos, sin = res
    gq, gk = g
    neg = -sin
    dq = rope_head_first(gq, cos, neg, interpret=interpret)
    dk = rope_head_first(gk, cos, neg, interpret=interpret)
    return dq, dk, jnp.zeros_like(cos), jnp.zeros_like(sin)


rope_train.defvjp(_rope_train_fwd, _rope_train_bwd)


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
