"""Pallas TPU kernels: RMSNorm forward AND backward (training tier).

Second hand-written training kernel pair (after flce.py), the analogue
of the reference's TTX rmsnorm fwd+bwd functions
(backends/ttx/functions/ + backends/ttx/kernels/npu/a2/rmsnorm.py):
a ``jax.custom_vjp`` whose forward reuses the single-pass Mosaic rmsnorm
kernel (norms.py) and whose backward is one fused recompute kernel —
x and dy are read once from HBM and both gradients come out of the same
VMEM pass:

    g    = dy * w                                    (fp32)
    rstd = rsqrt(mean(x^2) + eps)                    (recomputed: cheaper
                                                      than saving T fp32
                                                      rows for bf16 x)
    dx   = rstd * g - rstd^3 * x * mean(g * x)
    dw  += sum(dy * x * rstd, rows)                  (fp32 accumulator
                                                      across the row-block
                                                      grid, sequential on
                                                      TPU)

Autodiff-of-golden materializes x_hat and the two reductions as separate
HLO ops; the fused pass is HBM-minimal: 3 row-block streams in, 1 out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.backends.pallas.kernels._compat import mosaic_f16_compat
from mojo_opset_tpu.backends.pallas.kernels.norms import _row_block, rmsnorm


def _bwd_kernel(x_ref, w_ref, dy_ref, dx_ref, dw_ref, *, eps: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)

    rstd = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    g = dy * w[None, :]
    s = jnp.mean(g * x, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * g - (rstd * rstd * rstd) * x * s).astype(dx_ref.dtype)
    dw_ref[...] += jnp.sum(dy * (x * rstd), axis=0)


def _rmsnorm_bwd_pallas(x2, weight, dy2, eps: float, interpret: bool):
    T, D = x2.shape
    blk = _row_block(T, D, n_io=3)
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(T // blk,),
        in_specs=[
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, D), x2.dtype),
            jax.ShapeDtypeStruct((D,), jnp.float32),
        ],
        interpret=interpret,
    )(x2, weight, dy2)
    return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rmsnorm_vjp(x: jax.Array, weight: jax.Array, eps: float,
                interpret: bool = False) -> jax.Array:
    """Differentiable RMSNorm on the Mosaic kernels; output dtype = x dtype."""
    return rmsnorm(x, weight, eps, interpret)


def _fwd(x, weight, eps, interpret):
    return rmsnorm(x, weight, eps, interpret), (x, weight)


@mosaic_f16_compat
def _bwd_compat(x, weight, dy, *, eps, interpret):
    D = x.shape[-1]
    dx, dw = _rmsnorm_bwd_pallas(
        x.reshape(-1, D), weight, dy.reshape(-1, D), eps, interpret)
    return dx.reshape(x.shape), dw


def _bwd(eps, interpret, res, dy):
    x, weight = res
    dx, dw = _bwd_compat(x, weight, dy.astype(x.dtype), eps=eps,
                         interpret=interpret)
    return dx, dw.astype(weight.dtype)


rmsnorm_vjp.defvjp(_fwd, _bwd)
