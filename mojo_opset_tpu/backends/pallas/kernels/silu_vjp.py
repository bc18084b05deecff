"""Pallas TPU kernels: SiLU forward AND backward (training tier).

Completes the reference's six accelerated training-function families
(reference backends/ttx/functions/activation.py TTXSiluFunction +
kernels/npu/a2/silu.py): a ``jax.custom_vjp`` whose forward and
backward are each one streaming VMEM pass.  The backward recomputes
sigmoid(x) from the saved input instead of saving the activation:

    dx = dy * sig(x) * (1 + x * (1 - sig(x)))

Elementwise work at HBM roofline; the win over autodiff-of-golden is
the guaranteed single fused pass (XLA usually fuses this too — the tier
exists for parity with the reference kernel family and for the f16
path, which rides the fp32-upcast compat wrapper).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.backends.pallas.kernels._compat import mosaic_f16_compat
from mojo_opset_tpu.backends.pallas.kernels.norms import _row_block


def _fwd_kernel(x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    o_ref[...] = (x * jax.nn.sigmoid(x)).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dx_ref):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    sig = jax.nn.sigmoid(x)
    dx_ref[...] = (g * sig * (1.0 + x * (1.0 - sig))).astype(dx_ref.dtype)


def _rows(x):
    D = x.shape[-1]
    return x.reshape(-1, D), D


@mosaic_f16_compat
def _silu_fwd_pallas(x, *, interpret: bool):
    x2, D = _rows(x)
    T = x2.shape[0]
    blk = _row_block(T, D, n_io=2)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(T // blk,),
        in_specs=[pl.BlockSpec((blk, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), x.dtype),
        interpret=interpret,
    )(x2)
    return out.reshape(x.shape)


@mosaic_f16_compat
def _silu_bwd_pallas(x, g, *, interpret: bool):
    x2, D = _rows(x)
    g2, _ = _rows(g)
    T = x2.shape[0]
    blk = _row_block(T, D, n_io=3)
    dx = pl.pallas_call(
        _bwd_kernel,
        grid=(T // blk,),
        in_specs=[
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), x.dtype),
        interpret=interpret,
    )(x2, g2)
    return dx.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def silu_vjp(x: jax.Array, interpret: bool = False) -> jax.Array:
    return _silu_fwd_pallas(x, interpret=interpret)


def _fwd(x, interpret):
    return _silu_fwd_pallas(x, interpret=interpret), x


def _bwd(interpret, x, g):
    return (_silu_bwd_pallas(x, g.astype(x.dtype), interpret=interpret),)


silu_vjp.defvjp(_fwd, _bwd)
