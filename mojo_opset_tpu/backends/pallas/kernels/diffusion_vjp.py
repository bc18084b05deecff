"""Pallas TPU kernels: trainable dense attention with an ARBITRARY mask.

Training-tier analogue of the reference's diffusion-attention kernel
(reference backends/ttx/kernels/npu/a2/diffution_attention.py:1 — 1,830
LoC, wired through experimental/functions/diffusion_attention.py): text-
diffusion models train attention under block-diffusion masks that are
neither causal nor windowed, so the mask cannot be recomputed from
per-tile scalars the way flash_vjp.py does — instead the (S, S) boolean
keep-mask is streamed tile-by-tile beside the score tiles (as int8: the
Mosaic memory path has no packed i1 layout).

Same FlashAttention-2 shape as flash_vjp.py otherwise: online-softmax
forward saving (o, lse); backward = dq kernel (q tiles outer) + dk/dv
kernel (kv tiles outer, per-q-head partials reduced over the GQA group
on the host).  Fully-masked rows produce o = 0 and an lse sentinel, so
block-diffusion masks with empty prefix rows are safe.

Contract: q (B, Hq, S, D), k/v (B, Hkv, S, D) with Hq % Hkv == 0
(grouped heads repeat AABB like MojoSdpa's enable_gqa), mask (S, S)
bool keep-mask broadcast over batch and heads.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_EMPTY_LSE = 1e30


def _fwd_kernel(
    q_ref, k_ref, v_ref, m_ref,  # (1,bq,D) (1,bk,D) (1,bk,D) (bq,bk) int8
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, nk, scale,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    keep = m_ref[...] != 0
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = jnp.where(keep, s, _NEG)
    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(keep, jnp.exp(s - m_new), 0.0)
    l_scr[...] = jnp.broadcast_to(
        l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
    )
    v = v_ref[0].astype(jnp.float32)
    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        m = m_scr[:, :1]
        out = acc_scr[...] / jnp.maximum(l, 1e-38)
        o_ref[0] = jnp.where(l > 0, out, 0.0).astype(o_ref.dtype)
        lse_ref[0] = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-38)), _EMPTY_LSE)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, m_ref,
    dq_ref, dq_scr,
    *, nk, scale,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    keep = m_ref[...] != 0
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.where(keep, jnp.exp(s - lse_ref[0]), 0.0)
    do = do_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_ref[0])
    dq_scr[...] += scale * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(
    k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, mt_ref,  # mt: (bk,bq)
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, nq, scale,
):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    keep = mt_ref[...] != 0
    k = k_ref[0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32) * scale
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bk, bq)
    p_t = jnp.where(keep, jnp.exp(s_t - lse_ref[0]), 0.0)
    do = do_ref[0].astype(jnp.float32)
    dv_scr[...] += jax.lax.dot_general(
        p_t, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    v = v_ref[0].astype(jnp.float32)
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds_t = p_t * (dp_t - delta_ref[0])
    dk_scr[...] += jax.lax.dot_general(
        ds_t, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _prep(q, k, v, mask, bq, bk):
    B, Hq, S, D = q.shape
    Hkv = k.shape[1]
    bq = min(bq, max(8, -(-S // 8) * 8))
    bk = min(bk, max(128, -(-S // 128) * 128))
    Sqp = -(-S // bq) * bq
    Skp = -(-S // bk) * bk
    pad_q = ((0, 0), (0, 0), (0, Sqp - S), (0, 0))
    pad_k = ((0, 0), (0, 0), (0, Skp - S), (0, 0))
    qf = jnp.pad(q, pad_q).reshape(B * Hq, Sqp, D)
    kf = jnp.pad(k, pad_k).reshape(B * Hkv, Skp, D)
    vf = jnp.pad(v, pad_k).reshape(B * Hkv, Skp, D)
    m8 = jnp.pad(mask.astype(jnp.int8), ((0, Sqp - S), (0, Skp - S)))
    return qf, kf, vf, m8, bq, bk, Sqp, Skp


def _fwd_call(q, k, v, mask, scale, bq, bk, interpret):
    B, Hq, S, D = q.shape
    Hkv = k.shape[1]
    group = Hq // Hkv
    qf, kf, vf, m8, bq, bk, Sqp, Skp = _prep(q, k, v, mask, bq, bk)
    nq, nk = Sqp // bq, Skp // bk

    def kv_idx(g, i, j):
        return ((g // Hq) * Hkv + (g % Hq) // group, j, 0)

    o_f, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, nk=nk, scale=scale),
        grid=(B * Hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, bk, D), kv_idx),
            pl.BlockSpec((1, bk, D), kv_idx),
            pl.BlockSpec((bq, bk), lambda g, i, j: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda g, i, j: (g, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * Hq, Sqp, D), q.dtype),
            jax.ShapeDtypeStruct((B * Hq, Sqp, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf, m8)
    o = o_f.reshape(B, Hq, Sqp, D)[:, :, :S]
    return o, lse


def _bwd_call(q, k, v, o, lse, do, mask, scale, bq, bk, interpret):
    B, Hq, S, D = q.shape
    Hkv = k.shape[1]
    group = Hq // Hkv
    qf, kf, vf, m8, bq, bk, Sqp, Skp = _prep(q, k, v, mask, bq, bk)
    nq, nk = Sqp // bq, Skp // bk
    dof = jnp.pad(do, ((0, 0), (0, 0), (0, Sqp - S), (0, 0))).reshape(
        B * Hq, Sqp, D)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Sqp - S))).reshape(
        B * Hq, Sqp, 1)
    delta_row = jnp.swapaxes(delta, 1, 2)
    lse_row = jnp.swapaxes(lse, 1, 2)

    def kv_idx(g, i, j):
        return ((g // Hq) * Hkv + (g % Hq) // group, j, 0)

    dq_f = pl.pallas_call(
        functools.partial(_dq_kernel, nk=nk, scale=scale),
        grid=(B * Hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, bk, D), kv_idx),
            pl.BlockSpec((1, bk, D), kv_idx),
            pl.BlockSpec((1, bq, D), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((bq, bk), lambda g, i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda g, i, j: (g, i, 0)),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((B * Hq, Sqp, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf, dof, lse, delta, m8)

    def kv_idx2(g, j, i):
        return ((g // Hq) * Hkv + (g % Hq) // group, j, 0)

    m8t = m8.T  # (Skp, Sqp) for the kv-tile orientation
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_dkv_kernel, nq=nq, scale=scale),
        grid=(B * Hq, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bk, D), kv_idx2),
            pl.BlockSpec((1, bk, D), kv_idx2),
            pl.BlockSpec((1, bq, D), lambda g, j, i: (g, i, 0)),
            pl.BlockSpec((1, bq, D), lambda g, j, i: (g, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda g, j, i: (g, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda g, j, i: (g, 0, i)),
            pl.BlockSpec((bk, bq), lambda g, j, i: (j, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda g, j, i: (g, j, 0)),
            pl.BlockSpec((1, bk, D), lambda g, j, i: (g, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * Hq, Skp, D), jnp.float32),
            jax.ShapeDtypeStruct((B * Hq, Skp, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kf, vf, qf, dof, lse_row, delta_row, m8t)

    dq = dq_f.reshape(B, Hq, Sqp, D)[:, :, :S]
    dk = dk_h.reshape(B, Hkv, group, Skp, D).sum(axis=2)[:, :, :S].astype(k.dtype)
    dv = dv_h.reshape(B, Hkv, group, Skp, D).sum(axis=2)[:, :, :S].astype(v.dtype)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_diffusion(
    q: jax.Array,  # (B, Hq, S, D)
    k: jax.Array,  # (B, Hkv, S, D)
    v: jax.Array,
    mask: jax.Array,  # (S, S) bool keep-mask
    scale: float = 1.0,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    o, _ = _fwd_call(q, k, v, mask, scale, block_q, block_k, interpret)
    return o


def _fd_fwd(q, k, v, mask, scale, block_q, block_k, interpret):
    o, lse = _fwd_call(q, k, v, mask, scale, block_q, block_k, interpret)
    return o, (q, k, v, o, lse, mask)


def _fd_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, o, lse, mask = res
    dq, dk, dv = _bwd_call(q, k, v, o, lse, do, mask, scale,
                           block_q, block_k, interpret)
    zm = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, zm


flash_diffusion.defvjp(_fd_fwd, _fd_bwd)
