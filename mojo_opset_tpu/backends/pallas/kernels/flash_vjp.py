"""Pallas TPU kernels: trainable varlen GQA/SWA flash attention (fwd + bwd).

The training-tier counterpart of the reference's largest kernel family —
the hand-written sliding-window-attention forward/backward pair
(reference backends/ttx/kernels/npu/a2/swa.py:1, 2771 LoC, wired through
backends/ttx/functions/attention.py TTXSWAFunction).  Same contract
(packed varlen q/k/v + cu_q_lens/cu_total_seq_lens, GQA AABB grouping,
causal + local/global windows), redesigned for the MXU:

  * arrays are transposed once to head-major ``(H, T, D)`` so every tile
    is a clean ``(block, D)`` MXU operand (the reference's Triton kernels
    index strided ``(T, H, D)`` directly; on TPU that wastes lanes);
  * per-token sequence membership / positions are NOT materialized as
    O(T) side arrays — each tile recomputes them from the two cu_lens
    scalar-prefetch vectors with a static loop over the (small) batch;
  * forward is online-softmax with an f32 carry, saving the row
    logsumexp ``(H, T, 1)`` as the only residual beside ``o`` — the
    backward recomputes p = exp(s - lse) FlashAttention-2 style;
  * backward is two kernels: dq (grid over q tiles, kv innermost) and
    dk/dv (grid over kv tiles, q innermost, per-q-head partials reduced
    over the GQA group outside the kernel);
  * causal tile skipping: when ``cu_q_lens is cu_total_seq_lens`` the
    global token order aligns with in-sequence positions, so tiles
    strictly above the diagonal (and, without a global window, tiles
    further below it than the local window) are skipped.

Assembled as a ``jax.custom_vjp`` (:func:`flash_swa`); the golden tier
remains the autodiff oracle (tests/accuracy/functions/test_swa_vjp_pallas.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_EMPTY_LSE = 1e30  # lse sentinel for fully-masked rows: exp(s - 1e30) == 0


# -- per-tile sequence metadata from the cu_lens scalars ------------------


def _q_meta(tok, cu_q_ref, cu_k_ref, B):
    """(seg, q_abs) for q-token global ids ``tok`` (any broadcastable shape).

    q_abs is the absolute kv position of the query row:
    ``kv_len[seg] - q_len[seg] + (tok - cu_q[seg])`` — matches the golden
    MojoSWA bookkeeping (core/operators/attention.py:601-607).
    """
    # seg via selects, NOT bool->int converts: with B == 2 Mosaic folds
    # eq(convert(i1), convert(i1)) into a cmpi on i1 vectors, which it
    # then fails to legalize
    seg = jnp.zeros_like(tok)
    for b in range(1, B):
        seg = jnp.where(tok >= cu_q_ref[b], b, seg)
    q_abs = tok
    for b in range(B):
        off = (cu_k_ref[b + 1] - cu_k_ref[b]) - (cu_q_ref[b + 1] - cu_q_ref[b]) - cu_q_ref[b]
        q_abs = jnp.where(seg == b, tok + off, q_abs)
    return seg, q_abs


def _k_meta(tok, cu_k_ref, B):
    """(seg, k_pos) for kv-token global ids ``tok``."""
    seg = jnp.zeros_like(tok)
    for b in range(1, B):
        seg = jnp.where(tok >= cu_k_ref[b], b, seg)  # see _q_meta on why not +=
    pos = tok
    for b in range(B):
        pos = jnp.where(seg == b, tok - cu_k_ref[b], pos)
    return seg, pos


def _keep_mask(qseg, qabs, qtok, kseg, kpos, ktok, Tq, Tk, causal, lws, gws):
    """Boolean attend-mask; broadcasting of the q/k vectors gives the tile
    orientation ((bq,1)x(1,bk) in fwd/dq, (1,bq)x(bk,1) in dk/dv).

    Matches the golden: same-batch AND (if causal) window_mask_rows
    (core/operators/attention.py:113-139) — windows only apply when
    causal, and local/global windows OR together under the causal bound.
    """
    keep = (qseg == kseg) & (qtok < Tq) & (ktok < Tk)
    if causal:
        keep &= qabs >= kpos
        if lws is not None or gws is not None:
            win = (
                qabs <= kpos + lws
                if lws is not None
                else jnp.zeros_like(keep)
            )
            if gws is not None:
                win |= kpos < gws
            keep &= win
    return keep


def _tile_possible(i, j, bq, bk, causal, lws, gws, aligned):
    """Conservative can-this-tile-contribute predicate (True = run).

    Only valid when ``aligned`` (cu_q_lens is cu_total_seq_lens): then
    q_abs - k_pos == qtok - ktok for every same-sequence pair, so tiles
    strictly above the global diagonal are fully causal-masked, and
    (when no global window rescues early keys) tiles further below it
    than the local window are fully window-masked.
    """
    if not (aligned and causal):
        return None
    run = j * bk <= i * bq + (bq - 1)
    if lws is not None and gws is None:
        run &= i * bq - (j * bk + bk - 1) <= lws
    return run


# -- forward kernel --------------------------------------------------------


def _fwd_kernel(
    cu_q_ref, cu_k_ref,  # scalar prefetch (B+1,) int32
    q_ref, k_ref, v_ref,  # (1,bq,D) / (1,bk,D) / (1,bk,D)
    o_ref, lse_ref,  # (1,bq,D) / (1,bq,1)
    m_scr, l_scr, acc_scr,  # (bq,128) f32, (bq,128) f32, (bq,D) f32
    *, B, Tq, Tk, bq, bk, nk, scale, causal, lws, gws, aligned,
):
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def compute():
        qtok = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        ktok = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        qseg, qabs = _q_meta(qtok, cu_q_ref, cu_k_ref, B)
        kseg, kpos = _k_meta(ktok, cu_k_ref, B)
        keep = _keep_mask(qseg, qabs, qtok, kseg, kpos, ktok, Tq, Tk, causal, lws, gws)

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

    run = _tile_possible(i, j, bq, bk, causal, lws, gws, aligned)
    if run is None:
        compute()
    else:
        pl.when(run)(compute)

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        m = m_scr[:, :1]
        out = acc_scr[...] / jnp.maximum(l, 1e-38)
        o_ref[0] = jnp.where(l > 0, out, 0.0).astype(o_ref.dtype)
        lse_ref[0] = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-38)), _EMPTY_LSE)


# -- backward kernels -------------------------------------------------------


def _dq_kernel(
    cu_q_ref, cu_k_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,  # (1,bq,D)(1,bk,D)(1,bk,D)(1,bq,D)(1,bq,1)(1,bq,1)
    dq_ref,  # (1,bq,D)
    dq_scr,  # (bq,D) f32
    *, B, Tq, Tk, bq, bk, nk, scale, causal, lws, gws, aligned,
):
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    def compute():
        qtok = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        ktok = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        qseg, qabs = _q_meta(qtok, cu_q_ref, cu_k_ref, B)
        kseg, kpos = _k_meta(ktok, cu_k_ref, B)
        keep = _keep_mask(qseg, qabs, qtok, kseg, kpos, ktok, Tq, Tk, causal, lws, gws)

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

    run = _tile_possible(i, j, bq, bk, causal, lws, gws, aligned)
    if run is None:
        compute()
    else:
        pl.when(run)(compute)

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(
    cu_q_ref, cu_k_ref,
    k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,  # lse/delta: (1,1,bq)
    dk_ref, dv_ref,  # (1,bk,D) per q head
    dk_scr, dv_scr,  # (bk,D) f32
    *, B, Tq, Tk, bq, bk, nq, scale, causal, lws, gws, aligned,
):
    j, i = pl.program_id(1), pl.program_id(2)  # kv tile outer, q tile inner

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    def compute():
        qtok = i * bq + jax.lax.broadcasted_iota(jnp.int32, (1, bq), 1)
        ktok = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
        qseg, qabs = _q_meta(qtok, cu_q_ref, cu_k_ref, B)
        kseg, kpos = _k_meta(ktok, cu_k_ref, B)
        keep = _keep_mask(qseg, qabs, qtok, kseg, kpos, ktok, Tq, Tk, causal, lws, gws)

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
        )  # (bk, bq)
        ds_t = p_t * (dp_t - delta_ref[0])
        dk_scr[...] += jax.lax.dot_general(
            ds_t, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # q carries the softmax scale

    run = _tile_possible(i, j, bq, bk, causal, lws, gws, aligned)
    if run is None:
        compute()
    else:
        pl.when(run)(compute)

    @pl.when(i == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


# -- host-side assembly ------------------------------------------------------


def _blocks(Tq, Tk, bq, bk):
    bq = min(bq, max(8, -(-Tq // 8) * 8))
    bk = min(bk, max(128, -(-Tk // 128) * 128))
    Tqp = -(-Tq // bq) * bq
    Tkp = -(-Tk // bk) * bk
    return bq, bk, Tqp, Tkp


def _head_major(x, Tp):
    """(T, H, D) -> (H, Tp, D), zero-padded along T."""
    T = x.shape[0]
    xt = jnp.swapaxes(x, 0, 1)
    if Tp != T:
        xt = jnp.pad(xt, ((0, 0), (0, Tp - T), (0, 0)))
    return xt


def _fwd_call(q, k, v, cu_q, cu_k, causal, lws, gws, scale, aligned, bq, bk, interpret):
    Tq, Hq, D = q.shape
    Tk, Hkv, _ = k.shape
    group = Hq // Hkv
    B = cu_q.shape[0] - 1
    bq, bk, Tqp, Tkp = _blocks(Tq, Tk, bq, bk)
    nq, nk = Tqp // bq, Tkp // bk

    qt = _head_major(q, Tqp)
    kt = _head_major(k, Tkp)
    vt = _head_major(v, Tkp)

    kern = functools.partial(
        _fwd_kernel, B=B, Tq=Tq, Tk=Tk, bq=bq, bk=bk, nk=nk, scale=scale,
        causal=causal, lws=lws, gws=gws, aligned=aligned,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda h, i, j, *_: (h, i, 0)),
            pl.BlockSpec((1, bk, D), lambda h, i, j, *_: (h // group, j, 0)),
            pl.BlockSpec((1, bk, D), lambda h, i, j, *_: (h // group, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda h, i, j, *_: (h, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, i, j, *_: (h, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )
    o_pad, lse = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hq, Tqp, D), q.dtype),
            jax.ShapeDtypeStruct((Hq, Tqp, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Hq * Tqp * Tkp * D // (2 if (causal and aligned) else 1),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + nq * (k.size + v.size) * k.dtype.itemsize // max(1, Hkv),
            transcendentals=Hq * Tqp * Tkp,
        ),
    )(cu_q.astype(jnp.int32), cu_k.astype(jnp.int32), qt, kt, vt)

    o = jnp.swapaxes(o_pad[:, :Tq], 0, 1)
    return o, lse  # lse stays padded head-major for the backward


def _bwd_call(q, k, v, o, lse, do, cu_q, cu_k, causal, lws, gws, scale, aligned,
              bq, bk, interpret):
    Tq, Hq, D = q.shape
    Tk, Hkv, _ = k.shape
    group = Hq // Hkv
    B = cu_q.shape[0] - 1
    bq, bk, Tqp, Tkp = _blocks(Tq, Tk, bq, bk)
    nq, nk = Tqp // bq, Tkp // bk

    qt = _head_major(q, Tqp)
    kt = _head_major(k, Tkp)
    vt = _head_major(v, Tkp)
    dot = _head_major(do, Tqp)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # (Tq,Hq)
    delta = jnp.swapaxes(delta, 0, 1)  # (Hq, Tq)
    if Tqp != Tq:
        delta = jnp.pad(delta, ((0, 0), (0, Tqp - Tq)))
    delta_col = delta[..., None]  # (Hq, Tqp, 1) for dq
    delta_row = delta[:, None, :]  # (Hq, 1, Tqp) for dk/dv
    lse_row = jnp.swapaxes(lse, 1, 2)  # (Hq, 1, Tqp)

    cu_q32, cu_k32 = cu_q.astype(jnp.int32), cu_k.astype(jnp.int32)

    dq_kern = functools.partial(
        _dq_kernel, B=B, Tq=Tq, Tk=Tk, bq=bq, bk=bk, nk=nk, scale=scale,
        causal=causal, lws=lws, gws=gws, aligned=aligned,
    )
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda h, i, j, *_: (h, i, 0)),
            pl.BlockSpec((1, bk, D), lambda h, i, j, *_: (h // group, j, 0)),
            pl.BlockSpec((1, bk, D), lambda h, i, j, *_: (h // group, j, 0)),
            pl.BlockSpec((1, bq, D), lambda h, i, j, *_: (h, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, i, j, *_: (h, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, i, j, *_: (h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda h, i, j, *_: (h, i, 0)),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
    )
    dq_pad = pl.pallas_call(
        dq_kern,
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((Hq, Tqp, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(cu_q32, cu_k32, qt, kt, vt, dot, lse, delta_col)

    dkv_kern = functools.partial(
        _dkv_kernel, B=B, Tq=Tq, Tk=Tk, bq=bq, bk=bk, nq=nq, scale=scale,
        causal=causal, lws=lws, gws=gws, aligned=aligned,
    )
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Hq, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bk, D), lambda h, j, i, *_: (h // group, j, 0)),
            pl.BlockSpec((1, bk, D), lambda h, j, i, *_: (h // group, j, 0)),
            pl.BlockSpec((1, bq, D), lambda h, j, i, *_: (h, i, 0)),
            pl.BlockSpec((1, bq, D), lambda h, j, i, *_: (h, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda h, j, i, *_: (h, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda h, j, i, *_: (h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda h, j, i, *_: (h, j, 0)),
            pl.BlockSpec((1, bk, D), lambda h, j, i, *_: (h, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
    )
    dk_h, dv_h = pl.pallas_call(
        dkv_kern,
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hq, Tkp, D), jnp.float32),
            jax.ShapeDtypeStruct((Hq, Tkp, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(cu_q32, cu_k32, kt, vt, qt, dot, lse_row, delta_row)

    dq = jnp.swapaxes(dq_pad[:, :Tq], 0, 1)
    # AABB group reduction: q heads [g*group, (g+1)*group) share kv head g
    dk = dk_h.reshape(Hkv, group, Tkp, D).sum(axis=1)[:, :Tk]
    dv = dv_h.reshape(Hkv, group, Tkp, D).sum(axis=1)[:, :Tk]
    dk = jnp.swapaxes(dk, 0, 1).astype(k.dtype)
    dv = jnp.swapaxes(dv, 0, 1).astype(v.dtype)
    return dq, dk, dv


# -- custom_vjp --------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def flash_swa(
    q: jax.Array,  # (Tq, Hq, D) packed varlen
    k: jax.Array,  # (Tk, Hkv, D)
    v: jax.Array,
    cu_q_lens: jax.Array,  # (B+1,) int32
    cu_total_seq_lens: jax.Array,  # (B+1,) int32
    is_causal: bool = True,
    local_window_size: Optional[int] = None,
    global_window_size: Optional[int] = None,
    softmax_scale: Optional[float] = None,
    aligned: bool = False,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    o, _ = _fwd_call(
        q, k, v, cu_q_lens, cu_total_seq_lens, is_causal,
        local_window_size, global_window_size, scale, aligned,
        block_q, block_k, interpret,
    )
    return o


def _flash_swa_fwd(q, k, v, cu_q_lens, cu_total_seq_lens, is_causal, lws, gws,
                   softmax_scale, aligned, block_q, block_k, interpret):
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    o, lse = _fwd_call(
        q, k, v, cu_q_lens, cu_total_seq_lens, is_causal, lws, gws, scale,
        aligned, block_q, block_k, interpret,
    )
    return o, (q, k, v, o, lse, cu_q_lens, cu_total_seq_lens)


def _flash_swa_bwd(is_causal, lws, gws, softmax_scale, aligned, block_q, block_k,
                   interpret, res, do):
    q, k, v, o, lse, cu_q_lens, cu_total_seq_lens = res
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    dq, dk, dv = _bwd_call(
        q, k, v, o, lse, do, cu_q_lens, cu_total_seq_lens, is_causal, lws, gws,
        scale, aligned, block_q, block_k, interpret,
    )
    zq = np.zeros(cu_q_lens.shape, dtype=jax.dtypes.float0)
    zk = np.zeros(cu_total_seq_lens.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, zq, zk


flash_swa.defvjp(_flash_swa_fwd, _flash_swa_bwd)
