"""Pallas TPU kernels: Mamba-style causal conv1d forward AND backward.

Training-tier analogue of the reference's TTX conv kernel pair
(reference backends/ttx/functions/convolution.py +
backends/ttx/kernels/npu/a2/convolution.py:1 — 818 LoC): a
``jax.custom_vjp`` whose forward is one fused depthwise-conv(+bias)
(+silu) pass and whose backward is one recompute kernel emitting dx and
the (W, D) / (D,) weight-gradient accumulators in the same VMEM pass.

Why not ``lax.conv_general_dilated``: XLA lowers depthwise conv with
``feature_group_count=D`` through grouped-convolution machinery, where
the causal depthwise form is really W shifted fused multiply-adds over
(T, D) rows.  The kernels below stream row blocks once; halo rows (the
W-1 tokens crossing each block boundary — both directions for the
backward, which needs FUTURE dz rows) are pre-gathered on the host into
(B, nblk, P, D) side arrays so the kernel body stays branchless.

Layout: tokens on the sublane axis, channels on the lane axis
(D % 128 == 0 gated by the function tier); the weight is passed
transposed and zero-padded to (P, D) so every operand is lane-aligned.

Semantics (matches core/operators/convolution.py `causal_conv1d`):
    stream = [state rows -(W-1)..-1] ++ x
    out[t] = act( bias + sum_w stream[t + w] * k[w] )     k[W-1] = newest
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.backends.pallas.kernels._compat import mosaic_f16_compat


def _pick_block(D: int) -> int:
    # backward holds ~8 fp32 row-block temps (xe, ge, z, dz, dx + streams)
    budget = 6 * 1024 * 1024
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if cand * D * 4 * 8 <= budget:
            return cand
    return 8


def _halo_rows(W: int) -> int:
    """Sublane-aligned halo depth covering the W-1 boundary rows."""
    return max(8, ((W - 1 + 7) // 8) * 8)


def _gather_halo(x, starts, P, T_valid, state=None):
    """(B, Tp, D) -> (B, nblk, P, D); rows outside [0, T_valid) come from
    ``state`` (stream rows -(W-1)..-1, shape (B, W-1, D)) or zero."""
    idx = starts[:, None] + jnp.arange(P, dtype=jnp.int32)  # (nblk, P)
    safe = jnp.clip(idx, 0, x.shape[1] - 1)
    g = jnp.where(((idx >= 0) & (idx < T_valid))[None, :, :, None],
                  x[:, safe], 0)
    if state is not None and state.shape[1] > 0:
        sidx = idx + state.shape[1]
        suse = (idx < 0) & (sidx >= 0)
        sg = state[:, jnp.clip(sidx, 0, state.shape[1] - 1)].astype(x.dtype)
        g = jnp.where(suse[None, :, :, None], sg, g)
    return g


def _silu_grad(z):
    sig = jax.nn.sigmoid(z)
    return sig * (1.0 + z * (1.0 - sig))


def _fwd_kernel(x_ref, h_ref, w_ref, b_ref, o_ref, *, W: int, act: bool):
    blk = x_ref.shape[1]
    P = h_ref.shape[2]
    x = x_ref[0].astype(jnp.float32)          # (blk, D)
    h = h_ref[0, 0].astype(jnp.float32)       # (P, D)
    # ext[r] = stream row tb - (W-1) + r; out[t] = sum_w ext[t + w] * k[w]
    ext = jnp.concatenate([h[P - (W - 1):], x], axis=0) if W > 1 else x
    acc = jnp.broadcast_to(b_ref[...].astype(jnp.float32)[None], x.shape)
    for w in range(W):
        acc = acc + ext[w: w + blk] * w_ref[w].astype(jnp.float32)[None]
    if act:
        acc = acc * jax.nn.sigmoid(acc)
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(x_ref, hb_ref, hf_ref, g_ref, gf_ref, w_ref, b_ref,
                dx_ref, dw_ref, db_ref, *, W: int, act: bool):
    blk = x_ref.shape[1]
    P = hb_ref.shape[2]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    if W > 1:
        hb = hb_ref[0, 0].astype(jnp.float32)
        hf = hf_ref[0, 0].astype(jnp.float32)
        gf = gf_ref[0, 0].astype(jnp.float32)
        # xe[r] = x row tb - (W-1) + r; ge[r] = dout row tb + r
        xe = jnp.concatenate([hb[P - (W - 1):], x, hf[: W - 1]], axis=0)
        ge = jnp.concatenate([g, gf[: W - 1]], axis=0)
    else:
        xe, ge = x, g
    E = blk + W - 1
    if act:
        z = jnp.broadcast_to(b_ref[...].astype(jnp.float32)[None], ge.shape)
        for w in range(W):
            z = z + xe[w: w + E] * w_ref[w].astype(jnp.float32)[None]
        dz = ge * _silu_grad(z)
    else:
        dz = ge
    # dx[j] = sum_w dz[j + (W-1) - w] * k[w]   (anti-causal correlation)
    dx = jnp.zeros_like(x)
    for w in range(W):
        dx = dx + dz[(W - 1) - w: (W - 1) - w + blk] * \
            w_ref[w].astype(jnp.float32)[None]
    dx_ref[0] = dx.astype(dx_ref.dtype)
    # each global token t is accumulated by exactly one block (its own)
    dzc = dz[:blk]
    for w in range(W):
        dw_ref[w] += jnp.sum(dzc * xe[w: w + blk], axis=0)
    db_ref[...] += jnp.sum(dzc, axis=0)


def _prep_weight(weight):
    """(D, W) -> lane-aligned transposed (P, D), zero-padded taps."""
    D, W = weight.shape
    P = _halo_rows(max(W + 1, 2))
    return jnp.zeros((P, D), weight.dtype).at[:W].set(weight.T), P


@mosaic_f16_compat
def _run_fwd(x, wT, bias, state, *, W: int, act: bool, interpret: bool):
    B, T, D = x.shape
    P = wT.shape[0]
    blk = _pick_block(D)
    Tp = ((T + blk - 1) // blk) * blk
    xp = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else x
    nblk = Tp // blk
    starts = jnp.arange(nblk, dtype=jnp.int32) * blk - P
    halo = _gather_halo(xp, starts, P, T, state)
    if bias is None:
        bias = jnp.zeros((D,), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, W=W, act=act),
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec((1, blk, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, D), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), x.dtype),
        interpret=interpret,
    )(xp, halo, wT, bias)
    return out[:, :T] if Tp != T else out


@mosaic_f16_compat
def _run_bwd(x, wT, state, g, bias, *, W: int, act: bool, interpret: bool):
    B, T, D = x.shape
    P = wT.shape[0]
    if bias is None:
        bias = jnp.zeros((D,), jnp.float32)
    blk = _pick_block(D)
    Tp = ((T + blk - 1) // blk) * blk
    pad = Tp - T
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    gp = jnp.pad(g, ((0, 0), (0, pad), (0, 0))) if pad else g
    nblk = Tp // blk
    idx = jnp.arange(nblk, dtype=jnp.int32)
    h_back = _gather_halo(xp, idx * blk - P, P, T, state)
    h_fwd_x = _gather_halo(xp, (idx + 1) * blk, P, T)
    h_fwd_g = _gather_halo(gp, (idx + 1) * blk, P, T)
    row = pl.BlockSpec((1, blk, D), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    hal = pl.BlockSpec((1, 1, P, D), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, W=W, act=act),
        grid=(B, nblk),
        in_specs=[
            row, hal, hal, row, hal,
            pl.BlockSpec((P, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            row,
            pl.BlockSpec((P, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, D), x.dtype),
            jax.ShapeDtypeStruct((P, D), jnp.float32),
            jax.ShapeDtypeStruct((D,), jnp.float32),
        ],
        interpret=interpret,
    )(xp, h_back, h_fwd_x, gp, h_fwd_g, wT, bias)
    return (dx[:, :T] if pad else dx), dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv1d_train(x, weight, bias, state, act: bool, interpret: bool = False):
    """Differentiable fused causal depthwise conv1d (+bias)(+silu).

    x (B, T, D) float; weight (D, W); bias (D,) or None; state
    (B, W-1, D) initial stream rows (zeros for a fresh sequence).
    Returns the activated conv output (B, T, D) in x.dtype; the residual
    add and final-state slice live OUTSIDE this vjp (plain autodiff).
    """
    wT, _ = _prep_weight(weight)
    return _run_fwd(x, wT, bias, state, W=weight.shape[1], act=act,
                    interpret=interpret)


def _conv1d_fwd(x, weight, bias, state, act, interpret):
    out = conv1d_train(x, weight, bias, state, act, interpret)
    return out, (x, weight, state, bias)


def _conv1d_bwd(act, interpret, res, g):
    x, weight, state, bias = res
    has_bias = bias is not None
    D, W = weight.shape
    wT, _ = _prep_weight(weight)
    dx, dwP, db = _run_bwd(x, wT, state, g.astype(x.dtype), bias,
                           W=W, act=act, interpret=interpret)
    dw = dwP[:W].T.astype(weight.dtype)  # (D, W)
    # dstate: stream row s in [0, W-1) feeds out[t] via tap w = s - t,
    # t in [max(0, s-W+1), min(s, T-1)] — recompute dz for the first W-1
    # outputs on the host (a (B, <=W-1, D) sliver)
    if W > 1 and state.shape[1] > 0:
        T = x.shape[1]
        n = min(W - 1, T)
        kT = weight.T.astype(jnp.float32)  # (W, D)
        gf = g[:, :n].astype(jnp.float32)
        if act:
            stream = jnp.concatenate(
                [state.astype(jnp.float32), x[:, :n].astype(jnp.float32)],
                axis=1)  # stream rows -(W-1)..n-1
            z = (jnp.zeros_like(gf) if bias is None
                 else jnp.broadcast_to(
                     bias.astype(jnp.float32)[None, None], gf.shape))
            for w in range(W):
                z = z + stream[:, w: w + n] * kT[w][None, None]
            dz0 = gf * _silu_grad(z)
        else:
            dz0 = gf
        ds_rows = []
        for s in range(W - 1):
            acc = jnp.zeros_like(dz0[:, 0])
            for t in range(max(0, s - W + 1), min(s + 1, n)):
                acc = acc + dz0[:, t] * kT[s - t][None]
            ds_rows.append(acc)
        ds = jnp.stack(ds_rows, axis=1).astype(state.dtype)
    else:
        ds = jnp.zeros_like(state)
    return (dx, dw, db.astype(weight.dtype) if has_bias else None, ds)


conv1d_train.defvjp(_conv1d_fwd, _conv1d_bwd)
