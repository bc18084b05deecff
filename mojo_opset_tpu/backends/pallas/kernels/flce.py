"""Pallas TPU kernels: fused linear + cross-entropy, forward AND backward.

The first hand-written training-tier kernel pair (jax.custom_vjp), the
analogue of the reference's flagship TTX training kernel
(backends/ttx/kernels/npu/a2/fused_linear_cross_entropy.py, 941 LoC,
wired via backends/ttx/functions/).  The (N, V) logits never exist in
HBM in either direction:

forward   one pass over vocab blocks per token block computes the online
          logsumexp, the gathered target logit and the row logit sum
          (for label smoothing) in VMEM; the loss is assembled from these
          three (N,) vectors in plain JAX.
backward  two recompute kernels.  Each rebuilds the logit block
          z = x_blk @ w_blk^T on the MXU, forms the fused gradient

            dz = p * a[:, None] - c[:, None] * ((1-s) * onehot + s/V)

          where p = softmax from the saved lse, a folds the z-loss
          coefficient (a = c + 2*alpha*lse*zc) and c the reduction /
          valid-mask / upstream-cotangent scale, then contracts it
          immediately: dx += dz @ w_blk (vocab-block inner grid) and
          dw += dz^T @ x_blk (token-block inner grid).

Supported configuration (the Pallas dispatch gate; everything else falls
back to the autodiff golden): bias=None, ce_weight=None, reduction in
{mean, sum}, optional softcap / label_smoothing / lse_square_scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.backends.pallas.kernels._compat import mosaic_f16_compat

_NEG_INF = -1e30


def _capped(z, softcap):
    if softcap is None:
        return z
    return jnp.tanh(z / softcap) * softcap


def _col_mask(j, bv, v_actual, bn):
    cols = jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1) + j * bv
    return cols, cols < v_actual


# -- forward: per-token (lse, target_logit, zsum) ------------------------


def _stats_kernel(x_ref, w_ref, t_ref, lse_ref, tl_ref, zs_ref,
                  m_sc, s_sc, tl_sc, zs_sc, *,
                  v_actual: int, softcap):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bn, bv = x_ref.shape[0], w_ref.shape[0]

    @pl.when(j == 0)
    def _():
        m_sc[...] = jnp.full_like(m_sc, _NEG_INF)
        s_sc[...] = jnp.zeros_like(s_sc)
        tl_sc[...] = jnp.zeros_like(tl_sc)
        zs_sc[...] = jnp.zeros_like(zs_sc)

    z = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z = _capped(z, softcap)
    cols, mask = _col_mask(j, bv, v_actual, bn)
    z_lse = jnp.where(mask, z, _NEG_INF)

    m_old = m_sc[:, :1]
    m_new = jnp.maximum(m_old, jnp.max(z_lse, axis=1, keepdims=True))
    s_new = s_sc[:, :1] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(z_lse - m_new), axis=1, keepdims=True)
    m_sc[...] = jnp.broadcast_to(m_new, m_sc.shape)
    s_sc[...] = jnp.broadcast_to(s_new, s_sc.shape)

    t = t_ref[i, :].astype(jnp.int32)
    hit = cols == t[:, None]
    tl_sc[...] += jnp.broadcast_to(
        jnp.sum(jnp.where(hit, z, 0.0), axis=1, keepdims=True), tl_sc.shape)
    zs_sc[...] += jnp.broadcast_to(
        jnp.sum(jnp.where(mask, z, 0.0), axis=1, keepdims=True), zs_sc.shape)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        lse_ref[i, :] = m_sc[:, 0] + jnp.log(s_sc[:, 0])
        tl_ref[i, :] = tl_sc[:, 0]
        zs_ref[i, :] = zs_sc[:, 0]


@mosaic_f16_compat
def flce_stats(x, w, target, softcap=None, bn: int = 256, bv: int = 512,
               interpret: bool = False):
    """(lse, target_logit, zsum) per token; logits stay in VMEM.

    x (N, H), w (V, H), target (N,) int32.  N must be a multiple of bn and
    V of bv (callers pad; padded vocab columns are masked inside).

    Per-token vectors travel as 2-D (N//bn, bn): XLA's 1-D layout for
    s32/f32[N] is tiled T(1024), which a (bn,) Mosaic block cannot match
    (toolchain change caught on-chip, r5); a (1, bn) block of a 2-D
    operand uses the standard (8, 128) tiling and always aligns.
    """
    N, H = x.shape
    V = w.shape[0]
    v_pad = (-V) % bv
    if v_pad:
        w = jnp.pad(w, ((0, v_pad), (0, 0)))
    grid = (N // bn, (V + v_pad) // bv)
    out = pl.pallas_call(
        functools.partial(_stats_kernel, v_actual=V, softcap=softcap),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bv, H), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N // bn, bn), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N // bn, bn), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N // bn, bn), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N // bn, bn), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((N // bn, bn), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((bn, 128), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            # token dim is arbitrary: all steps share the full-array
            # per-token vector blocks (each writes its own row)
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * (V + v_pad),
            bytes_accessed=N * H * x.dtype.itemsize + (V + v_pad) * H * w.dtype.itemsize,
            transcendentals=N * (V + v_pad),
        ),
        interpret=interpret,
    )(x, w, target.astype(jnp.int32).reshape(N // bn, bn))
    return [o.reshape(N) for o in out]


# -- backward: shared dz block ------------------------------------------


def _dz_block(x_blk, w_blk, t, lse, a, c, j, *, v_actual, softcap,
              label_smoothing):
    bn, bv = x_blk.shape[0], w_blk.shape[0]
    z = jax.lax.dot_general(
        x_blk, w_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zc = _capped(z, softcap)
    cols, mask = _col_mask(j, bv, v_actual, bn)
    p = jnp.where(mask, jnp.exp(zc - lse[:, None]), 0.0)
    onehot = (cols == t[:, None]).astype(jnp.float32)
    s = label_smoothing
    dz = p * a[:, None] - c[:, None] * ((1.0 - s) * onehot + s / v_actual * mask)
    if softcap is not None:
        dz = dz * (1.0 - (zc / softcap) ** 2)
    return dz


def _dx_kernel(x_ref, w_ref, t_ref, lse_ref, a_ref, c_ref, dx_ref, acc_sc, *,
               v_actual, softcap, label_smoothing):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_sc[...] = jnp.zeros_like(acc_sc)

    dz = _dz_block(x_ref[...], w_ref[...], t_ref[i, :].astype(jnp.int32),
                   lse_ref[i, :], a_ref[i, :], c_ref[i, :], j,
                   v_actual=v_actual, softcap=softcap,
                   label_smoothing=label_smoothing)
    acc_sc[...] += jnp.dot(dz, w_ref[...].astype(jnp.float32),
                           preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        dx_ref[...] = acc_sc[...].astype(dx_ref.dtype)


def _dw_kernel(x_ref, w_ref, t_ref, lse_ref, a_ref, c_ref, dw_ref, acc_sc, *,
               v_actual, softcap, label_smoothing):
    i = pl.program_id(1)  # token-block inner

    @pl.when(i == 0)
    def _():
        acc_sc[...] = jnp.zeros_like(acc_sc)

    ti = pl.program_id(1)
    dz = _dz_block(x_ref[...], w_ref[...], t_ref[ti, :].astype(jnp.int32),
                   lse_ref[ti, :], a_ref[ti, :], c_ref[ti, :],
                   pl.program_id(0),
                   v_actual=v_actual, softcap=softcap,
                   label_smoothing=label_smoothing)
    acc_sc[...] += jax.lax.dot_general(
        dz, x_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        dw_ref[...] = acc_sc[...].astype(dw_ref.dtype)


@mosaic_f16_compat
def flce_backward(x, w, target, lse, a, c, softcap=None,
                  label_smoothing: float = 0.0, bn: int = 256, bv: int = 512,
                  interpret: bool = False):
    """(dx, dw) for the fused linear+CE. a/c are the per-token gradient
    coefficients (see module docstring); both (N,) float32."""
    N, H = x.shape
    V = w.shape[0]
    # dw's VMEM bill is dominated by the (bv, H) f32 accumulator plus the
    # double-buffered (bv, H) weight/output blocks; at H=2560 a bv of 512
    # overflows the 16M scoped limit by ~1M (measured on-chip, r5
    # toolchain).  Halve bv once H crosses the budget line.
    if H * bv * (4 + 2 * 2 * w.dtype.itemsize) > 12 * 2**20:
        bv = max(bv // 2, 128)
    v_pad = (-V) % bv
    w_p = jnp.pad(w, ((0, v_pad), (0, 0))) if v_pad else w
    vb = (V + v_pad) // bv
    # 2-D (N//bn, bn) per-token vectors: see flce_stats on the 1-D layout
    nb = N // bn
    t = target.astype(jnp.int32).reshape(nb, bn)
    lse2 = lse.reshape(nb, bn)
    a2 = a.reshape(nb, bn)
    c2 = c.reshape(nb, bn)
    common = dict(v_actual=V, softcap=softcap, label_smoothing=label_smoothing)

    dx = pl.pallas_call(
        functools.partial(_dx_kernel, **common),
        grid=(N // bn, vb),
        in_specs=[
            pl.BlockSpec((bn, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bv, H), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H), x.dtype),
        scratch_shapes=[pltpu.VMEM((bn, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * H * (V + v_pad),
            bytes_accessed=N * H * (x.dtype.itemsize * 2) + (V + v_pad) * H * w.dtype.itemsize,
            transcendentals=N * (V + v_pad),
        ),
        interpret=interpret,
    )(x, w_p, t, lse2, a2, c2)

    dw_p = pl.pallas_call(
        functools.partial(_dw_kernel, **common),
        grid=(vb, N // bn),
        in_specs=[
            pl.BlockSpec((bn, H), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bv, H), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bv, H), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V + v_pad, H), w.dtype),
        scratch_shapes=[pltpu.VMEM((bv, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * H * (V + v_pad),
            bytes_accessed=N * H * (x.dtype.itemsize * 2) + (V + v_pad) * H * w.dtype.itemsize * 2,
            transcendentals=N * (V + v_pad),
        ),
        interpret=interpret,
    )(x, w_p, t, lse2, a2, c2)
    return dx, (dw_p[:V] if v_pad else dw_p)


# -- custom_vjp assembly --------------------------------------------------


def _pick_bn(N: int) -> int:
    for cand in (256, 128, 64, 32, 16, 8):
        if N % cand == 0:
            return cand
    return N


def _loss_from_stats(lse, tlog, zsum, target, *, V, ignore_index,
                     lse_square_scale, label_smoothing, reduction):
    valid = target != ignore_index
    s = label_smoothing
    nll = (1.0 - s) * (lse - tlog) + s * (lse - zsum / V)
    nll = jnp.where(valid, nll, 0.0)
    n_valid = jnp.sum(valid)
    if reduction == "mean":
        loss = jnp.sum(nll) / jnp.maximum(n_valid, 1)
    else:
        loss = jnp.sum(nll)
    z_loss = jnp.float32(0.0)
    if lse_square_scale > 0.0:
        lse_v = jnp.where(valid, lse, 0.0)
        z_sum = lse_square_scale * jnp.sum(lse_v * lse_v)
        z_loss = z_sum / jnp.maximum(n_valid, 1) if reduction == "mean" else z_sum
        loss = loss + z_loss
    return loss, z_loss


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def flce(x, w, target, ignore_index=-100, lse_square_scale=0.0,
         label_smoothing=0.0, reduction="mean", softcap=None,
         interpret=False):
    """Fused linear + CE with hand-written Pallas forward and backward.

    Returns (loss, z_loss); logits never materialize in HBM.
    """
    loss, z_loss, _ = _flce_fwd_impl(
        x, w, target, ignore_index, lse_square_scale, label_smoothing,
        reduction, softcap, interpret)
    return loss, z_loss


def _flce_fwd_impl(x, w, target, ignore_index, lse_square_scale,
                   label_smoothing, reduction, softcap, interpret):
    N = x.shape[0]
    bn = _pick_bn(N)
    lse, tlog, zsum = flce_stats(x, w, target, softcap=softcap, bn=bn,
                                 interpret=interpret)
    loss, z_loss = _loss_from_stats(
        lse, tlog, zsum, target, V=w.shape[0], ignore_index=ignore_index,
        lse_square_scale=lse_square_scale, label_smoothing=label_smoothing,
        reduction=reduction)
    return loss, z_loss, lse


def _flce_fwd(x, w, target, ignore_index, lse_square_scale, label_smoothing,
              reduction, softcap, interpret):
    loss, z_loss, lse = _flce_fwd_impl(
        x, w, target, ignore_index, lse_square_scale, label_smoothing,
        reduction, softcap, interpret)
    return (loss, z_loss), (x, w, target, lse)


def _flce_bwd(ignore_index, lse_square_scale, label_smoothing, reduction,
              softcap, interpret, res, g):
    x, w, target, lse = res
    g_loss, g_z = g
    g_loss = g_loss.astype(jnp.float32)
    g_z = g_z.astype(jnp.float32)
    valid = (target != ignore_index).astype(jnp.float32)
    n_valid = jnp.sum(valid)
    if reduction == "mean":
        c = g_loss * valid / jnp.maximum(n_valid, 1)
        zc = (g_loss + g_z) * valid / jnp.maximum(n_valid, 1)
    else:
        c = g_loss * valid
        zc = (g_loss + g_z) * valid
    a = c + 2.0 * lse_square_scale * lse * zc
    bn = _pick_bn(x.shape[0])
    dx, dw = flce_backward(x, w, target, lse, a, c, softcap=softcap,
                           label_smoothing=label_smoothing, bn=bn,
                           interpret=interpret)
    dt = np.zeros(target.shape, dtype=jax.dtypes.float0)
    return dx, dw, dt


flce.defvjp(_flce_fwd, _flce_bwd)
