"""Pallas TPU kernel: paged decode GQA attention.

Replaces the reference TTX Triton decode kernels
(backends/ttx/kernels/npu/a2/flash_attention.py, mlu fa_paged_decode) with
a Mosaic kernel.  Decode is HBM-bandwidth bound, so the kernel hand-rolls
double-buffered multi-page DMA: per grid step (one batch row x one
"super-block" of ``pages_per_fetch`` pages) it issues whole-page
(Hkv, block_size, D) async copies from the HBM-resident cache into a VMEM
slab laid out (slot, Hkv, P*bs, D), overlapping the next super-block's
fetch with the current one's MXU work.  Block tables and sequence lengths
ride scalar prefetch (SMEM); an online-softmax carry lives in VMEM scratch
across the super-block grid dimension.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.backends.pallas.kernels._compat import mosaic_f16_compat

_NEG = -1e30


def _decode_kernel(
    # scalar prefetch
    seq_lens_ref,  # (B,) int32 SMEM
    block_tables_ref,  # (B, S*P) int32 SMEM
    # inputs
    q_ref,  # (Hkv, group_pad, D) VMEM
    k_hbm,  # (N, Hkv, bs, D) HND / (N, bs, Hkv, D) NHD — ANY/HBM
    v_hbm,  # same layout as k_hbm
    # outputs
    o_ref,  # (Hkv, group_pad, D) VMEM
    # scratch
    kbuf,  # (2, Hkv, P*bs, D) HND / (2, P*bs, Hkv, D) NHD — VMEM
    vbuf,  # same layout as kbuf
    sems,  # DMA sems (2, 2, P)
    m_ref,  # (Hkv*group_pad, 128) f32
    l_ref,  # (Hkv*group_pad, 128) f32
    acc_ref,  # (Hkv, group_pad, D) f32
    *,
    block_size: int,
    pages_per_fetch: int,
    scale: float,
    num_kv_heads: int,
    group_pad: int,
    kv_layout: str,
    local_window: int | None = None,
    global_window: int | None = None,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    B = pl.num_programs(0)
    num_supers = pl.num_programs(1)
    P = pages_per_fetch
    bs = block_size
    g_hi = jnp.int32(global_window) if global_window is not None else jnp.int32(0)

    def row_window(row):
        # sliding/global window: keep = causal ∧ (local ∨ global), i.e.
        # only positions in [seq_len-1-local, seq_len) ∪ [0, global).
        # With only a global window the local branch admits nothing.
        sl = seq_lens_ref[row]
        if local_window is not None:
            lo = jnp.maximum(sl - 1 - local_window, 0)
        elif global_window is not None:
            lo = sl
        else:
            lo = jnp.int32(0)
        return sl, lo

    seq_len, win_lo = row_window(b)

    def page_needed(row, page_pos):
        sl, lo = row_window(row)
        need = page_pos < sl
        if local_window is not None or global_window is not None:
            need &= (page_pos + bs > lo) | (page_pos < g_hi)
        return need

    def start_fetch(row, super_idx, slot):
        for p in range(P):
            page_pos = (super_idx * P + p) * bs

            @pl.when(page_needed(row, page_pos))
            def _():
                blk = block_tables_ref[row, super_idx * P + p]
                blk = jnp.where(blk < 0, 0, blk)
                if kv_layout == "HND":
                    kdst = kbuf.at[slot, :, pl.ds(p * bs, bs), :]
                    vdst = vbuf.at[slot, :, pl.ds(p * bs, bs), :]
                else:  # NHD: page (bs, Hkv, D) -> rows p*bs..+bs of the slab
                    kdst = kbuf.at[slot, pl.ds(p * bs, bs), :, :]
                    vdst = vbuf.at[slot, pl.ds(p * bs, bs), :, :]
                pltpu.make_async_copy(k_hbm.at[blk], kdst, sems.at[slot, 0, p]).start()
                pltpu.make_async_copy(v_hbm.at[blk], vdst, sems.at[slot, 1, p]).start()

    def wait_fetch(super_idx, slot):
        for p in range(P):
            page_pos = (super_idx * P + p) * bs

            @pl.when(page_needed(b, page_pos))
            def _():
                if kv_layout == "HND":
                    kdst = kbuf.at[slot, :, pl.ds(p * bs, bs), :]
                    vdst = vbuf.at[slot, :, pl.ds(p * bs, bs), :]
                else:
                    kdst = kbuf.at[slot, pl.ds(p * bs, bs), :, :]
                    vdst = vbuf.at[slot, pl.ds(p * bs, bs), :, :]
                pltpu.make_async_copy(k_hbm.at[0], kdst, sems.at[slot, 0, p]).wait()
                pltpu.make_async_copy(v_hbm.at[0], vdst, sems.at[slot, 1, p]).wait()

    @pl.when(s == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when((b == 0) & (s == 0))
    def _first_fetch():
        start_fetch(0, 0, 0)

    # slot parity follows the GLOBAL grid step so the double-buffer chain
    # stays consistent across batch-row boundaries
    slot = jax.lax.rem(b * num_supers + s, 2)
    super_start = s * P * bs

    # overlap: kick off the next super-block before consuming this one;
    # at the last super of a row, prefetch the NEXT row's first super
    # (otherwise every batch row restarts the pipeline with a full-latency
    # DMA bubble)
    next_b = jnp.where(s + 1 < num_supers, b, b + 1)
    next_s = jnp.where(s + 1 < num_supers, s + 1, 0)

    @pl.when(next_b < B)
    def _prefetch():
        start_fetch(
            jnp.minimum(next_b, B - 1), next_s,
            jax.lax.rem(b * num_supers + s + 1, 2),
        )

    super_needed = super_start < seq_len
    if local_window is not None or global_window is not None:
        super_needed &= (super_start + P * bs > win_lo) | (super_start < g_hi)

    @pl.when(super_needed)
    def _compute():
        wait_fetch(s, slot)
        # rows of K/V beyond seq_len were never DMA'd (uninitialized VMEM,
        # possibly NaN); zero them so 0-weighted rows can't poison the dot.
        col_pos = super_start + jax.lax.broadcasted_iota(jnp.int32, (P * bs, 1), 0)
        col_valid = col_pos < seq_len
        if local_window is not None or global_window is not None:
            col_valid &= (col_pos >= win_lo) | (col_pos < g_hi)
        if kv_layout == "NHD":
            # Per-head slices of the (P*bs, Hkv, D) slab are sublane-strided
            # (each VMEM tile re-read Hkv times -> ~2x slower end to end).
            # Instead run ONE block-diagonal dot over the contiguous
            # flattened slab: q_bd (Hkv*G, Hkv*D) has q_h on its h-th
            # diagonal block, so q_bd @ kflat^T yields every head's scores
            # in one MXU op; the off-diagonal FLOPs are free in this
            # HBM-bound kernel.  Same trick for PV, extracting the
            # diagonal blocks of the output.
            G = group_pad
            D = q_ref.shape[-1]
            H = num_kv_heads
            vpos = super_start + jax.lax.broadcasted_iota(
                jnp.int32, (H * G, P * bs), 1
            )
            valid = vpos < seq_len
            if local_window is not None or global_window is not None:
                valid &= (vpos >= win_lo) | (vpos < g_hi)
            eye = (
                jax.lax.broadcasted_iota(jnp.int32, (H, 1, H, 1), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (H, 1, H, 1), 2)
            )
            q_bd = jnp.where(
                eye, q_ref[...].astype(jnp.float32)[:, :, None, :], 0.0
            ).reshape(H * G, H * D) * scale
            kflat = kbuf[slot].reshape(P * bs, H * D).astype(jnp.float32)
            sc = jax.lax.dot_general(
                q_bd, kflat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (H*G, P*bs)
            sc = jnp.where(valid, sc, _NEG)
            m_prev = m_ref[:, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(sc, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p_ = jnp.where(valid, jnp.exp(sc - m_new), 0.0)
            l_new = l_ref[:, 0:1] * alpha + jnp.sum(p_, axis=-1, keepdims=True)
            vflat = jnp.where(
                col_valid, vbuf[slot].reshape(P * bs, H * D).astype(jnp.float32), 0.0
            )
            pv = jax.lax.dot_general(
                p_, vflat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (H*G, H*D); head h's output is its diagonal block
            for h in range(H):
                acc_ref[h] = acc_ref[h] * alpha[h * G : (h + 1) * G] + pv[
                    h * G : (h + 1) * G, h * D : (h + 1) * D
                ]
            m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
            return

        kv_pos = super_start + jax.lax.broadcasted_iota(
            jnp.int32, (group_pad, P * bs), 1
        )
        valid = kv_pos < seq_len
        if local_window is not None or global_window is not None:
            valid &= (kv_pos >= win_lo) | (kv_pos < g_hi)
        for h in range(num_kv_heads):
            q = q_ref[h].astype(jnp.float32) * scale  # (G, D)
            k = kbuf[slot, h].astype(jnp.float32)  # (P*bs, D)
            sc = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (G, P*bs)
            sc = jnp.where(valid, sc, _NEG)

            rows = slice(h * group_pad, (h + 1) * group_pad)
            m_prev = m_ref[rows, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(sc, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p_ = jnp.exp(sc - m_new)
            p_ = jnp.where(valid, p_, 0.0)
            l_new = l_ref[rows, 0:1] * alpha + jnp.sum(p_, axis=-1, keepdims=True)
            vh = vbuf[slot, h]
            v = jnp.where(col_valid, vh.astype(jnp.float32), 0.0)
            pv = jax.lax.dot_general(
                p_, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc_ref[h] = acc_ref[h] * alpha + pv
            m_ref[rows, :] = jnp.broadcast_to(m_new, (group_pad, m_ref.shape[1]))
            l_ref[rows, :] = jnp.broadcast_to(l_new, (group_pad, l_ref.shape[1]))

    @pl.when(s == num_supers - 1)
    def _finish():
        for h in range(num_kv_heads):
            rows = slice(h * group_pad, (h + 1) * group_pad)
            l = l_ref[rows, 0:1]
            out = acc_ref[h] / jnp.maximum(l, 1e-38)
            out = jnp.where(l > 0, out, 0.0)
            o_ref[h] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "softmax_scale", "gqa_layout", "pages_per_fetch", "interpret", "kv_layout",
        "local_window", "global_window",
    ),
)
@mosaic_f16_compat
def paged_decode_gqa(
    query: jax.Array,  # (B, Hq, D)
    key_cache: jax.Array,  # (N, Hkv, bs, D)
    value_cache: jax.Array,
    total_seq_lens: jax.Array,  # (B,) int32
    block_tables: jax.Array,  # (B, NB) int32
    softmax_scale: float | None = None,
    gqa_layout: str = "AABB",
    pages_per_fetch: int = 16,
    interpret: bool = False,
    kv_layout: str = "HND",
    local_window: int | None = None,
    global_window: int | None = None,
) -> jax.Array:
    B, Hq, D = query.shape
    if kv_layout == "HND":
        N, Hkv, bs, _ = key_cache.shape
    else:
        N, bs, Hkv, _ = key_cache.shape
    NB = block_tables.shape[1]
    group = Hq // Hkv
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(D)

    P = max(1, min(pages_per_fetch, NB))
    num_supers = -(-NB // P)
    if num_supers * P != NB:  # pad block tables to a super multiple
        block_tables = jnp.pad(
            block_tables, ((0, 0), (0, num_supers * P - NB)), constant_values=-1
        )

    # (B, Hkv, group, D): AABB groups are contiguous head runs; ABAB strided.
    if gqa_layout == "AABB":
        q = query.reshape(B, Hkv, group, D)
    else:
        q = query.reshape(B, group, Hkv, D).transpose(0, 2, 1, 3)

    group_pad = max(8, group)
    if group_pad != group:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))

    def q_index(b, s, seq_lens, block_tables):
        return (b, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, num_supers),
        in_specs=[
            pl.BlockSpec((None, Hkv, group_pad, D), q_index),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, Hkv, group_pad, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((2, Hkv, P * bs, D) if kv_layout == "HND" else (2, P * bs, Hkv, D), key_cache.dtype),
            pltpu.VMEM((2, Hkv, P * bs, D) if kv_layout == "HND" else (2, P * bs, Hkv, D), value_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, P)),
            pltpu.VMEM((Hkv * group_pad, 128), jnp.float32),
            pltpu.VMEM((Hkv * group_pad, 128), jnp.float32),
            pltpu.VMEM((Hkv, group_pad, D), jnp.float32),
        ],
    )

    kernel = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            block_size=bs,
            pages_per_fetch=P,
            scale=softmax_scale,
            num_kv_heads=Hkv,
            group_pad=group_pad,
            kv_layout=kv_layout,
            local_window=local_window,
            global_window=global_window,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, group_pad, D), query.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Hq * NB * bs * D,
            bytes_accessed=2 * B * NB * Hkv * bs * D * key_cache.dtype.itemsize,
            transcendentals=B * Hq * NB * bs,
        ),
    )

    out = kernel(
        total_seq_lens.astype(jnp.int32),
        block_tables.astype(jnp.int32),
        q,
        key_cache,
        value_cache,
    )
    out = out[:, :, :group, :]
    if gqa_layout == "AABB":
        return out.reshape(B, Hq, D)
    return out.transpose(0, 2, 1, 3).reshape(B, Hq, D)
