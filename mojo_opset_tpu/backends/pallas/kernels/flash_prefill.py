"""Pallas TPU kernel: varlen paged flash-attention prefill.

Replaces the reference TTX Triton flash prefill
(backends/ttx/kernels/npu/a2/flash_attention.py:13-60) with a Mosaic
kernel over the paged KV cache:

  * grid (B, Hkv, MAXQB): one query tile of ``q_block`` tokens x one kv
    head group per step;
  * q tiles live in HBM (varlen starts are not BlockSpec-expressible) and
    are DMA'd manually; the LAST tile of a short sequence is clamped to
    overlap the previous tile (recompute instead of masking partial DMA
    writes) and spill rows are rewritten by the next batch's tiles —
    correctness relies on ascending grid order;
  * K/V pages stream through a double-buffered VMEM slab, ``P`` pages per
    fetch, with the causal bound skipping fetches past the tile's last
    visible position;
  * online-softmax carry in fp32 VMEM scratch; output written back by DMA.
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


def _prefill_kernel(
    # scalar prefetch
    cu_q_ref,  # (B+1,) int32
    kv_lens_ref,  # (B,) int32
    q_lens_ref,  # (B,) int32
    block_tables_ref,  # (B, S*P) int32
    # inputs (HBM)
    q_hbm,  # (T, Hkv, group, D)
    k_hbm,  # (N, Hkv, bs, D) HND / (N, bs, Hkv, D) NHD
    v_hbm,
    # outputs (HBM)
    o_hbm,  # (T, Hkv, group, D)
    # scratch
    qbuf,  # (q_block, group, D)
    kbuf,  # (2, P*bs, D)
    vbuf,  # (2, P*bs, D)
    obuf,  # (q_block, group, D)
    qsem, osem,
    ksem,  # (2, P)
    vsem,  # (2, P)
    m_ref,  # (q_block*group, 128) f32
    l_ref,
    acc_ref,  # (q_block*group, D) f32
    *,
    block_size: int,
    pages_per_fetch: int,
    q_block: int,
    group: int,
    scale: float,
    total_tokens: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qb = pl.program_id(2)
    P = pages_per_fetch
    bs = block_size

    q_start = cu_q_ref[b]
    q_len = q_lens_ref[b]
    kv_len = kv_lens_ref[b]
    n_q_blocks = (q_len + q_block - 1) // q_block

    @pl.when((qb < n_q_blocks) & (kv_len > 0))
    def _do_tile():
        # clamp the tile start: stay inside this sequence when possible,
        # never past the end of the packed token array
        tok0 = q_start + qb * q_block
        tok0 = jnp.minimum(tok0, jnp.maximum(q_start, q_start + q_len - q_block))
        tok0 = jnp.minimum(tok0, total_tokens - q_block)

        # absolute kv position of the LAST row of this tile (causal bound)
        row_abs_last = kv_len - q_len + (tok0 - q_start) + q_block - 1
        visible = jnp.minimum(kv_len, row_abs_last + 1)
        n_supers = (visible + P * bs - 1) // (P * bs)

        # fetch q tile: rows [tok0, tok0+q_block), heads [h*group, (h+1)*group)
        qdma = pltpu.make_async_copy(
            q_hbm.at[pl.ds(tok0, q_block), h], qbuf, qsem
        )
        qdma.start()

        def start_fetch(super_idx, slot):
            for p in range(P):
                page_pos = (super_idx * P + p) * bs

                @pl.when(page_pos < visible)
                def _():
                    blk = block_tables_ref[b, super_idx * P + p]
                    blk = jnp.where(blk < 0, 0, blk)
                    pltpu.make_async_copy(
                        k_hbm.at[blk, h], kbuf.at[slot, pl.ds(p * bs, bs), :], ksem.at[slot, p]
                    ).start()
                    pltpu.make_async_copy(
                        v_hbm.at[blk, h], vbuf.at[slot, pl.ds(p * bs, bs), :], vsem.at[slot, p]
                    ).start()

        def wait_fetch(super_idx, slot):
            for p in range(P):
                page_pos = (super_idx * P + p) * bs

                @pl.when(page_pos < visible)
                def _():
                    pltpu.make_async_copy(
                        k_hbm.at[0, 0], kbuf.at[slot, pl.ds(p * bs, bs), :], ksem.at[slot, p]
                    ).wait()
                    pltpu.make_async_copy(
                        v_hbm.at[0, 0], vbuf.at[slot, pl.ds(p * bs, bs), :], vsem.at[slot, p]
                    ).wait()

        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        start_fetch(0, 0)
        qdma.wait()
        q = qbuf[...].astype(jnp.float32).reshape(q_block * group, -1) * scale

        # absolute kv position per tile row (row-major: token-major x group)
        row_tok = jax.lax.broadcasted_iota(jnp.int32, (q_block * group, 1), 0) // group
        q_abs = (kv_len - q_len) + (tok0 - q_start) + row_tok  # (R, 1)

        def body(s, _):
            slot = jax.lax.rem(s, 2)

            @pl.when(s + 1 < n_supers)
            def _():
                start_fetch(s + 1, jax.lax.rem(s + 1, 2))

            wait_fetch(s, slot)
            kv_pos = s * P * bs + jax.lax.broadcasted_iota(
                jnp.int32, (1, P * bs), 1
            )  # (1, K)
            keep = (kv_pos < visible) & (kv_pos <= q_abs)
            col_valid = kv_pos[0][:, None] < visible  # (K, 1)

            k = kbuf[slot].astype(jnp.float32)
            sc = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (R, K)
            sc = jnp.where(keep, sc, _NEG)
            m_prev = m_ref[:, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(sc, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p_ = jnp.exp(sc - m_new)
            p_ = jnp.where(keep, p_, 0.0)
            l_ref[...] = jnp.broadcast_to(
                l_ref[:, 0:1] * alpha + jnp.sum(p_, axis=-1, keepdims=True), l_ref.shape
            )
            v = jnp.where(col_valid, vbuf[slot].astype(jnp.float32), 0.0)
            pv = jax.lax.dot_general(
                p_, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc_ref[...] = acc_ref[...] * alpha + pv
            m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
            return ()

        jax.lax.fori_loop(0, n_supers, lambda s, c: body(s, c), (), unroll=False)

        l = l_ref[:, 0:1]
        out = acc_ref[...] / jnp.maximum(l, 1e-38)
        out = jnp.where(l > 0, out, 0.0)

        # merge: rows of this tile that belong to OTHER sequences (clamped
        # tile overlap) must keep their existing output values
        rd = pltpu.make_async_copy(
            o_hbm.at[pl.ds(tok0, q_block), h], obuf, osem
        )
        rd.start()
        rd.wait()
        tok_of_row = tok0 + row_tok  # (R, 1)
        row_valid = (tok_of_row >= q_start) & (tok_of_row < q_start + q_len)
        merged = jnp.where(
            row_valid, out, obuf[...].astype(jnp.float32).reshape(q_block * group, -1)
        )
        obuf[...] = merged.reshape(q_block, group, -1).astype(obuf.dtype)
        odma = pltpu.make_async_copy(
            obuf, o_hbm.at[pl.ds(tok0, q_block), h], osem
        )
        odma.start()
        odma.wait()


def _prefill_kernel_nhd(
    # scalar prefetch
    cu_q_ref,  # (B+1,) int32
    kv_lens_ref,  # (B,) int32
    q_lens_ref,  # (B,) int32
    block_tables_ref,  # (B, S*P) int32
    # inputs (HBM)
    q_hbm,  # (T, Hkv, group, D)
    k_hbm,  # (N, bs, Hkv, D)  — NHD layout
    v_hbm,
    # outputs (HBM)
    o_hbm,  # (T, Hkv, group, D)
    # scratch
    qbuf,  # (q_block, Hkv, group, D)
    kbuf,  # (2, P*bs, Hkv, D)
    vbuf,
    obuf,  # (q_block, Hkv, group, D)
    qsem, osem,
    ksem,  # (2, P)
    vsem,  # (2, P)
    m_ref,  # (Hkv, q_block*group, 128) f32
    l_ref,
    acc_ref,  # (Hkv, q_block*group, D) f32
    *,
    block_size: int,
    pages_per_fetch: int,
    q_block: int,
    group: int,
    num_kv_heads: int,
    scale: float,
    total_tokens: int,
):
    """NHD-layout variant: grid (B, MAXQB) with the kv-head loop INSIDE.

    Mosaic cannot DMA a 1-wide slice of the second-to-last dim (per-head
    reads from ``(N, bs, Hkv, D)``), so whole pages are fetched once per
    query tile and every head consumes them from VMEM — same HBM traffic
    as the HND kernel's per-head fetches, one grid dim fewer.
    """
    b = pl.program_id(0)
    qb = pl.program_id(1)
    P = pages_per_fetch
    bs = block_size

    q_start = cu_q_ref[b]
    q_len = q_lens_ref[b]
    kv_len = kv_lens_ref[b]
    n_q_blocks = (q_len + q_block - 1) // q_block

    @pl.when((qb < n_q_blocks) & (kv_len > 0))
    def _do_tile():
        tok0 = q_start + qb * q_block
        tok0 = jnp.minimum(tok0, jnp.maximum(q_start, q_start + q_len - q_block))
        tok0 = jnp.minimum(tok0, total_tokens - q_block)

        row_abs_last = kv_len - q_len + (tok0 - q_start) + q_block - 1
        visible = jnp.minimum(kv_len, row_abs_last + 1)
        n_supers = (visible + P * bs - 1) // (P * bs)

        qdma = pltpu.make_async_copy(q_hbm.at[pl.ds(tok0, q_block)], qbuf, qsem)
        qdma.start()

        def start_fetch(super_idx, slot):
            for p in range(P):
                page_pos = (super_idx * P + p) * bs

                @pl.when(page_pos < visible)
                def _():
                    blk = block_tables_ref[b, super_idx * P + p]
                    blk = jnp.where(blk < 0, 0, blk)
                    pltpu.make_async_copy(
                        k_hbm.at[blk], kbuf.at[slot, pl.ds(p * bs, bs), :, :], ksem.at[slot, p]
                    ).start()
                    pltpu.make_async_copy(
                        v_hbm.at[blk], vbuf.at[slot, pl.ds(p * bs, bs), :, :], vsem.at[slot, p]
                    ).start()

        def wait_fetch(super_idx, slot):
            for p in range(P):
                page_pos = (super_idx * P + p) * bs

                @pl.when(page_pos < visible)
                def _():
                    pltpu.make_async_copy(
                        k_hbm.at[0], kbuf.at[slot, pl.ds(p * bs, bs), :, :], ksem.at[slot, p]
                    ).wait()
                    pltpu.make_async_copy(
                        v_hbm.at[0], vbuf.at[slot, pl.ds(p * bs, bs), :, :], vsem.at[slot, p]
                    ).wait()

        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        start_fetch(0, 0)
        qdma.wait()

        row_tok = jax.lax.broadcasted_iota(jnp.int32, (q_block * group, 1), 0) // group
        q_abs = (kv_len - q_len) + (tok0 - q_start) + row_tok  # (R, 1)

        def body(s, _):
            slot = jax.lax.rem(s, 2)

            @pl.when(s + 1 < n_supers)
            def _():
                start_fetch(s + 1, jax.lax.rem(s + 1, 2))

            wait_fetch(s, slot)
            kv_pos = s * P * bs + jax.lax.broadcasted_iota(jnp.int32, (1, P * bs), 1)
            keep = (kv_pos < visible) & (kv_pos <= q_abs)
            col_valid = kv_pos[0][:, None] < visible  # (K, 1)

            for h in range(num_kv_heads):
                q = qbuf[:, h].astype(jnp.float32).reshape(q_block * group, -1) * scale
                k = kbuf[slot, :, h, :].astype(jnp.float32)
                sc = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )  # (R, K)
                sc = jnp.where(keep, sc, _NEG)
                m_prev = m_ref[h, :, 0:1]
                m_new = jnp.maximum(m_prev, jnp.max(sc, axis=-1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p_ = jnp.exp(sc - m_new)
                p_ = jnp.where(keep, p_, 0.0)
                l_ref[h] = jnp.broadcast_to(
                    l_ref[h, :, 0:1] * alpha + jnp.sum(p_, axis=-1, keepdims=True),
                    l_ref.shape[1:],
                )
                v = jnp.where(col_valid, vbuf[slot, :, h, :].astype(jnp.float32), 0.0)
                pv = jax.lax.dot_general(
                    p_, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                acc_ref[h] = acc_ref[h] * alpha + pv
                m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])
            return ()

        jax.lax.fori_loop(0, n_supers, lambda s, c: body(s, c), (), unroll=False)

        rd = pltpu.make_async_copy(o_hbm.at[pl.ds(tok0, q_block)], obuf, osem)
        rd.start()
        rd.wait()
        tok_of_row = tok0 + row_tok  # (R, 1)
        row_valid = (tok_of_row >= q_start) & (tok_of_row < q_start + q_len)
        for h in range(num_kv_heads):
            l = l_ref[h, :, 0:1]
            out = acc_ref[h] / jnp.maximum(l, 1e-38)
            out = jnp.where(l > 0, out, 0.0)
            merged = jnp.where(
                row_valid, out, obuf[:, h].astype(jnp.float32).reshape(q_block * group, -1)
            )
            obuf[:, h] = merged.reshape(q_block, group, -1).astype(obuf.dtype)
        odma = pltpu.make_async_copy(obuf, o_hbm.at[pl.ds(tok0, q_block)], osem)
        odma.start()
        odma.wait()


@functools.partial(
    jax.jit,
    static_argnames=("softmax_scale", "gqa_layout", "q_block", "pages_per_fetch", "interpret", "kv_layout"),
)
@mosaic_f16_compat
def paged_prefill_gqa(
    query: jax.Array,  # (T, Hq, D)
    key_cache: jax.Array,  # (N, Hkv, bs, D)
    value_cache: jax.Array,
    cu_q_lens: jax.Array,  # (B+1,) int32
    block_tables: jax.Array,  # (B, NB) int32
    kv_lens: jax.Array,  # (B,) int32 total visible kv lengths
    softmax_scale: float | None = None,
    gqa_layout: str = "AABB",
    q_block: int = 128,
    pages_per_fetch: int = 4,
    interpret: bool = False,
    kv_layout: str = "HND",
) -> jax.Array:
    T, Hq, D = query.shape
    if kv_layout == "HND":
        N, Hkv, bs, _ = key_cache.shape
    else:
        N, bs, Hkv, _ = key_cache.shape
    B, NB = block_tables.shape
    group = Hq // Hkv
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(D)
    if gqa_layout != "AABB":
        raise NotImplementedError("pallas prefill supports AABB head grouping")

    q_block = min(q_block, max(8, T))
    P = max(1, min(pages_per_fetch, NB))
    num_supers = -(-NB // P)
    if num_supers * P != NB:
        block_tables = jnp.pad(
            block_tables, ((0, 0), (0, num_supers * P - NB)), constant_values=-1
        )

    q_lens = (cu_q_lens[1:] - cu_q_lens[:-1]).astype(jnp.int32)
    max_q_blocks = -(-T // q_block)

    if kv_layout == "HND":
        grid = (B, Hkv, max_q_blocks)
        scratch = [
            pltpu.VMEM((q_block, group, D), query.dtype),
            pltpu.VMEM((2, P * bs, D), key_cache.dtype),
            pltpu.VMEM((2, P * bs, D), value_cache.dtype),
            pltpu.VMEM((q_block, group, D), query.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.VMEM((q_block * group, 128), jnp.float32),
            pltpu.VMEM((q_block * group, 128), jnp.float32),
            pltpu.VMEM((q_block * group, D), jnp.float32),
        ]
        body = functools.partial(
            _prefill_kernel,
            block_size=bs, pages_per_fetch=P, q_block=q_block, group=group,
            scale=softmax_scale, total_tokens=T,
        )
    else:  # NHD: whole-page fetches, head loop inside (see kernel docstring)
        grid = (B, max_q_blocks)
        scratch = [
            pltpu.VMEM((q_block, Hkv, group, D), query.dtype),
            pltpu.VMEM((2, P * bs, Hkv, D), key_cache.dtype),
            pltpu.VMEM((2, P * bs, Hkv, D), value_cache.dtype),
            pltpu.VMEM((q_block, Hkv, group, D), query.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.VMEM((Hkv, q_block * group, 128), jnp.float32),
            pltpu.VMEM((Hkv, q_block * group, 128), jnp.float32),
            pltpu.VMEM((Hkv, q_block * group, D), jnp.float32),
        ]
        body = functools.partial(
            _prefill_kernel_nhd,
            block_size=bs, pages_per_fetch=P, q_block=q_block, group=group,
            num_kv_heads=Hkv, scale=softmax_scale, total_tokens=T,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=scratch,
    )

    kernel = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, Hkv, group, D), query.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * Hq * D * NB * bs // 2,
            bytes_accessed=2 * B * NB * bs * D * key_cache.dtype.itemsize * Hkv,
            transcendentals=T * Hq * NB * bs,
        ),
    )

    # AABB: heads of one kv group are contiguous -> (T, Hkv, group, D)
    q4 = query.reshape(T, Hkv, group, D)
    out = kernel(
        cu_q_lens.astype(jnp.int32),
        kv_lens.astype(jnp.int32),
        q_lens,
        block_tables.astype(jnp.int32),
        q4,
        key_cache,
        value_cache,
    )
    return out.reshape(T, Hq, D)
