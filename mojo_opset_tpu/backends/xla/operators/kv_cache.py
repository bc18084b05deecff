"""XLA-tier paged KV-cache store: chunked dynamic-update-slice prefill.

The golden tier's per-token scatter is correct but compiles to a generic
row scatter (~46 GB/s at prefill t4096 on v5e).  Prefill writes are
block-contiguous runs, so this tier rewrites them as one
read-merge-write ``dynamic_update_slice`` per touched block — a memcpy-
shaped program.  Decode (one token per sequence) keeps the scatter,
which is already optimal there.

Replaces the reference TTX kv_cache store kernels
(backends/ttx/kernels/npu/a2/kv_cache.py) as the accelerated tier.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operators.kv_cache import MojoStorePagedKVCache
from mojo_opset_tpu.experimental.operators.kv_cache import (
    MojoStorePagedKVCacheC8 as _MojoStorePagedKVCacheC8,
    MojoStorePagedMLAKVCache as _MojoStorePagedMLAKVCache,
)


def _chunk_plan(block_table, cu_q_lens, context_kv_lens, block_size):
    """Vectorized jittable chunk plan over every (sequence, block) pair.

    Returns (blk, src_start, dst_offset, length), each (B*NB,) int32;
    invalid pairs get length 0 / blk clipped.
    """
    bt = block_table.astype(jnp.int32)
    ctx = context_kv_lens.astype(jnp.int32)
    cu = cu_q_lens.astype(jnp.int32)
    B, NB = bt.shape
    q_lens = cu[1:] - cu[:-1]

    block_start = (jnp.arange(NB, dtype=jnp.int32) * block_size)[None, :]
    seq_start = ctx[:, None]
    seq_end = (ctx + q_lens)[:, None]
    o_s = jnp.maximum(seq_start, block_start)
    o_e = jnp.minimum(seq_end, block_start + block_size)
    length = jnp.maximum(o_e - o_s, 0)
    valid = (q_lens[:, None] > 0) & (ctx[:, None] >= 0) & (bt >= 0) & (length > 0)
    length = jnp.where(valid, length, 0)
    src_start = cu[:-1][:, None] + (o_s - seq_start)
    dst_offset = o_s - block_start
    return (
        bt.reshape(-1),
        src_start.reshape(-1),
        dst_offset.reshape(-1),
        length.reshape(-1),
    )


def compact_chunk_plan(block_table, cu_q_lens, context_kv_lens, bs, T):
    """Compacted jittable chunk plan: only TOUCHED (sequence, block) pairs.

    ``_chunk_plan`` emits one slot per (sequence, table-column) — B*W
    entries, nearly all empty at realistic store shapes (a 16x11 table
    storing 32 tokens/seq touches 32-48 blocks, not 176).  Each sequence
    produces at most ``q_len // bs + 2`` chunks, so ``T // bs + 2B``
    bounds the total statically; scatter the valid entries into that many
    slots.  Returns (blk, src, off, length), each (C,) int32, trailing
    slots length 0.
    """
    B, W = block_table.shape
    if cu_q_lens is None:  # decode: token b at position ctx[b]
        cu_q_lens = jnp.arange(B + 1, dtype=jnp.int32)
    blk, src, off, length = _chunk_plan(block_table, cu_q_lens, context_kv_lens, bs)
    C = min(B * W, T // bs + 2 * B)
    if C >= B * W:
        return blk, src, off, length, C
    valid = length > 0
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    pos = jnp.where(valid, pos, C)  # invalid entries dropped

    def put(x, fill):
        return jnp.full((C,), fill, jnp.int32).at[pos].set(
            x.astype(jnp.int32), mode="drop", unique_indices=True
        )

    return put(blk, 0), put(src, 0), put(off, 0), put(length, 0), C


def _block_merge_store(
    key_states, value_states, key_cache, value_cache,
    block_table, cu_q_lens, context_kv_lens, nhd: bool,
):
    """Prefill store as a compacted gather -> register merge -> scatter.

    Gather the touched cache blocks (compact_chunk_plan: <= T//bs + 2B of
    them, not a per-sequence window), merge the new token rows in
    registers, scatter the merged block images back as wide rows.
    Traffic = touched blocks read+write only, at block-row granularity —
    which XLA moves at copy speed for every dtype including f16 (the
    token-row scatter converts the WHOLE f16 cache per call: 50-2500 µs
    where the bf16 twin costs ~5 µs — tools/exp_f16_store.py; and the
    serial per-chunk dynamic_update_slice loop this replaces paid ~2 µs
    of dispatch per touched block).  Measured at the published
    (16,16,32,128) f16 row: 85 µs vs 354 µs for the B*W-grid Pallas
    merge kernel and ~46 GB/s for the row scatter.

    Contract (consequence of ``unique_indices=True``): every chunk merges
    against the ORIGINAL cache image and the scatter assumes disjoint
    block ids, so a physical block appearing in the write plans of two
    stored sequences yields undefined results — unlike the golden's
    serial per-chunk loop, which was last-write-wins.  This matches the
    allocator's invariant (a physical block is owned by exactly one
    sequence; prefix-cache sharing is read-only and never stored into),
    and the reference kernel store has the same requirement (parallel
    per-chunk Triton programs, reference backends/ttx/kernels/npu/a2/
    kv_cache.py).  Callers with aliasing tables must use the ref tier.
    """
    if nhd:
        N, bs, H, D = key_cache.shape
    else:
        N, H, bs, D = key_cache.shape
    T = key_states.shape[0]
    blk, src, off, length, C = compact_chunk_plan(
        block_table, cu_q_lens, context_kv_lens, bs, T)
    rows = jnp.arange(bs, dtype=jnp.int32)[None, :]
    # block row r of chunk c holds token src[c] - off[c] + r
    tok_safe = jnp.clip(src[:, None] - off[:, None] + rows, 0, T - 1)  # (C,bs)
    new_here = (rows >= off[:, None]) & (rows < (off + length)[:, None])
    pid = jnp.where(length > 0, blk, N)  # drop empty slots (POSITIVE OOB id)
    pid_safe = jnp.clip(blk, 0, N - 1)

    def merge(cache, new):
        cur = cache[pid_safe]  # (C,bs,H,D) NHD / (C,H,bs,D) HND
        if nhd:
            picked = new[tok_safe]  # (C,bs,H,D)
            keep = new_here[..., None, None]
        else:
            # gather token-major (C*bs rows of contiguous (H,D)), then
            # transpose in-slab: a direct (slot-row, head) gather would be
            # C*H*bs scatter-sized rows — row-rate bound (~800 µs at the
            # (16,16,32,128) published row vs ~35 µs this way)
            picked = jnp.swapaxes(new[tok_safe], 1, 2)  # -> (C,H,bs,D)
            keep = new_here[:, None, :, None]
        merged = jnp.where(keep, picked.astype(cache.dtype), cur)
        return cache.at[pid].set(merged, mode="drop", unique_indices=True)

    return merge(key_cache, key_states), merge(value_cache, value_states)


class XlaStorePagedKVCache(MojoStorePagedKVCache):
    def forward(
        self,
        key_states: jax.Array,
        value_states: jax.Array,
        key_cache: jax.Array,
        value_cache: jax.Array,
        block_table: Optional[jax.Array] = None,
        cu_q_lens: Optional[jax.Array] = None,
        context_kv_lens: Optional[jax.Array] = None,
        *,
        chunk_metadata: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        T = key_states.shape[0]
        B = block_table.shape[0] if block_table is not None else T
        bs = key_cache.shape[2] if self.kv_layout == "HND" else key_cache.shape[1]
        # Route by STATIC store size.  The token-row scatter moves only the
        # stored rows but at scatter rate (~46 GB/s on v5e); the block merge
        # moves every touched block twice at copy speed (~819 GB/s).  Model:
        # scatter ~ 18x-slower bytes * T rows, merge ~ 4 * (T + 2 * bs * B)
        # rows at copy speed => scatter wins iff 7 * T < 4 * bs * B (decode
        # T == B always qualifies; bulk prefill never does).  Measured at the
        # published decode rows: merge 62 us -> scatter 24-31 us.
        small = cu_q_lens is None or 7 * T < 4 * bs * B
        if chunk_metadata is not None or small:
            # NOTE an r4 u16-bitcast special case for f16 was removed here:
            # on the 2026-08-19 toolchain a native f16 row scatter converted
            # the whole cache per call (tools/exp_f16_store.py), so f16 rode
            # the scatter as uint16 bits.  Re-measured 2026-08-21 after a
            # toolchain update: the native f16 scatter is in-place and
            # ~free inside jitted loops (<1 µs marginal at the published
            # (16,·,32,128) decode row), while the bitcast pair now BREAKS
            # XLA's in-place buffer aliasing (~800 µs/iter full-cache
            # copies, tools/exp history r5).
            return super().forward(
                key_states, value_states, key_cache, value_cache,
                block_table, cu_q_lens, context_kv_lens,
                chunk_metadata=chunk_metadata,
            )
        assert key_states.ndim == 3 and key_states.shape == value_states.shape
        return _block_merge_store(
            key_states, value_states, key_cache, value_cache,
            block_table, cu_q_lens, context_kv_lens,
            nhd=self.kv_layout == "NHD",
        )


class XlaStorePagedKVCacheC8(_MojoStorePagedKVCacheC8):
    """C8 store as quantize-new-tokens + block-window merge scatter.

    The golden's HND middle-dim scatter copies the whole int8 cache per
    call inside jitted decode loops (measured +15 ms/step at Qwen3-4B,
    bs8 ctx4000 — the entire int8-KV serving regression); the merge
    gathers only the touched blocks and moves int8 natively.
    """

    def forward(
        self,
        key_states: jax.Array,
        value_states: jax.Array,
        key_cache: jax.Array,
        value_cache: jax.Array,
        key_scale: jax.Array,
        value_scale: jax.Array,
        block_table: jax.Array = None,
        cu_q_lens: jax.Array = None,
        context_kv_lens: jax.Array = None,
        *,
        chunk_metadata=None,
    ) -> Tuple[jax.Array, jax.Array]:
        if chunk_metadata is not None:
            return super().forward(
                key_states, value_states, key_cache, value_cache,
                key_scale, value_scale, block_table, cu_q_lens,
                context_kv_lens, chunk_metadata=chunk_metadata,
            )
        key_q = jnp.clip(
            jnp.round(key_states.astype(jnp.float32) / key_scale.astype(jnp.float32)),
            -128, 127,
        ).astype(jnp.int8)
        value_q = jnp.clip(
            jnp.round(value_states.astype(jnp.float32) / value_scale.astype(jnp.float32)),
            -128, 127,
        ).astype(jnp.int8)
        return _block_merge_store(
            key_q, value_q, key_cache, value_cache,
            block_table, cu_q_lens, context_kv_lens, nhd=False,
        )


class XlaStorePagedMLAKVCache(_MojoStorePagedMLAKVCache):
    """MLA latent store via the block-window merge (golden's middle-dim
    scatter copies both latent caches per call inside jitted decode
    loops — the same failure mode the C8 store had)."""

    def forward(
        self,
        compressed_kv_states: jax.Array,  # (T, r)
        k_pe_states: jax.Array,  # (T, dr)
        compressed_kv_cache: jax.Array,  # (N, 1, bs, r)
        k_pe_cache: jax.Array,  # (N, 1, bs, >=dr)
        block_table: jax.Array,
        cu_q_lens: Optional[jax.Array],
        context_kv_lens: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        N, _, bs, _ = compressed_kv_cache.shape
        T = compressed_kv_states.shape[0]
        blk, src, off, length, _C = compact_chunk_plan(
            block_table, cu_q_lens, context_kv_lens, bs, T)
        rows = jnp.arange(bs, dtype=jnp.int32)[None, :]
        tok_safe = jnp.clip(src[:, None] - off[:, None] + rows, 0, T - 1)  # (C,bs)
        new_here = (rows >= off[:, None]) & (rows < (off + length)[:, None])
        pid = jnp.where(length > 0, blk, N)
        pid_safe = jnp.clip(blk, 0, N - 1)

        def merge(cache, new2d, d_valid):
            D = cache.shape[-1]
            if new2d.shape[-1] < D:  # lane-padded k_pe cache
                new2d = jnp.pad(new2d, ((0, 0), (0, D - new2d.shape[-1])))
            cur = cache[pid_safe]  # (C, 1, bs, D)
            picked = new2d[tok_safe][:, None, :, :].astype(cache.dtype)
            keep = new_here[:, None, :, None] & (
                jnp.arange(D, dtype=jnp.int32) < d_valid)
            merged = jnp.where(keep, picked, cur)
            return cache.at[pid].set(merged, mode="drop", unique_indices=True)

        return (
            merge(compressed_kv_cache, compressed_kv_states,
                  compressed_kv_states.shape[-1]),
            merge(k_pe_cache, k_pe_states, k_pe_states.shape[-1]),
        )
