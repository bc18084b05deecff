"""Paged KV-cache store ops.

Parity: reference mojo_opset/core/operators/kv_cache.py:33-171
(build_paged_kv_chunk_metadata :33, MojoStorePagedKVCache :104).

TPU notes: torch mutates the caches in place; JAX is functional, so the
store returns updated ``(key_cache, value_cache)`` — under ``jax.jit``
with donated cache buffers this compiles to a true in-place scatter.
Alongside the reference's chunk plan we provide a fully-vectorized
*per-token* plan (``build_paged_kv_token_indices``) with static output
shapes, which is what the jittable scatter path and the Pallas store
kernel consume (invalid rows are dropped via scatter mode='drop').
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mojo_opset_tpu.core.operator import MojoOperator


def drop_invalid(dst_block: jax.Array, n_rows: int) -> jax.Array:
    """Remap the ``-1`` invalid-token sentinel to a POSITIVE out-of-bounds
    row id before a ``mode='drop'`` scatter: jnp scatters normalize
    negative indices Python-style (``-1`` -> last row) BEFORE the drop
    filter applies, so ``-1`` would silently corrupt the final cache
    block instead of being dropped."""
    return jnp.where(dst_block >= 0, dst_block, n_rows).astype(jnp.int32)


def assert_paged_kv_store_contract(chunk_metadata) -> None:
    assert chunk_metadata.dtype == jnp.int32
    assert chunk_metadata.ndim == 2
    assert chunk_metadata.shape[1] == 4


def build_paged_kv_chunk_metadata(
    block_table: jax.Array,
    cu_q_lens: Optional[jax.Array],
    context_kv_lens: jax.Array,
    block_size: int,
) -> jax.Array:
    """Vectorized store plan: rows ``(src_token_start, dst_block_id,
    dst_block_offset, chunk_len)`` (reference kv_cache.py:33-101).

    The row count is data-dependent, so this planner runs eagerly (numpy);
    jit paths should use ``build_paged_kv_token_indices`` instead.
    """
    bt = np.asarray(block_table)
    ctx = np.asarray(context_kv_lens).astype(np.int32)
    batch_size = ctx.shape[0]
    max_blocks = bt.shape[1]
    if batch_size == 0 or max_blocks == 0:
        return jnp.empty((0, 4), jnp.int32)

    if cu_q_lens is None:
        # decode fast path: one token per sequence
        src = np.arange(batch_size, dtype=np.int32)
        safe_ctx = np.maximum(ctx, 0)
        logical = safe_ctx // block_size
        valid = (ctx >= 0) & (logical < max_blocks)
        safe_logical = np.clip(logical, 0, max_blocks - 1)
        physical = bt[np.arange(batch_size), safe_logical]
        valid &= physical >= 0
        rows = np.stack(
            [src, physical.astype(np.int32), (safe_ctx % block_size), np.ones_like(src)], axis=-1
        )
        return jnp.asarray(rows[valid], dtype=jnp.int32)

    cu = np.asarray(cu_q_lens).astype(np.int32)
    q_lens = cu[1:] - cu[:-1]
    src_bases = cu[:-1]

    logical = np.arange(max_blocks, dtype=np.int32)[None, :]
    block_start = logical * block_size
    block_end = block_start + block_size
    seq_start = ctx[:, None]
    seq_end = (ctx + q_lens)[:, None]
    overlap_start = np.maximum(seq_start, block_start)
    overlap_end = np.minimum(seq_end, block_end)
    chunk_lens = np.maximum(overlap_end - overlap_start, 0)
    valid = (q_lens > 0)[:, None] & (ctx >= 0)[:, None] & (chunk_lens > 0) & (bt >= 0)
    src_starts = src_bases[:, None] + (overlap_start - seq_start)
    dst_offsets = overlap_start - block_start
    rows = np.stack([src_starts, bt, dst_offsets, chunk_lens], axis=-1)
    return jnp.asarray(rows[valid], dtype=jnp.int32)


def build_paged_kv_token_indices(
    block_table: jax.Array,
    cu_q_lens: Optional[jax.Array],
    context_kv_lens: jax.Array,
    block_size: int,
    total_tokens: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-token destination plan with static shapes (jittable).

    Returns ``(dst_block (T,), dst_offset (T,))`` — token t of the packed
    new-KV tensor lands at ``cache[dst_block[t], :, dst_offset[t], :]``.
    Invalid tokens get ``dst_block = -1`` (dropped by scatter mode='drop').
    """
    ctx = context_kv_lens.astype(jnp.int32)
    B = ctx.shape[0]
    max_blocks = block_table.shape[1]
    token_ids = jnp.arange(total_tokens, dtype=jnp.int32)
    if cu_q_lens is None:
        batch = token_ids  # decode: token i belongs to sequence i
        pos = ctx
    else:
        batch = jnp.clip(
            jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1, 0, B - 1
        )
        q_pos = token_ids - cu_q_lens[batch]
        pos = ctx[batch] + q_pos
    logical = jnp.maximum(pos, 0) // block_size
    valid = (pos >= 0) & (logical < max_blocks)
    safe_logical = jnp.clip(logical, 0, max_blocks - 1)
    physical = block_table[batch, safe_logical]
    valid = valid & (physical >= 0)
    dst_block = jnp.where(valid, physical, -1).astype(jnp.int32)
    dst_offset = (jnp.maximum(pos, 0) % block_size).astype(jnp.int32)
    return dst_block, dst_offset


class MojoStorePagedKVCache(MojoOperator):
    """Scatter new K/V tokens into a paged cache; returns updated caches.

    Accepts either the legacy ``(block_table, cu_q_lens, context_kv_lens)``
    triple (jittable, per-token vectorized scatter) or a precomputed
    ``chunk_metadata`` plan (reference kv_cache.py:120 contract).

    ``kv_layout``: "HND" = reference cache layout (N, Hkv, bs, D); "NHD" =
    TPU-native (N, bs, Hkv, D) — token rows contiguous, so the scatter hits
    only leading dims and XLA keeps donated caches in place under jit (the
    HND scatter across the middle dim copies the whole cache per call
    inside jitted loops).
    """

    def __init__(self, kv_layout: str = "HND", **kwargs):
        super().__init__(**kwargs)
        from mojo_opset_tpu.core.operators.attention import KV_LAYOUTS

        if kv_layout not in KV_LAYOUTS:
            raise ValueError(f"kv_layout must be one of {KV_LAYOUTS}, got {kv_layout}")
        self.kv_layout = kv_layout

    def extra_repr(self) -> str:
        return f"kv_layout={self.kv_layout}"

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
        assert key_states.ndim == 3 and value_states.ndim == 3 and key_states.shape == value_states.shape, (
            "key/value states must be (token_num, kv_head_num, head_dim), please check."
        )
        block_size = key_cache.shape[2] if self.kv_layout == "HND" else key_cache.shape[1]
        if chunk_metadata is None:
            assert block_table is not None, "block_table is required when chunk_metadata is not provided."
            assert context_kv_lens is not None, "context_kv_lens is required when chunk_metadata is not provided."
            dst_block, dst_offset = build_paged_kv_token_indices(
                block_table, cu_q_lens, context_kv_lens, block_size, key_states.shape[0]
            )
        else:
            assert block_table is None and cu_q_lens is None and context_kv_lens is None, (
                "chunk_metadata path should not be mixed with block_table/cu_q_lens/context_kv_lens."
            )
            assert_paged_kv_store_contract(chunk_metadata)
            if chunk_metadata.shape[0] == 0:
                return key_cache, value_cache
            # expand chunks to per-token indices (eager; chunk plans are a
            # host-side artifact in this build)
            meta = np.asarray(chunk_metadata)
            src_list, blk_list, off_list = [], [], []
            for src_start, blk, blk_off, clen in meta.tolist():
                src_list.extend(range(src_start, src_start + clen))
                blk_list.extend([blk] * clen)
                off_list.extend(range(blk_off, blk_off + clen))
            order = jnp.asarray(src_list, jnp.int32)
            key_states = key_states[order]
            value_states = value_states[order]
            dst_block = jnp.asarray(blk_list, jnp.int32)
            dst_offset = jnp.asarray(off_list, jnp.int32)

        dst_block = drop_invalid(dst_block, key_cache.shape[0])
        if self.kv_layout == "NHD":
            # leading-dims scatter of contiguous (Hkv, D) token rows —
            # in-place under jit (donated / loop-carried caches)
            key_cache = key_cache.at[dst_block, dst_offset, :, :].set(
                key_states.astype(key_cache.dtype), mode="drop", unique_indices=True
            )
            value_cache = value_cache.at[dst_block, dst_offset, :, :].set(
                value_states.astype(value_cache.dtype), mode="drop", unique_indices=True
            )
            return key_cache, value_cache
        # (T, Hkv, D) -> cache[(dst_block, :, dst_offset, :)]
        key_cache = key_cache.at[dst_block, :, dst_offset, :].set(
            key_states.astype(key_cache.dtype), mode="drop"
        )
        value_cache = value_cache.at[dst_block, :, dst_offset, :].set(
            value_states.astype(value_cache.dtype), mode="drop"
        )
        return key_cache, value_cache
