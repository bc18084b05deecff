"""Experimental paged KV-cache ops: MLA latent store, int8 (C8) store,
dequant read-back, low-rank label store.

Parity: reference mojo_opset/experimental/operators/kv_cache.py
(MojoStorePagedMLAKVCache :13, MojoStorePagedKVCacheC8 :109,
MojoDequantFromPagedKVCache :186) and store_lowrank.py:6.
All stores are functional (updated caches returned; donate under jit).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.kv_cache import (
    build_paged_kv_token_indices,
    drop_invalid,
)


class MojoStorePagedMLAKVCache(MojoOperator):
    """Append compressed-KV latents + positional keys into paged caches
    shaped ``(N_blocks, 1, block_size, dim)``."""

    def forward(
        self,
        compressed_kv_states: jax.Array,  # (T, r)
        k_pe_states: jax.Array,  # (T, dr)
        compressed_kv_cache: jax.Array,  # (N, 1, bs, r)
        k_pe_cache: jax.Array,  # (N, 1, bs, dr)
        block_table: jax.Array,
        cu_q_lens: Optional[jax.Array],
        context_kv_lens: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        T = compressed_kv_states.shape[0]
        dst_block, dst_offset = build_paged_kv_token_indices(
            block_table, cu_q_lens, context_kv_lens, compressed_kv_cache.shape[2], T
        )
        dst_block = drop_invalid(dst_block, compressed_kv_cache.shape[0])
        compressed_kv_cache = compressed_kv_cache.at[dst_block, 0, dst_offset, :].set(
            compressed_kv_states.astype(compressed_kv_cache.dtype), mode="drop"
        )
        k_pe_cache = k_pe_cache.at[dst_block, 0, dst_offset, : k_pe_states.shape[-1]].set(
            k_pe_states.astype(k_pe_cache.dtype), mode="drop"
        )
        return compressed_kv_cache, k_pe_cache


class MojoStorePagedKVCacheC8(MojoOperator):
    """Quantize new K/V tokens to int8 with per-channel scales ``(Hkv, D)``
    and scatter into int8 paged caches."""

    def forward(
        self,
        key_states: jax.Array,  # (T, Hkv, D)
        value_states: jax.Array,
        key_cache: jax.Array,  # (N, Hkv, bs, D) int8
        value_cache: jax.Array,
        key_scale: jax.Array,  # (Hkv, D)
        value_scale: jax.Array,
        block_table: Optional[jax.Array] = None,
        cu_q_lens: Optional[jax.Array] = None,
        context_kv_lens: Optional[jax.Array] = None,
        *,
        chunk_metadata: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        assert key_states.ndim == 3 and key_states.shape == value_states.shape
        assert key_scale is not None and value_scale is not None
        if chunk_metadata is not None:
            raise NotImplementedError(
                "C8 store uses the jittable per-token plan; pass block_table/"
                "cu_q_lens/context_kv_lens"
            )
        key_q = jnp.clip(
            jnp.round(key_states.astype(jnp.float32) / key_scale.astype(jnp.float32)),
            -128, 127,
        ).astype(jnp.int8)
        value_q = jnp.clip(
            jnp.round(value_states.astype(jnp.float32) / value_scale.astype(jnp.float32)),
            -128, 127,
        ).astype(jnp.int8)
        dst_block, dst_offset = build_paged_kv_token_indices(
            block_table, cu_q_lens, context_kv_lens, key_cache.shape[2], key_states.shape[0]
        )
        dst_block = drop_invalid(dst_block, key_cache.shape[0])
        key_cache = key_cache.at[dst_block, :, dst_offset, :].set(key_q, mode="drop")
        value_cache = value_cache.at[dst_block, :, dst_offset, :].set(value_q, mode="drop")
        return key_cache, value_cache


class MojoDequantFromPagedKVCache(MojoOperator):
    """Gather + dequantize int8 paged K/V back into packed linear K/V
    states (reference kv_cache.py:186-280); returns (key, value)."""

    def forward(
        self,
        *,
        key: jax.Array,  # (total_seq, H, D) output template
        value: Optional[jax.Array] = None,
        key_cache: jax.Array,
        key_cache_scale: jax.Array,  # (H, D)
        value_cache: Optional[jax.Array] = None,
        value_cache_scale: Optional[jax.Array] = None,
        context_lengths: jax.Array = None,
        max_context_len: int = 0,
        context_seq_offset: Optional[jax.Array] = None,
        block_tables: jax.Array = None,
    ):
        import numpy as np

        lens = np.asarray(context_lengths)
        if context_seq_offset is None:
            offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        else:
            offs = np.asarray(context_seq_offset)
        bs = key_cache.shape[2]

        def _fill(out, cache, scale):
            for i in range(lens.shape[0]):
                sl = int(lens[i])
                if sl <= 0:
                    continue
                nb = -(-sl // bs)
                bids = [int(block_tables[i, j]) for j in range(nb)]
                bids = bids[: next((j for j, b in enumerate(bids) if b < 0), nb)]
                parts = [cache[b] for b in bids]  # -1 must not wrap to the last block
                dense = jnp.concatenate(parts, axis=-2)[:, :sl]  # (H, sl, D)
                deq = dense.astype(jnp.float32) * scale.astype(jnp.float32)[:, None, :]
                out = out.at[int(offs[i]) : int(offs[i]) + sl].set(
                    jnp.swapaxes(deq, 0, 1).astype(out.dtype)
                )
            return out

        key = _fill(key, key_cache, key_cache_scale)
        if value is not None and value_cache is not None and value_cache_scale is not None:
            value = _fill(value, value_cache, value_cache_scale)
        return key, value


class MojoStoreLowrank(MojoOperator):
    """Store low-rank latent states into a BNSD label cache at
    (block_idxs, token_idxs) (reference store_lowrank.py:6-26)."""

    def forward(
        self,
        label_cache: jax.Array,  # (B, N, S, D)
        key_lr: jax.Array,  # (T, N, D)
        block_idxs: jax.Array,  # (T,) int32
        token_idxs: jax.Array,  # (T,) int32
        token_num: int,
    ) -> jax.Array:
        assert block_idxs.dtype == jnp.int32
        assert token_idxs.dtype == jnp.int32
        assert label_cache.ndim == 4, "Expected label_cache is BNSD"
        assert key_lr.ndim == 3, "Expected key_lr is SND"
        blocks = drop_invalid(block_idxs[:token_num], label_cache.shape[0])
        return label_cache.at[blocks, :, token_idxs[:token_num], :].set(
            key_lr[:token_num].astype(label_cache.dtype), mode="drop"
        )
