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


def _block_window_plan(block_table, cu_q_lens, context_kv_lens, bs, T, N):
    """Per-(sequence, slot) touched-block plan shared by the merge stores.

    Returns (pid, pid_safe, tok_safe, new_here): the physical block id per
    (B, V) window slot (dropped slots get the POSITIVE out-of-bounds id N —
    -1 would wrap to block N-1 under standard negative indexing before
    mode="drop" could apply), plus the (B, V, bs) token index and validity.
    """
    B, W = block_table.shape
    ctx = context_kv_lens.astype(jnp.int32)
    if cu_q_lens is None:  # decode: token b at position ctx[b]
        cu = jnp.arange(B + 1, dtype=jnp.int32)
    else:
        cu = cu_q_lens.astype(jnp.int32)
    q_lens = cu[1:] - cu[:-1]

    V = min(W, T // bs + 2)  # static per-sequence touched-block bound
    w0 = jnp.maximum(ctx, 0) // bs  # first touched logical block
    logical = w0[:, None] + jnp.arange(V, dtype=jnp.int32)[None, :]  # (B,V)
    in_table = logical < W
    pid = jnp.where(
        in_table, block_table[jnp.arange(B)[:, None], jnp.clip(logical, 0, W - 1)], -1
    ).astype(jnp.int32)

    # token index of each (b, slot, row) and its validity
    pos = logical[..., None] * bs + jnp.arange(bs, dtype=jnp.int32)  # (B,V,bs)
    tok = cu[:-1][:, None, None] + pos - ctx[:, None, None]
    new_here = (pos >= ctx[:, None, None]) & (pos < (ctx + q_lens)[:, None, None])
    new_here &= (pid >= 0)[..., None]
    tok_safe = jnp.clip(tok, 0, T - 1)

    # only write back blocks that actually receive tokens
    pid = jnp.where(new_here.any(-1) & (pid >= 0), pid, N)
    return pid, jnp.clip(pid, 0, N - 1), tok_safe, new_here


def _f16_block_merge_store(
    key_states, value_states, key_cache, value_cache,
    block_table, cu_q_lens, context_kv_lens, nhd: bool,
):
    """f16 store as a block-window gather -> register merge -> scatter.

    XLA:TPU has no native f16 ALU: the token-row scatter converts the
    whole cache per call (measured 50-2500 µs where the bf16 twin costs
    ~5 µs), and a bf16 bitcast round-trip copies the cache twice
    (tools/exp_f16_store.py).  Data movement at BLOCK granularity stays
    native: gather the <= min(W, T//bs + 2) blocks per sequence that can
    contain new tokens, merge the new token rows in registers (converts
    fuse into the gather/scatter, never touching HBM), and scatter the
    merged block images back as wide rows.  Traffic = touched blocks
    read+write only; every published f16 row lands at or under the
    reference's 910B latency envelope.
    """
    if nhd:
        N, bs, H, D = key_cache.shape
    else:
        N, H, bs, D = key_cache.shape
    T = key_states.shape[0]
    pid, pid_safe, tok_safe, new_here = _block_window_plan(
        block_table, cu_q_lens, context_kv_lens, bs, T, N)

    def merge(cache, new):
        cur = cache[pid_safe]  # (B,V,bs,H,D) NHD / (B,V,H,bs,D) HND
        if nhd:
            picked = new[tok_safe]  # (B,V,bs,H,D)
            keep = new_here[..., None, None]
        else:
            # gather token-major (B*V*bs rows of contiguous (H,D)), then
            # transpose in-slab: a direct (slot-row, head) gather would be
            # B*V*H*bs scatter-sized rows — row-rate bound (~800 µs at the
            # (16,16,32,128) published row vs ~35 µs this way)
            picked = jnp.swapaxes(new[tok_safe], 2, 3)  # -> (B,V,H,bs,D)
            keep = new_here[:, :, None, :, None]
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
        if chunk_metadata is None and key_cache.dtype == jnp.float16:
            return _f16_block_merge_store(
                key_states, value_states, key_cache, value_cache,
                block_table, cu_q_lens, context_kv_lens,
                nhd=self.kv_layout == "NHD",
            )
        if cu_q_lens is None or chunk_metadata is not None:
            # decode fast path / explicit plans: the golden scatter is right
            return super().forward(
                key_states, value_states, key_cache, value_cache,
                block_table, cu_q_lens, context_kv_lens,
                chunk_metadata=chunk_metadata,
            )
        assert key_states.ndim == 3 and key_states.shape == value_states.shape
        nhd = self.kv_layout == "NHD"
        bs = key_cache.shape[1] if nhd else key_cache.shape[2]
        Hkv, D = key_states.shape[1], key_states.shape[2]

        blk, src, off, length = _chunk_plan(block_table, cu_q_lens, context_kv_lens, bs)
        blk_safe = jnp.clip(blk, 0, key_cache.shape[0] - 1)

        # pad token rows so dynamic_slice at (src - off + bs) is in range
        def pad(x):
            return jnp.pad(x, ((bs, bs), (0, 0), (0, 0))).astype(key_cache.dtype)

        k_pad, v_pad = pad(key_states), pad(value_states)
        rows = jnp.arange(bs, dtype=jnp.int32)

        def body(i, caches):
            kc, vc = caches
            b, s, o, L = blk_safe[i], src[i], off[i], length[i]
            # block row r holds token (s - o) + r for r in [o, o+L)
            start = s - o + bs
            k_slab = jax.lax.dynamic_slice(k_pad, (start, 0, 0), (bs, Hkv, D))
            v_slab = jax.lax.dynamic_slice(v_pad, (start, 0, 0), (bs, Hkv, D))
            keep = ((rows >= o) & (rows < o + L))[:, None, None]
            if nhd:
                cur_k = jax.lax.dynamic_slice(kc, (b, 0, 0, 0), (1, bs, Hkv, D))[0]
                cur_v = jax.lax.dynamic_slice(vc, (b, 0, 0, 0), (1, bs, Hkv, D))[0]
                new_k = jnp.where(keep, k_slab, cur_k)
                new_v = jnp.where(keep, v_slab, cur_v)
                kc = jax.lax.dynamic_update_slice(kc, new_k[None], (b, 0, 0, 0))
                vc = jax.lax.dynamic_update_slice(vc, new_v[None], (b, 0, 0, 0))
            else:  # HND (N, Hkv, bs, D): slab transposed to (Hkv, bs, D)
                cur_k = jax.lax.dynamic_slice(kc, (b, 0, 0, 0), (1, Hkv, bs, D))[0]
                cur_v = jax.lax.dynamic_slice(vc, (b, 0, 0, 0), (1, Hkv, bs, D))[0]
                keep_t = jnp.swapaxes(keep, 0, 1)  # (1->Hkv broadcast, bs, 1)
                new_k = jnp.where(keep_t, jnp.swapaxes(k_slab, 0, 1), cur_k)
                new_v = jnp.where(keep_t, jnp.swapaxes(v_slab, 0, 1), cur_v)
                kc = jax.lax.dynamic_update_slice(kc, new_k[None], (b, 0, 0, 0))
                vc = jax.lax.dynamic_update_slice(vc, new_v[None], (b, 0, 0, 0))
            return kc, vc

        key_cache, value_cache = jax.lax.fori_loop(
            0, blk.shape[0], body, (key_cache, value_cache)
        )
        return key_cache, value_cache


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
        return _f16_block_merge_store(
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
        pid, pid_safe, tok_safe, new_here = _block_window_plan(
            block_table, cu_q_lens, context_kv_lens, bs, T, N)

        def merge(cache, new2d, d_valid):
            D = cache.shape[-1]
            if new2d.shape[-1] < D:  # lane-padded k_pe cache
                new2d = jnp.pad(new2d, ((0, 0), (0, D - new2d.shape[-1])))
            cur = cache[pid_safe]  # (B, V, 1, bs, D)
            picked = new2d[tok_safe][:, :, None, :, :].astype(cache.dtype)
            keep = new_here[:, :, None, :, None] & (
                jnp.arange(D, dtype=jnp.int32) < d_valid)
            merged = jnp.where(keep, picked, cur)
            return cache.at[pid].set(merged, mode="drop", unique_indices=True)

        return (
            merge(compressed_kv_cache, compressed_kv_states,
                  compressed_kv_states.shape[-1]),
            merge(k_pe_cache, k_pe_states, k_pe_states.shape[-1]),
        )
