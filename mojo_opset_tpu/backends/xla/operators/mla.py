"""XLA-tier MLA attention: absorbed-MQA flash scan over latent blocks.

The golden paged MLA tiers gather the whole latent cache and decompress
every cached position through ``kv_b_proj`` on every call —
O(K · H · (dn+dv) · r) work and a full-cache materialization per decode
step.  This tier uses the standard weight-absorption identity:

    score = q_nopeᵀ (W_uk c) = (W_ukᵀ q_nope)ᵀ c
    out   = W_uv (p · c)

so attention runs as multi-query attention directly in the latent space
(head dim r + dr), the per-position decompression disappears, and the
cache streams block-by-block with an online-softmax carry.

Replaces the reference TTX MLA kernels as the accelerated tier
(reference experimental/operators/attention.py:45-460).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.experimental.operators.mla import (
    MojoPagedDecodeMLA,
    MojoPagedPrefillMLA,
)

_NEG = -1e30


def _absorb_weights(op):
    """kv_b_proj (H*(dn+dv), r) -> W_uk (H, dn, r), W_uv (H, dv, r)."""
    H, dn, dv = op.num_heads, op.qk_nope_head_dim, op.v_head_dim
    w = op.kv_b_proj.astype(jnp.float32).reshape(H, dn + dv, -1)
    return w[:, :dn, :], w[:, dn:, :]


def _finish(m, l, acc_lat, w_uv, attn_sink, seq_ok, out_dtype):
    if attn_sink is not None:
        l = l + jnp.exp(attn_sink.astype(jnp.float32)[None, :] - m)
    out_lat = acc_lat / jnp.maximum(l, 1e-38)[..., None]  # (..., H, r)
    out = jnp.einsum("...hr,hdr->...hd", out_lat, w_uv)
    out = jnp.where(seq_ok, out, 0.0)
    return out.astype(out_dtype)


class XlaPagedDecodeMLA(MojoPagedDecodeMLA):
    def forward(
        self,
        query: jax.Array,  # (B, H, dn + dr)
        compressed_kv_cache: jax.Array,  # (N, 1, bs, r)
        k_pe_cache: jax.Array,  # (N, 1, bs, dr)
        total_seq_lens: jax.Array,
        block_tables: jax.Array,
        softmax_scale: Optional[float] = None,
    ) -> jax.Array:
        B, H, _ = query.shape
        dn, dr = self.qk_nope_head_dim, self.qk_rope_head_dim
        bs = compressed_kv_cache.shape[2]
        NB = block_tables.shape[1]
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(self.qk_head_dim)

        w_uk, w_uv = _absorb_weights(self)
        q = query.astype(jnp.float32) * softmax_scale
        q_lat = jnp.einsum("bhd,hdr->bhr", q[..., :dn], w_uk)  # (B, H, r)
        q_pe = q[..., dn:]

        def body(carry, logical_block):
            m, l, acc = carry
            phys = block_tables[:, logical_block]  # (B,)
            safe = jnp.clip(phys, 0, compressed_kv_cache.shape[0] - 1)
            c = compressed_kv_cache[safe, 0].astype(jnp.float32)  # (B, bs, r)
            pe = k_pe_cache[safe, 0, :, :dr].astype(jnp.float32)  # (B, bs, dr)
            s = jnp.einsum("bhr,bsr->bhs", q_lat, c) + jnp.einsum(
                "bhd,bsd->bhs", q_pe, pe
            )
            kv_pos = logical_block * bs + jnp.arange(bs, dtype=jnp.int32)
            keep = (kv_pos[None, :] < total_seq_lens[:, None]) & (phys >= 0)[:, None]
            s = jnp.where(keep[:, None, :], s, _NEG)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.where(keep[:, None, :], jnp.exp(s - m_new[..., None]), 0.0)
            l_new = l * alpha + jnp.sum(p, axis=-1)
            acc_new = acc * alpha[..., None] + jnp.einsum("bhs,bsr->bhr", p, c)
            return (m_new, l_new, acc_new), None

        r = compressed_kv_cache.shape[-1]
        m0 = jnp.full((B, H), _NEG, jnp.float32)
        l0 = jnp.zeros((B, H), jnp.float32)
        acc0 = jnp.zeros((B, H, r), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(NB, dtype=jnp.int32))
        return _finish(
            m, l, acc, w_uv, self.attn_sink,
            (total_seq_lens > 0)[:, None, None], query.dtype,
        )


class XlaPagedPrefillMLA(MojoPagedPrefillMLA):
    def forward(
        self,
        query: jax.Array,  # (T, H, dn + dr)
        compressed_kv_cache: jax.Array,
        k_pe_cache: jax.Array,
        cu_q_lens: jax.Array,
        block_tables: jax.Array,
        softmax_scale: Optional[float] = None,
        cu_total_seq_lens: Optional[jax.Array] = None,
    ) -> jax.Array:
        from mojo_opset_tpu.core.operators.attention import seq_lens_from_cu

        T, H, _ = query.shape
        dn, dr = self.qk_nope_head_dim, self.qk_rope_head_dim
        bs = compressed_kv_cache.shape[2]
        B, NB = block_tables.shape
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(self.qk_head_dim)

        q_lens = seq_lens_from_cu(cu_q_lens)
        kv_lens = q_lens if cu_total_seq_lens is None else seq_lens_from_cu(cu_total_seq_lens)
        token_ids = jnp.arange(T, dtype=jnp.int32)
        token_batch = jnp.clip(
            jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1, 0, B - 1
        )
        q_pos = token_ids - cu_q_lens[token_batch]
        kv_len_t = kv_lens[token_batch]
        q_abs = kv_len_t - q_lens[token_batch] + q_pos

        w_uk, w_uv = _absorb_weights(self)
        q = query.astype(jnp.float32) * softmax_scale
        q_lat = jnp.einsum("thd,hdr->thr", q[..., :dn], w_uk)
        q_pe = q[..., dn:]

        def body(carry, logical_block):
            m, l, acc = carry
            phys = block_tables[token_batch, logical_block]  # (T,)
            safe = jnp.clip(phys, 0, compressed_kv_cache.shape[0] - 1)
            c = compressed_kv_cache[safe, 0].astype(jnp.float32)  # (T, bs, r)
            pe = k_pe_cache[safe, 0, :, :dr].astype(jnp.float32)
            s = jnp.einsum("thr,tsr->ths", q_lat, c) + jnp.einsum(
                "thd,tsd->ths", q_pe, pe
            )
            kv_pos = logical_block * bs + jnp.arange(bs, dtype=jnp.int32)
            keep = (kv_pos[None, :] < kv_len_t[:, None]) & (phys >= 0)[:, None]
            if self.is_causal:
                keep &= kv_pos[None, :] <= q_abs[:, None]
            s = jnp.where(keep[:, None, :], s, _NEG)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.where(keep[:, None, :], jnp.exp(s - m_new[..., None]), 0.0)
            l_new = l * alpha + jnp.sum(p, axis=-1)
            acc_new = acc * alpha[..., None] + jnp.einsum("ths,tsr->thr", p, c)
            return (m_new, l_new, acc_new), None

        r = compressed_kv_cache.shape[-1]
        m0 = jnp.full((T, H), _NEG, jnp.float32)
        l0 = jnp.zeros((T, H), jnp.float32)
        acc0 = jnp.zeros((T, H, r), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(NB, dtype=jnp.int32))
        return _finish(
            m, l, acc, w_uv, self.attn_sink,
            (kv_len_t > 0)[:, None, None], query.dtype,
        )
