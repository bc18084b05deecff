"""DeepSeek Multi-head Latent Attention (MLA) ops.

Parity: reference mojo_opset/experimental/operators/attention.py:45-455
(MojoDecodeMLA :45, MojoPagedDecodeMLA :131, MojoPrefillMLA :232,
MojoPagedPrefillMLA :325; attention-sink helper :14-43).

The KV cache stores the compressed latent ``c_kv (kv_lora_rank)`` plus
the positional key ``k_pe (qk_rope_head_dim)``; decompression happens
inside the op via the owned ``kv_b_proj`` parameter.  Paged caches are
shaped ``(N_blocks, 1, block_size, dim)``.

TPU notes: all four goldens are vectorized/jittable (block gathers with
clamped indices + length masks instead of per-batch ``.item()`` loops);
decompression is one MXU matmul over the gathered latents.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.attention import (
    assert_paged_decode_contract,
    assert_paged_prefill_contract,
    seq_lens_from_cu,
)
from mojo_opset_tpu.utils import init as winit

NEG_INF = float("-inf")


def attention_probs_with_optional_sink(scores, output_dtype, attn_sink):
    """fp32 softmax with an optional per-head sink column appended then
    dropped (reference :20-43); fully-masked rows produce zeros."""
    scores = scores.astype(jnp.float32)
    if attn_sink is not None:
        sink_shape = [1] * scores.ndim
        sink_shape[-2] = attn_sink.shape[0]
        sink = jnp.broadcast_to(
            attn_sink.astype(jnp.float32).reshape(sink_shape), scores.shape[:-1] + (1,)
        )
        scores = jnp.concatenate([scores, sink], axis=-1)
        probs = jax.nn.softmax(scores, axis=-1)[..., :-1]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.nan_to_num(probs, nan=0.0)
    return probs.astype(output_dtype)


class _MLAConfigMixin:
    def _init_mla(
        self, num_heads, qk_nope_head_dim, qk_rope_head_dim, v_head_dim,
        kv_lora_rank, use_attn_sink, key=None,
    ):
        self.num_heads = num_heads
        self.qk_nope_head_dim = qk_nope_head_dim
        self.qk_rope_head_dim = qk_rope_head_dim
        self.v_head_dim = v_head_dim
        self.kv_lora_rank = kv_lora_rank
        self.qk_head_dim = qk_nope_head_dim + qk_rope_head_dim
        self.use_attn_sink = use_attn_sink
        if key is None:
            key = jax.random.PRNGKey(0)
        bound = 1.0 / (kv_lora_rank**0.5)
        self.kv_b_proj = winit.uniform(
            key, (num_heads * (qk_nope_head_dim + v_head_dim), kv_lora_rank),
            jnp.float32, -bound, bound,
        )
        self.attn_sink = jnp.zeros((num_heads,), jnp.float32) if use_attn_sink else None

    def _decompress(self, c_kv: jax.Array):
        """c_kv (..., r) -> k_nope (..., H, dn), v (..., H, dv)."""
        kv = jnp.matmul(
            c_kv.astype(jnp.float32), self.kv_b_proj.T.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(c_kv.dtype)
        kv = kv.reshape(c_kv.shape[:-1] + (self.num_heads, self.qk_nope_head_dim + self.v_head_dim))
        return kv[..., : self.qk_nope_head_dim], kv[..., self.qk_nope_head_dim :]

    def extra_repr(self) -> str:
        return (
            f"num_heads={self.num_heads}, qk_nope_head_dim={self.qk_nope_head_dim}, "
            f"qk_rope_head_dim={self.qk_rope_head_dim}, v_head_dim={self.v_head_dim}, "
            f"kv_lora_rank={self.kv_lora_rank}, use_attn_sink={self.use_attn_sink}"
        )


def gather_paged_flat(cache: jax.Array, block_tables: jax.Array) -> jax.Array:
    """(N, 1, bs, D) + (B, NB) -> (B, NB*bs, D) with clamped indices."""
    bt = jnp.clip(block_tables, 0, cache.shape[0] - 1)
    g = cache[bt][:, :, 0]  # (B, NB, bs, D)
    B, NB, bs, D = g.shape
    return g.reshape(B, NB * bs, D)


class MojoDecodeMLA(_MLAConfigMixin, MojoOperator):
    """Non-paged MLA decode: q (B,H,dqk), c_kv (B,S,r), k_pe (B,S,1,dr)."""

    def __init__(
        self, num_heads, qk_nope_head_dim, qk_rope_head_dim, v_head_dim,
        kv_lora_rank, use_attn_sink: bool = False, key=None, **kwargs,
    ):
        super().__init__(**kwargs)
        self._init_mla(num_heads, qk_nope_head_dim, qk_rope_head_dim, v_head_dim,
                       kv_lora_rank, use_attn_sink, key)

    def forward(
        self,
        query: jax.Array,
        compressed_kv: jax.Array,
        k_pe: jax.Array,
        total_seq_lens: Optional[jax.Array] = None,
        softmax_scale: Optional[float] = None,
    ) -> jax.Array:
        B, H, _ = query.shape
        S = compressed_kv.shape[1]
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(self.qk_head_dim)

        k_nope, v = self._decompress(compressed_kv)  # (B,S,H,*)
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (B, S, H, self.qk_rope_head_dim))], axis=-1
        )
        scores = jnp.einsum(
            "bhd,bshd->bhs", query.astype(jnp.float32), k.astype(jnp.float32)
        ) * softmax_scale
        if total_seq_lens is not None:
            mask = jnp.arange(S)[None, None, :] < total_seq_lens[:, None, None]
            scores = jnp.where(mask, scores, NEG_INF)
        probs = attention_probs_with_optional_sink(scores, query.dtype, self.attn_sink)
        return jnp.einsum("bhs,bshd->bhd", probs, v).astype(query.dtype)


class MojoPagedDecodeMLA(_MLAConfigMixin, MojoOperator):
    """Paged MLA decode over latent block caches."""

    def __init__(
        self, num_heads, qk_nope_head_dim, qk_rope_head_dim, v_head_dim,
        kv_lora_rank, use_attn_sink: bool = False, key=None, **kwargs,
    ):
        super().__init__(**kwargs)
        self._init_mla(num_heads, qk_nope_head_dim, qk_rope_head_dim, v_head_dim,
                       kv_lora_rank, use_attn_sink, key)

    def forward(
        self,
        query: jax.Array,  # (B, H, dqk)
        compressed_kv_cache: jax.Array,  # (N, 1, bs, r)
        k_pe_cache: jax.Array,  # (N, 1, bs, dr)
        total_seq_lens: jax.Array,
        block_tables: jax.Array,
        softmax_scale: Optional[float] = None,
    ) -> jax.Array:
        assert_paged_decode_contract(block_tables, total_seq_lens)
        B, H, _ = query.shape
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(self.qk_head_dim)

        c_kv = gather_paged_flat(compressed_kv_cache, block_tables)  # (B, K, r)
        # rope cache may be lane-padded beyond dr (TPU DMA alignment)
        k_pe = gather_paged_flat(k_pe_cache, block_tables)[..., : self.qk_rope_head_dim]
        K = c_kv.shape[1]
        k_nope, v = self._decompress(c_kv)  # (B,K,H,*)
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe[:, :, None], (B, K, H, self.qk_rope_head_dim))],
            axis=-1,
        )
        scores = jnp.einsum(
            "bhd,bshd->bhs", query.astype(jnp.float32), k.astype(jnp.float32)
        ) * softmax_scale
        mask = jnp.arange(K)[None, None, :] < total_seq_lens[:, None, None]
        scores = jnp.where(mask, scores, NEG_INF)
        probs = attention_probs_with_optional_sink(scores, query.dtype, self.attn_sink)
        out = jnp.einsum("bhs,bshd->bhd", probs, v)
        out = jnp.where((total_seq_lens > 0)[:, None, None], out, 0)
        return out.astype(query.dtype)


class MojoPrefillMLA(_MLAConfigMixin, MojoOperator):
    """Varlen MLA prefill: q (T,H,dqk), c_kv (T,r), k_pe (T,1,dr)."""

    def __init__(
        self, num_heads, qk_nope_head_dim, qk_rope_head_dim, v_head_dim,
        kv_lora_rank, is_causal: bool = True, use_attn_sink: bool = False,
        key=None, **kwargs,
    ):
        super().__init__(**kwargs)
        self._init_mla(num_heads, qk_nope_head_dim, qk_rope_head_dim, v_head_dim,
                       kv_lora_rank, use_attn_sink, key)
        self.is_causal = is_causal

    def forward(
        self,
        query: jax.Array,
        compressed_kv: jax.Array,
        k_pe: jax.Array,
        cu_q_lens: jax.Array,
        softmax_scale: Optional[float] = None,
    ) -> jax.Array:
        assert cu_q_lens.dtype == jnp.int32
        T, H, _ = query.shape
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(self.qk_head_dim)

        k_nope, v_all = self._decompress(compressed_kv)  # (T,H,*)
        k_all = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (T, H, self.qk_rope_head_dim))], axis=-1
        )

        B = cu_q_lens.shape[0] - 1
        token_ids = jnp.arange(T, dtype=jnp.int32)
        token_batch = jnp.clip(
            jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1, 0, B - 1
        )
        pos = token_ids - cu_q_lens[token_batch]

        scores = jnp.einsum(
            "thd,shd->ths", query.astype(jnp.float32), k_all.astype(jnp.float32)
        ) * softmax_scale
        same = token_batch[:, None] == token_batch[None, :]
        keep = same
        if self.is_causal:
            keep = keep & (pos[:, None] >= pos[None, :])
        scores = jnp.where(keep[:, None, :], scores, NEG_INF)
        probs = attention_probs_with_optional_sink(scores, query.dtype, self.attn_sink)
        return jnp.einsum("ths,shd->thd", probs, v_all).astype(query.dtype)

    def extra_repr(self) -> str:
        return super().extra_repr() + f", is_causal={self.is_causal}"


class MojoPagedPrefillMLA(_MLAConfigMixin, MojoOperator):
    """Paged MLA prefill over latent block caches (chunked-prefill capable
    via cu_total_seq_lens)."""

    def __init__(
        self, num_heads, qk_nope_head_dim, qk_rope_head_dim, v_head_dim,
        kv_lora_rank, is_causal: bool = True, use_attn_sink: bool = False,
        key=None, **kwargs,
    ):
        super().__init__(**kwargs)
        self._init_mla(num_heads, qk_nope_head_dim, qk_rope_head_dim, v_head_dim,
                       kv_lora_rank, use_attn_sink, key)
        self.is_causal = is_causal

    def forward(
        self,
        query: jax.Array,  # (T, H, dqk)
        compressed_kv_cache: jax.Array,  # (N, 1, bs, r)
        k_pe_cache: jax.Array,
        cu_q_lens: jax.Array,
        block_tables: jax.Array,
        softmax_scale: Optional[float] = None,
        cu_total_seq_lens: Optional[jax.Array] = None,
    ) -> jax.Array:
        assert_paged_prefill_contract(cu_q_lens, block_tables, cu_total_seq_lens)
        T, H, _ = query.shape
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(self.qk_head_dim)

        q_lens = seq_lens_from_cu(cu_q_lens)
        kv_lens = q_lens if cu_total_seq_lens is None else seq_lens_from_cu(cu_total_seq_lens)
        B = q_lens.shape[0]

        c_kv = gather_paged_flat(compressed_kv_cache, block_tables)  # (B,K,r)
        k_pe = gather_paged_flat(k_pe_cache, block_tables)[..., : self.qk_rope_head_dim]
        K = c_kv.shape[1]
        k_nope, v = self._decompress(c_kv)
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe[:, :, None], (B, K, H, self.qk_rope_head_dim))],
            axis=-1,
        )

        token_ids = jnp.arange(T, dtype=jnp.int32)
        token_batch = jnp.clip(
            jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1, 0, B - 1
        )
        q_pos = token_ids - cu_q_lens[token_batch]
        kv_len_t = kv_lens[token_batch]
        q_abs = kv_len_t - q_lens[token_batch] + q_pos

        k_t = k[token_batch]  # (T, K, H, dqk) golden-tier gather
        v_t = v[token_batch]
        scores = jnp.einsum(
            "thd,tshd->ths", query.astype(jnp.float32), k_t.astype(jnp.float32)
        ) * softmax_scale
        kv_pos = jnp.arange(K, dtype=jnp.int32)[None, :]
        keep = kv_pos < kv_len_t[:, None]
        if self.is_causal:
            keep = keep & (kv_pos <= q_abs[:, None])
        scores = jnp.where(keep[:, None, :], scores, NEG_INF)
        probs = attention_probs_with_optional_sink(scores, query.dtype, self.attn_sink)
        out = jnp.einsum("ths,tshd->thd", probs, v_t)
        out = jnp.where((kv_len_t > 0)[:, None, None], out, 0)
        return out.astype(query.dtype)

    def extra_repr(self) -> str:
        return super().extra_repr() + f", is_causal={self.is_causal}"
