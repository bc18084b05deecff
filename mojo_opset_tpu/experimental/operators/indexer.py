"""DeepSeek-V3.2 lightning indexer (top-k token selection scores).

Parity: reference mojo_opset/experimental/operators/indexer.py
(MojoLightningIndexer :18, MojoIndexer :87).

TPU notes: the lightning score is fully vectorized (one einsum + relu +
head-sum instead of the reference's per-(batch, position) loops); the
stateful MojoIndexer threads its int8 key caches functionally — forward
takes and returns ``(k_cache, k_scale_cache)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators import (
    MojoApplyRoPE,
    MojoDynamicQuant,
    MojoGemm,
    MojoLayerNorm,
)
from mojo_opset_tpu.experimental.operators.activation import MojoRotateActivation


class MojoLightningIndexer(MojoOperator):
    def forward(
        self,
        query: jax.Array,  # (B, M, H, K)
        query_scale: jax.Array,  # (B, M, H)
        key: jax.Array,  # (B, N, K)
        key_scale: Optional[jax.Array] = None,  # (B, N) or (N,)
    ) -> jax.Array:
        """index_score (B, M, N) = sum_h relu(q_h . k) * q_scale_h * k_scale."""
        B, M, H, K = query.shape
        N = key.shape[1]
        assert query_scale.shape == (B, M, H), (
            f"query_scale must be [B, M, H], got {query_scale.shape}"
        )
        if key_scale is None:
            key_scale = jnp.ones((B, N), jnp.float32)
        elif key_scale.ndim == 1:
            assert key_scale.shape[0] == N
            key_scale = jnp.broadcast_to(key_scale.astype(jnp.float32)[None], (B, N))
        else:
            assert key_scale.shape == (B, N), f"key_scale must be [B, N], got {key_scale.shape}"

        dots = jnp.einsum(
            "bmhk,bnk->bmhn", query.astype(jnp.float32), key.astype(jnp.float32)
        )
        relu = jnp.maximum(dots, 0.0)
        scored = relu * query_scale.astype(jnp.float32)[..., None]
        return jnp.sum(scored, axis=2) * key_scale[:, None, :]


class MojoIndexer(MojoOperator):
    """Full indexer block: q LoRA proj, k norm/proj, RoPE, Hadamard
    rotation, dynamic quant, lightning score, top-k selection."""

    def __init__(
        self,
        dim: int = 7168,
        n_heads: int = 128,
        head_dim: int = 128,
        qk_rope_head_dim: int = 64,
        topk: int = 2048,
        q_lora_rank: int = 1536,
        max_batch_size: int = 128,
        max_seq_len: int = 32768,
        key=None,
    ):
        super().__init__()
        self.dim = dim
        self.n_heads = n_heads
        self.head_dim = head_dim
        self.rope_head_dim = qk_rope_head_dim
        self.topk = topk
        self.q_lora_rank = q_lora_rank
        self.softmax_scale = head_dim**-0.5
        self.max_batch_size = max_batch_size
        self.max_seq_len = max_seq_len
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)

        self.wq_b = MojoGemm(q_lora_rank, n_heads * head_dim, bias=False, key=k1)
        self.wk = MojoGemm(dim, head_dim, bias=False, key=k2)
        self.k_norm = MojoLayerNorm._registry.get(self._backend)(head_dim)
        self.weights_proj = MojoGemm(dim, n_heads, bias=False, key=k3)
        self.rope = MojoApplyRoPE._registry.get(self._backend)()
        self.activation = MojoRotateActivation._registry.get(self._backend)()
        self.quant = MojoDynamicQuant._registry.get(self._backend)()
        self.lightning_indexer = MojoLightningIndexer._registry.get(self._backend)()

    def init_cache(self, batch_size: Optional[int] = None, seq_len: Optional[int] = None):
        b = batch_size or self.max_batch_size
        s = seq_len or self.max_seq_len
        return (
            jnp.zeros((b, s, self.head_dim), jnp.int8),
            jnp.zeros((b, s), jnp.float32),
        )

    def forward(
        self,
        x: jax.Array,  # (B, S, dim)
        qr: jax.Array,  # (B, S, q_lora_rank)
        start_pos: int,
        freqs_cis: jax.Array,  # complex (S, rope_dim/2)
        mask: Optional[jax.Array],
        k_cache: jax.Array,  # (B, max_seq, head_dim) int8
        k_scale_cache: jax.Array,  # (B, max_seq) fp32
    ):
        bsz, seqlen, _ = x.shape
        end_pos = start_pos + seqlen

        q = self.wq_b(qr).reshape(bsz, seqlen, self.n_heads, self.head_dim)
        k = self.k_norm(self.wk(jax.lax.stop_gradient(x)))

        cos_half, sin_half = jnp.real(freqs_cis), jnp.imag(freqs_cis)
        cos = jnp.concatenate([cos_half, cos_half], axis=-1)
        sin = jnp.concatenate([sin_half, sin_half], axis=-1)
        k = k[:, :, None, :]
        q, k = self.rope(q, k, cos, sin, head_first=False)
        k = k[:, :, 0, :]

        q = self.activation(q)
        k = self.activation(k)

        q_quant, q_scale = self.quant(q)
        k_quant, k_scale = self.quant(k)
        q_scale = q_scale[..., 0]
        if k_scale.ndim == 3:
            k_scale = jnp.max(k_scale, axis=-1)

        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_quant.astype(k_cache.dtype), (0, start_pos, 0)
        )
        k_scale_cache = jax.lax.dynamic_update_slice(
            k_scale_cache, k_scale.astype(jnp.float32), (0, start_pos)
        )

        weights = self.weights_proj(x.astype(jnp.float32)) * self.n_heads**-0.5
        weights = weights * q_scale * self.softmax_scale

        index_score = self.lightning_indexer(
            q_quant.astype(jnp.float32),
            weights,
            key=k_cache[:bsz, :end_pos].astype(jnp.float32),
            key_scale=k_scale_cache[:bsz, :end_pos],
        )
        if mask is not None:
            index_score = index_score + mask
        k_sel = min(self.topk, end_pos)
        _, topk_indices = jax.lax.top_k(index_score, k_sel)
        return topk_indices, index_score, k_cache, k_scale_cache

    def extra_repr(self) -> str:
        return (
            f"dim={self.dim}, n_heads={self.n_heads}, head_dim={self.head_dim}, "
            f"rope_head_dim={self.rope_head_dim}, topk={self.topk}, "
            f"q_lora_rank={self.q_lora_rank}"
        )
