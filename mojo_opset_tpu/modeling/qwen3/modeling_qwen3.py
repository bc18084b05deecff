"""Qwen3 dense reference model (TPU-native, functional).

Capability parity with reference mojo_opset/modeling/qwen3/mojo_qwen3_dense.py
(Qwen3ForCausalLM built entirely from Mojo ops: RMSNorm, ApplyRoPE, Silu,
PagedPrefill/DecodeGQA, StorePagedKVCache; :216-401) — re-designed for JAX:
  * packed varlen token layout (T, hidden) for prefill, (B, hidden) decode;
  * the KV caches thread functionally through the forward
    (``(logits, new_caches) = model(ids, positions, metadata, caches)``),
    so the whole step jits with donated caches;
  * backend tier selection is invisible to the model: it imports only core
    op names (reference modeling convention, SURVEY §1 L6->L3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.module import Module
from mojo_opset_tpu.core.operators import (
    MojoApplyRoPE,
    MojoDynamicQuant,
    MojoEmbedding,
    MojoGemm,
    MojoPagedDecodeGQA,
    MojoPagedPrefillGQA,
    MojoQuantGemm,
    MojoRMSNorm,
    MojoRMSNormQuant,
    MojoRotaryEmbedding,
    MojoSdpa,
    MojoSilu,
    MojoStorePagedKVCache,
)
from mojo_opset_tpu.runtime.config import MojoConfig, MojoModelConfig
from mojo_opset_tpu.runtime.session import AttentionMetadata, KVCaches


@dataclass
class Qwen3Config:
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    num_hidden_layers: int = 32
    head_dim: int = 128
    vocab_size: int = 151936
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    attention_bias: bool = False
    tie_word_embeddings: bool = False
    dtype: object = jnp.bfloat16
    kv_layout: str = "NHD"  # TPU-native paged-cache layout (in-place stores)
    # "w8a8": int8 weights + per-token dynamic int8 activations on every
    # projection (QuantGemm/RMSNormQuant/DynamicQuant chain — the fusion
    # the reference designed those ops for). Decode is HBM-bound, so
    # halving the weight bytes converts ~directly into tokens/sec.
    quant: Optional[str] = None
    # int8 (C8) KV cache: per-channel scales self-calibrated at prefill
    # (amax/127 + headroom), decode reads through the KV-dequant attention
    # ops. Halves the KV side of the decode HBM traffic. Forces HND layout.
    quant_kv: bool = False

    def to_mojo(self) -> MojoConfig:
        return MojoConfig(
            model_config=MojoModelConfig(
                model_name="qwen3",
                hidden_size=self.hidden_size,
                embed_dim=self.hidden_size,
                head_dim=self.head_dim,
                num_heads=self.num_attention_heads,
                num_kv_heads=self.num_key_value_heads,
                num_layers=self.num_hidden_layers,
                vocab_size=self.vocab_size,
                max_position_embeddings=self.max_position_embeddings,
                dtype=self.dtype,
                rope_theta=self.rope_theta,
                rms_norm_eps=self.rms_norm_eps,
                intermediate_size=self.intermediate_size,
                tie_word_embeddings=self.tie_word_embeddings,
                kv_layout="HND" if self.quant_kv else self.kv_layout,
                kv_cache_quant=self.quant_kv,
            )
        )


class Qwen3Attention(Module):
    def __init__(self, config: Qwen3Config, key: jax.Array):
        c = config
        ks = jax.random.split(key, 4)
        H, Hkv, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        self.num_heads = H
        self.num_kv_heads = Hkv
        self.head_dim = D
        bias = c.attention_bias
        # dense w4a8 packs int4 into every projection via the extended
        # MojoQuantGemm weight_dtype="int4" contract (beyond the reference,
        # which ships int4 only for MoE experts — moe.py:452-667)
        self.quant = c.quant in ("w8a8", "w4a8")
        if self.quant:
            assert not bias, "quantized serving mode has no projection-bias support"
            # w4a8 packs int4 per projection; widths the 128-row pack
            # layout cannot cover stay int8 (gemm.py INT4_BLOCK)
            from mojo_opset_tpu.core.operators.gemm import INT4_BLOCK

            def mk(k, n, _q=c.quant, _dt=c.dtype):
                wdt = "int4" if _q == "w4a8" and n % INT4_BLOCK == 0 else "int8"
                return MojoQuantGemm(k, n, output_dtype=_dt,
                                     trans_weight=True, weight_dtype=wdt)
            self.q_proj = mk(c.hidden_size, H * D)
            self.k_proj = mk(c.hidden_size, Hkv * D)
            self.v_proj = mk(c.hidden_size, Hkv * D)
            self.o_proj = mk(H * D, c.hidden_size)
            self.attn_quant = MojoDynamicQuant()
        else:
            self.q_proj = MojoGemm(c.hidden_size, H * D, bias=bias, key=ks[0], dtype=c.dtype)
            self.k_proj = MojoGemm(c.hidden_size, Hkv * D, bias=bias, key=ks[1], dtype=c.dtype)
            self.v_proj = MojoGemm(c.hidden_size, Hkv * D, bias=bias, key=ks[2], dtype=c.dtype)
            self.o_proj = MojoGemm(H * D, c.hidden_size, bias=False, key=ks[3], dtype=c.dtype)
        # Qwen3 per-head q/k RMSNorm over head_dim
        self.q_norm = MojoRMSNorm(D, eps=c.rms_norm_eps)
        self.k_norm = MojoRMSNorm(D, eps=c.rms_norm_eps)
        self.apply_rope = MojoApplyRoPE()
        self.quant_kv = c.quant_kv
        if self.quant_kv:
            from mojo_opset_tpu.experimental.operators import (
                MojoPagedDecodeGQAWithKVDequant,
                MojoPagedPrefillGQAWithKVDequant,
                MojoStorePagedKVCacheC8,
            )

            self.store_kv = MojoStorePagedKVCacheC8()
            self.attn_prefill = MojoPagedPrefillGQAWithKVDequant(
                gqa_layout="AABB", query_dtype=c.dtype, compute_dtype=c.dtype)
            self.attn_decode = MojoPagedDecodeGQAWithKVDequant(
                gqa_layout="AABB", query_dtype=c.dtype, compute_dtype=c.dtype)
        else:
            self.store_kv = MojoStorePagedKVCache(kv_layout=c.kv_layout)
            self.attn_prefill = MojoPagedPrefillGQA(gqa_layout="AABB", kv_layout=c.kv_layout)
            self.attn_decode = MojoPagedDecodeGQA(gqa_layout="AABB", kv_layout=c.kv_layout)

    def __call__(
        self,
        hidden: jax.Array,  # (T, hidden)
        cos: jax.Array,
        sin: jax.Array,
        meta: AttentionMetadata,
        caches: KVCaches,
        layer_idx: int,
    ):
        if self.quant:
            x_q, x_s = hidden  # quantized by the decoder layer's RMSNormQuant
            T = x_q.shape[0]
            q = self.q_proj(x_q, x_s).reshape(T, self.num_heads, self.head_dim)
            k = self.k_proj(x_q, x_s).reshape(T, self.num_kv_heads, self.head_dim)
            v = self.v_proj(x_q, x_s).reshape(T, self.num_kv_heads, self.head_dim)
        else:
            T = hidden.shape[0]
            q = self.q_proj(hidden).reshape(T, self.num_heads, self.head_dim)
            k = self.k_proj(hidden).reshape(T, self.num_kv_heads, self.head_dim)
            v = self.v_proj(hidden).reshape(T, self.num_kv_heads, self.head_dim)
        q = self.q_norm(q)
        k = self.k_norm(k)
        q, k = self.apply_rope(q, k, cos, sin, head_first=False)

        key_cache, value_cache = caches.key(layer_idx), caches.value(layer_idx)
        if self.quant_kv:
            ks, vs = caches.key_scale(layer_idx), caches.value_scale(layer_idx)
            if meta.is_prefill:
                # self-calibrate the per-channel scales from the FIRST
                # prefill (+25% headroom), then FREEZE them: cached int8
                # was quantized under the current scales, so growing them
                # later would retroactively inflate every stored K/V
                # (chunked prefill / continuous batching share one cache).
                # Later out-of-range tokens clip at +-127 — bounded error,
                # the standard static-quant contract.
                calibrated = jnp.max(ks) > 0
                cand_ks = jnp.maximum(
                    jnp.max(jnp.abs(k.astype(jnp.float32)), axis=0) / 127.0 * 1.25, 1e-6)
                cand_vs = jnp.maximum(
                    jnp.max(jnp.abs(v.astype(jnp.float32)), axis=0) / 127.0 * 1.25, 1e-6)
                ks = jnp.where(calibrated, ks, cand_ks)
                vs = jnp.where(calibrated, vs, cand_vs)
                caches = caches.update_scales(layer_idx, ks, vs)
            key_cache, value_cache = self.store_kv(
                k, v, key_cache, value_cache, ks, vs,
                meta.block_tables,
                meta.cu_q_lens if meta.is_prefill else None,
                meta.context_kv_lens,
            )
        else:
            key_cache, value_cache = self.store_kv(
                k, v, key_cache, value_cache,
                meta.block_tables,
                meta.cu_q_lens if meta.is_prefill else None,
                meta.context_kv_lens,
            )
        caches = caches.update(layer_idx, key_cache, value_cache)

        if meta.is_prefill:
            cu_total = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(meta.total_seq_lens)]
            ).astype(jnp.int32)
            if self.quant_kv:
                attn = self.attn_prefill(
                    q, None, key_cache, ks, value_cache, vs,
                    meta.cu_q_lens, meta.block_tables, None, cu_total,
                )
            else:
                attn = self.attn_prefill(
                    q, key_cache, value_cache, meta.cu_q_lens, meta.block_tables,
                    None, cu_total,
                )
        elif self.quant_kv:
            attn = self.attn_decode(
                q, None, key_cache, ks, value_cache, vs,
                meta.total_seq_lens, meta.block_tables,
            )
        else:
            attn = self.attn_decode(
                q, key_cache, value_cache, meta.total_seq_lens, meta.block_tables
            )
        attn = attn.reshape(T, self.num_heads * self.head_dim)
        if self.quant:
            a_q, a_s = self.attn_quant(attn)
            out = self.o_proj(a_q, a_s)
        else:
            out = self.o_proj(attn)
        return out, caches

    def dense_forward(self, hidden: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
        """Non-paged causal self-attention for training, (B, S, hidden) in/out."""
        B, S, _ = hidden.shape
        q = self.q_proj(hidden).reshape(B, S, self.num_heads, self.head_dim)
        k = self.k_proj(hidden).reshape(B, S, self.num_kv_heads, self.head_dim)
        v = self.v_proj(hidden).reshape(B, S, self.num_kv_heads, self.head_dim)
        q = self.q_norm(q)
        k = self.k_norm(k)
        q, k = self.apply_rope(q, k, cos, sin, head_first=False)
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        sdpa = MojoSdpa(enable_gqa=True)
        causal = jnp.tril(jnp.ones((S, S), bool))
        o = sdpa(q, k, v, attn_mask=causal)
        o = jnp.swapaxes(o, 1, 2).reshape(B, S, -1)
        return self.o_proj(o)


class Qwen3MLP(Module):
    def __init__(self, config: Qwen3Config, key: jax.Array):
        c = config
        ks = jax.random.split(key, 3)
        self.quant = c.quant in ("w8a8", "w4a8")
        if self.quant:
            from mojo_opset_tpu.core.operators.gemm import INT4_BLOCK

            def mk(k, n, _q=c.quant, _dt=c.dtype):
                wdt = "int4" if _q == "w4a8" and n % INT4_BLOCK == 0 else "int8"
                return MojoQuantGemm(k, n, output_dtype=_dt,
                                     trans_weight=True, weight_dtype=wdt)
            self.gate_proj = mk(c.hidden_size, c.intermediate_size)
            self.up_proj = mk(c.hidden_size, c.intermediate_size)
            self.down_proj = mk(c.intermediate_size, c.hidden_size)
            self.act_quant = MojoDynamicQuant()
        else:
            self.gate_proj = MojoGemm(c.hidden_size, c.intermediate_size, bias=False, key=ks[0], dtype=c.dtype)
            self.up_proj = MojoGemm(c.hidden_size, c.intermediate_size, bias=False, key=ks[1], dtype=c.dtype)
            self.down_proj = MojoGemm(c.intermediate_size, c.hidden_size, bias=False, key=ks[2], dtype=c.dtype)
        self.act = MojoSilu()

    def __call__(self, x) -> jax.Array:
        if self.quant:
            x_q, x_s = x  # quantized by the decoder layer's RMSNormQuant
            h = self.act(self.gate_proj(x_q, x_s)) * self.up_proj(x_q, x_s)
            h_q, h_s = self.act_quant(h)
            return self.down_proj(h_q, h_s)
        return self.down_proj(self.act(self.gate_proj(x)) * self.up_proj(x))


class Qwen3DecoderLayer(Module):
    def __init__(self, config: Qwen3Config, key: jax.Array):
        k1, k2 = jax.random.split(key)
        norm_cls = (
            MojoRMSNormQuant if config.quant in ("w8a8", "w4a8") else MojoRMSNorm
        )  # fused norm+quant feeds int8 straight into the projections
        self.input_layernorm = norm_cls(config.hidden_size, eps=config.rms_norm_eps)
        self.self_attn = Qwen3Attention(config, k1)
        self.post_attention_layernorm = norm_cls(config.hidden_size, eps=config.rms_norm_eps)
        self.mlp = Qwen3MLP(config, k2)

    def __call__(self, hidden, cos, sin, meta, caches, layer_idx):
        residual = hidden
        hidden = self.input_layernorm(hidden)
        attn_out, caches = self.self_attn(hidden, cos, sin, meta, caches, layer_idx)
        hidden = residual + attn_out
        residual = hidden
        hidden = self.post_attention_layernorm(hidden)
        hidden = residual + self.mlp(hidden)
        return hidden, caches

    def dense_forward(self, hidden, cos, sin):
        residual = hidden
        hidden = self.input_layernorm(hidden)
        hidden = residual + self.self_attn.dense_forward(hidden, cos, sin)
        residual = hidden
        hidden = residual + self.mlp(self.post_attention_layernorm(hidden))
        return hidden


class Qwen3Model(Module):
    def __init__(self, config: Qwen3Config, key: jax.Array):
        keys = jax.random.split(key, config.num_hidden_layers + 1)
        self.embed_tokens = MojoEmbedding(
            config.vocab_size, config.hidden_size, key=keys[0], dtype=config.dtype
        )
        self.layers = [Qwen3DecoderLayer(config, keys[i + 1]) for i in range(config.num_hidden_layers)]
        self.norm = MojoRMSNorm(config.hidden_size, eps=config.rms_norm_eps)
        self.rotary_emb = MojoRotaryEmbedding(config.rope_theta, config.head_dim)

    def __call__(self, input_ids, positions, meta, caches):
        hidden = self.embed_tokens(input_ids)
        cos, sin = self.rotary_emb(hidden, position_ids=positions.astype(jnp.int32))
        cos = cos.astype(hidden.dtype)
        sin = sin.astype(hidden.dtype)
        for layer_idx, layer in enumerate(self.layers):
            hidden, caches = layer(hidden, cos, sin, meta, caches, layer_idx)
        return self.norm(hidden), caches

    def dense_forward(self, input_ids: jax.Array) -> jax.Array:
        """Training forward: full causal attention over padded (B, S) ids."""
        if any(getattr(l.self_attn, "quant", False) for l in self.layers):
            raise NotImplementedError(
                "serving-mode (quant) models are inference-only; train the fp "
                "model and quantize post-training"
            )
        B, S = input_ids.shape
        hidden = self.embed_tokens(input_ids)
        positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
        cos, sin = self.rotary_emb(hidden, position_ids=positions)
        cos = cos.astype(hidden.dtype)
        sin = sin.astype(hidden.dtype)
        for layer in self.layers:
            hidden = layer.dense_forward(hidden, cos, sin)
        return self.norm(hidden)


class Qwen3ForCausalLM(Module):
    """Functional paged-generation Qwen3.

    ``forward(input_ids, positions, metadata, caches, lm_head_indices)``
    returns ``(logits, new_caches)``; with ``lm_head_indices`` only the
    last token of each prefill sequence hits the LM head (reference
    runtime.py:263-266 trick).
    """

    def __init__(self, config: Qwen3Config, key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        self._config = config
        self.model = Qwen3Model(config, k1)
        self.lm_head_quant = (
            MojoDynamicQuant() if config.quant in ("w8a8", "w4a8") and not config.tie_word_embeddings
            else None
        )
        if config.tie_word_embeddings:
            self.lm_head = None
        elif config.quant in ("w8a8", "w4a8"):
            # the lm_head stays int8 under w4a8: per-channel int4 over the
            # 151936-way softmax axis costs measurable logit fidelity for
            # ~9% of the weight bytes
            self.lm_head = MojoQuantGemm(
                config.hidden_size, config.vocab_size,
                output_dtype=config.dtype, trans_weight=True,
            )
        else:
            self.lm_head = MojoGemm(
                config.hidden_size, config.vocab_size, bias=False, key=k2, dtype=config.dtype
            )

    @property
    def config(self) -> MojoConfig:
        return self._config.to_mojo()

    @property
    def qwen3_config(self) -> Qwen3Config:
        return self._config

    def __call__(self, input_ids, positions, meta, caches, lm_head_indices=None):
        hidden, caches = self.model(input_ids, positions, meta, caches)
        if lm_head_indices is not None:
            hidden = hidden[lm_head_indices]
        if self.lm_head is None:
            logits = hidden @ self.model.embed_tokens.weight.T
        elif self.lm_head_quant is not None:
            h_q, h_s = self.lm_head_quant(hidden)
            logits = self.lm_head(h_q, h_s)
        else:
            logits = self.lm_head(hidden)
        return logits.astype(jnp.float32), caches

    @property
    def lm_head_weight(self) -> jax.Array:
        """LM-head projection weight (vocab, hidden), tied or owned."""
        return self.model.embed_tokens.weight if self.lm_head is None else self.lm_head.weight

    def train_forward(self, input_ids: jax.Array) -> jax.Array:
        """Dense (non-paged) training forward over padded (B, S) ids.

        Returns final hidden states (B, S, hidden); pair with
        ``fused_linear_cross_entropy(hidden, lm_head_weight, targets)`` for
        the training loss (reference trains through the same op stack,
        mojo_opset/core/functions/loss_function.py:10-160).
        """
        return self.model.dense_forward(input_ids)
