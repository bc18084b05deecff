"""Seed-OSS reference model (TPU-native, functional).

Capability parity with reference
mojo_opset/modeling/seed_oss/mojo_seed_oss_base.py (SeedOssForCausalLM):
the same paged-GQA stack as Qwen3 but with attention q/k/v bias, no
q/k per-head norms, and residual dropout (inference no-op).
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
    MojoSilu,
    MojoStorePagedKVCache,
)
from mojo_opset_tpu.runtime.config import MojoConfig, MojoModelConfig


@dataclass
class SeedOssConfig:
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    num_hidden_layers: int = 32
    head_dim: int = 128
    vocab_size: int = 100352
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000000.0
    attention_bias: bool = True
    attention_out_bias: bool = False
    mlp_bias: bool = False
    residual_dropout: float = 0.1  # inference no-op
    tie_word_embeddings: bool = False
    dtype: object = jnp.bfloat16
    kv_layout: str = "NHD"  # TPU-native paged-cache layout (in-place stores)
    # "w8a8" int8 serving: RMSNormQuant -> QuantGemm chain; the qkv biases
    # (QuantGemm is bias-free by contract, reference gemm.py:127-231) are
    # held fp at the model level and added after the int8 GEMM.
    quant: Optional[str] = None

    def to_mojo(self) -> MojoConfig:
        return MojoConfig(
            model_config=MojoModelConfig(
                model_name="seed_oss",
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
                has_attn_bias=self.attention_bias,
                kv_layout=self.kv_layout,
            )
        )


class SeedOssAttention(Module):
    def __init__(self, config: SeedOssConfig, key):
        c = config
        ks = jax.random.split(key, 4)
        H, Hkv, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        self.num_heads = H
        self.num_kv_heads = Hkv
        self.head_dim = D
        self.quant = c.quant == "w8a8"
        if self.quant:
            mk = lambda k, n: MojoQuantGemm(k, n, output_dtype=c.dtype, trans_weight=True)
            self.q_proj = mk(c.hidden_size, H * D)
            self.k_proj = mk(c.hidden_size, Hkv * D)
            self.v_proj = mk(c.hidden_size, Hkv * D)
            self.o_proj = mk(H * D, c.hidden_size)
            zb = lambda n, flag: jnp.zeros((n,), c.dtype) if flag else None
            self.q_bias = zb(H * D, c.attention_bias)
            self.k_bias = zb(Hkv * D, c.attention_bias)
            self.v_bias = zb(Hkv * D, c.attention_bias)
            self.o_bias = zb(c.hidden_size, c.attention_out_bias)
            self.attn_quant = MojoDynamicQuant()
        else:
            self.q_proj = MojoGemm(c.hidden_size, H * D, bias=c.attention_bias, key=ks[0], dtype=c.dtype)
            self.k_proj = MojoGemm(c.hidden_size, Hkv * D, bias=c.attention_bias, key=ks[1], dtype=c.dtype)
            self.v_proj = MojoGemm(c.hidden_size, Hkv * D, bias=c.attention_bias, key=ks[2], dtype=c.dtype)
            self.o_proj = MojoGemm(H * D, c.hidden_size, bias=c.attention_out_bias, key=ks[3], dtype=c.dtype)
        self.rope = MojoApplyRoPE()
        self.store_kv = MojoStorePagedKVCache(kv_layout=c.kv_layout)
        self.attn_prefill = MojoPagedPrefillGQA(gqa_layout="AABB", kv_layout=c.kv_layout)
        self.attn_decode = MojoPagedDecodeGQA(gqa_layout="AABB", kv_layout=c.kv_layout)
        self.scaling = D**-0.5

    def __call__(self, hidden, cos, sin, meta, caches, layer_idx):
        if self.quant:
            x_q, x_s = hidden  # quantized by the decoder layer's RMSNormQuant
            T = x_q.shape[0]
            q, k, v = self.q_proj(x_q, x_s), self.k_proj(x_q, x_s), self.v_proj(x_q, x_s)
            if self.q_bias is not None:
                q, k, v = q + self.q_bias, k + self.k_bias, v + self.v_bias
            q = q.reshape(T, self.num_heads, self.head_dim)
            k = k.reshape(T, self.num_kv_heads, self.head_dim)
            v = v.reshape(T, self.num_kv_heads, self.head_dim)
        else:
            T = hidden.shape[0]
            q = self.q_proj(hidden).reshape(T, self.num_heads, self.head_dim)
            k = self.k_proj(hidden).reshape(T, self.num_kv_heads, self.head_dim)
            v = self.v_proj(hidden).reshape(T, self.num_kv_heads, self.head_dim)
        q, k = self.rope(q, k, cos, sin, head_first=False)

        kc, vc = caches.key(layer_idx), caches.value(layer_idx)
        kc, vc = self.store_kv(
            k, v, kc, vc, meta.block_tables,
            meta.cu_q_lens if meta.is_prefill else None, meta.context_kv_lens,
        )
        caches = caches.update(layer_idx, kc, vc)

        if meta.is_prefill:
            cu_total = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(meta.total_seq_lens)]
            ).astype(jnp.int32)
            attn = self.attn_prefill(q, kc, vc, meta.cu_q_lens, meta.block_tables,
                                     self.scaling, cu_total)
        else:
            attn = self.attn_decode(q, kc, vc, meta.total_seq_lens, meta.block_tables, self.scaling)
        attn = attn.reshape(T, self.num_heads * self.head_dim)
        if self.quant:
            a_q, a_s = self.attn_quant(attn)
            out = self.o_proj(a_q, a_s)
            if self.o_bias is not None:
                out = out + self.o_bias
        else:
            out = self.o_proj(attn)
        return out, caches


class SeedOssMLP(Module):
    def __init__(self, config: SeedOssConfig, key):
        ks = jax.random.split(key, 3)
        c = config
        self.quant = c.quant == "w8a8"
        if self.quant:
            assert not c.mlp_bias, "w8a8 serving mode has no MLP-bias support"
            mk = lambda k, n: MojoQuantGemm(k, n, output_dtype=c.dtype, trans_weight=True)
            self.gate_proj = mk(c.hidden_size, c.intermediate_size)
            self.up_proj = mk(c.hidden_size, c.intermediate_size)
            self.down_proj = mk(c.intermediate_size, c.hidden_size)
            self.act_quant = MojoDynamicQuant()
        else:
            self.gate_proj = MojoGemm(c.hidden_size, c.intermediate_size, bias=c.mlp_bias, key=ks[0], dtype=c.dtype)
            self.up_proj = MojoGemm(c.hidden_size, c.intermediate_size, bias=c.mlp_bias, key=ks[1], dtype=c.dtype)
            self.down_proj = MojoGemm(c.intermediate_size, c.hidden_size, bias=c.mlp_bias, key=ks[2], dtype=c.dtype)
        self.act = MojoSilu()

    def __call__(self, x):
        if self.quant:
            x_q, x_s = x  # quantized by the decoder layer's RMSNormQuant
            h = self.act(self.gate_proj(x_q, x_s)) * self.up_proj(x_q, x_s)
            h_q, h_s = self.act_quant(h)
            return self.down_proj(h_q, h_s)
        return self.down_proj(self.act(self.gate_proj(x)) * self.up_proj(x))


class SeedOssDecoderLayer(Module):
    def __init__(self, config: SeedOssConfig, key):
        k1, k2 = jax.random.split(key)
        norm_cls = (
            MojoRMSNormQuant if config.quant == "w8a8" else MojoRMSNorm
        )  # fused norm+quant feeds int8 straight into the projections
        self.input_layernorm = norm_cls(config.hidden_size, eps=config.rms_norm_eps)
        self.self_attn = SeedOssAttention(config, k1)
        self.post_attention_layernorm = norm_cls(config.hidden_size, eps=config.rms_norm_eps)
        self.mlp = SeedOssMLP(config, k2)

    def __call__(self, hidden, cos, sin, meta, caches, layer_idx):
        residual = hidden
        attn_out, caches = self.self_attn(self.input_layernorm(hidden), cos, sin, meta, caches, layer_idx)
        hidden = residual + attn_out
        residual = hidden
        hidden = residual + self.mlp(self.post_attention_layernorm(hidden))
        return hidden, caches


class SeedOssForCausalLM(Module):
    def __init__(self, config: SeedOssConfig, key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, config.num_hidden_layers + 3)
        self._config = config
        self.embed_tokens = MojoEmbedding(config.vocab_size, config.hidden_size,
                                          key=keys[0], dtype=config.dtype)
        self.layers = [SeedOssDecoderLayer(config, keys[i + 1]) for i in range(config.num_hidden_layers)]
        self.norm = MojoRMSNorm(config.hidden_size, eps=config.rms_norm_eps)
        self.rotary_emb = MojoRotaryEmbedding(config.rope_theta, config.head_dim)
        quant = config.quant == "w8a8"
        self.lm_head_quant = (
            MojoDynamicQuant() if quant and not config.tie_word_embeddings else None
        )
        if config.tie_word_embeddings:
            self.lm_head = None
        elif quant:
            self.lm_head = MojoQuantGemm(
                config.hidden_size, config.vocab_size,
                output_dtype=config.dtype, trans_weight=True,
            )
        else:
            self.lm_head = MojoGemm(
                config.hidden_size, config.vocab_size, bias=False, key=keys[-1], dtype=config.dtype
            )

    @property
    def config(self) -> MojoConfig:
        return self._config.to_mojo()

    def __call__(self, input_ids, positions, meta, caches, lm_head_indices=None):
        hidden = self.embed_tokens(input_ids)
        cos, sin = self.rotary_emb(hidden, position_ids=positions.astype(jnp.int32))
        cos = cos.astype(hidden.dtype)
        sin = sin.astype(hidden.dtype)
        for layer_idx, layer in enumerate(self.layers):
            hidden, caches = layer(hidden, cos, sin, meta, caches, layer_idx)
        hidden = self.norm(hidden)
        if lm_head_indices is not None:
            hidden = hidden[lm_head_indices]
        if self.lm_head is None:
            logits = hidden @ self.embed_tokens.weight.T
        elif self.lm_head_quant is not None:
            h_q, h_s = self.lm_head_quant(hidden)
            logits = self.lm_head(h_q, h_s)
        else:
            logits = self.lm_head(hidden)
        return logits.astype(jnp.float32), caches
