"""Qwen3-MoE reference model.

Capability parity with reference mojo_opset/modeling/qwen3/mojo_qwen3_moe.py
(MoE decoder block wiring MojoMoEGating/Dispatch/Combine + GroupGemm) —
extended to a full causal LM by swapping the dense MLP of Qwen3 for the
MojoMoE pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.module import Module
from mojo_opset_tpu.core.operators import MojoMoE, MojoQuantMoE
from mojo_opset_tpu.modeling.qwen3.modeling_qwen3 import (
    Qwen3Attention,
    Qwen3Config,
    Qwen3ForCausalLM,
    Qwen3Model,
)
from mojo_opset_tpu.core.operators import (
    MojoDynamicQuant,
    MojoEmbedding,
    MojoGemm,
    MojoGroupGemm,
    MojoMoECombine,
    MojoMoEDispatch,
    MojoMoEGating,
    MojoPrefillGQA,
    MojoQuantGemm,
    MojoRMSNorm,
    MojoRMSNormQuant,
    MojoRotaryEmbedding,
)


@dataclass
class Qwen3MoeConfig(Qwen3Config):
    num_experts: int = 128
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 768

    def to_mojo(self):
        cfg = super().to_mojo()
        cfg.model_config.moe_expert_num = self.num_experts
        cfg.model_config.moe_topk = self.num_experts_per_tok
        cfg.model_config.moe_ffn_internal_dim = self.moe_intermediate_size
        return cfg


class MojoQwen3MoeBlock(Module):
    """Toy composed MoE block exercising the decomposed MoE op chain
    (embedding → qkv → norm → dense prefill GQA → norm → gating /
    dispatch / GroupGemm experts / combine).

    Parity: reference modeling/qwen3/mojo_qwen3_moe.py:12-51 — which is
    partially bit-rotted there (imports `MojoNorm` / `mojo_opset.core.attn`
    that no longer exist); this version is runnable and jittable.
    """

    def __init__(
        self,
        vocab_size: int = 10000,
        hidden_size: int = 4096,
        num_heads: int = 32,
        head_dim: int = 128,
        num_experts: int = 8,
        top_k: int = 2,
        key: Optional[jax.Array] = None,
        dtype=jnp.bfloat16,
    ):
        if key is None:
            key = jax.random.PRNGKey(0)
        k_embed, k_qkv, k_gate, k_gmm = jax.random.split(key, 4)
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.embedding = MojoEmbedding(vocab_size, hidden_size, key=k_embed, dtype=dtype)
        self.qkv_proj = MojoGemm(hidden_size, num_heads * head_dim * 3, bias=True, key=k_qkv, dtype=dtype)
        self.pre_norm = MojoRMSNorm(num_heads * head_dim * 3)
        self.attn = MojoPrefillGQA()
        self.post_norm = MojoRMSNorm(num_heads * head_dim)
        self.moe_gate = MojoMoEGating(num_heads * head_dim, num_experts, top_k, key=k_gate)
        self.moe_dispatch = MojoMoEDispatch(num_experts)
        self.moe_gmm = MojoGroupGemm(
            jax.random.normal(k_gmm, (num_experts, num_heads * head_dim, hidden_size), dtype)
            * (num_heads * head_dim) ** -0.5
        )
        self.moe_combine = MojoMoECombine()

    def __call__(self, input_ids: jax.Array) -> jax.Array:
        B, S = input_ids.shape
        hidden = self.embedding(input_ids)
        qkv = self.qkv_proj(hidden)
        qkv = self.pre_norm(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(x):  # (B,S,H*D) -> (B,H,S,D)
            return x.reshape(B, S, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        cu_q_lens = jnp.arange(B + 1, dtype=jnp.int32) * S
        attn = self.attn(heads(q), heads(k), heads(v), cu_q_lens)  # (B,S,Hq,D)
        hidden = self.post_norm(attn.reshape(B, S, -1))

        tokens = hidden.reshape(B * S, -1)
        indices, gates = self.moe_gate(tokens)
        sorted_hidden, tokens_per_expert, sorted_gates, token_indices = self.moe_dispatch(
            tokens, gates, indices
        )
        expert_out = self.moe_gmm(sorted_hidden, tokens_per_expert)
        out = self.moe_combine(
            jnp.zeros((tokens.shape[0], expert_out.shape[-1]), expert_out.dtype),
            expert_out,
            sorted_gates,
            token_indices,
        )
        return out.reshape(B, S, -1)


class Qwen3MoeDecoderLayer(Module):
    def __init__(self, config: Qwen3MoeConfig, key):
        k1, k2 = jax.random.split(key)
        quant = config.quant in ("w8a8", "w4a8")
        # fused norm+quant feeds int8 straight into the attention
        # projections (dense-model wiring); the MoE gate wants fp hidden,
        # so the post-attention norm stays fp — MojoQuantMoE dynamic-quants
        # its expert activations internally (reference moe.py:452-667)
        norm_cls = MojoRMSNormQuant if quant else MojoRMSNorm
        self.input_layernorm = norm_cls(config.hidden_size, eps=config.rms_norm_eps)
        self.self_attn = Qwen3Attention(config, k1)
        self.post_attention_layernorm = MojoRMSNorm(config.hidden_size, eps=config.rms_norm_eps)
        if quant:
            expert_wdtype = "int4" if config.quant == "w4a8" else jnp.int8
            self.mlp = MojoQuantMoE(
                num_experts=config.num_experts,
                top_k=config.num_experts_per_tok,
                hidden_size=config.hidden_size,
                intermediate_size=config.moe_intermediate_size,
                up_weight_dtype=expert_wdtype,
                down_weight_dtype=expert_wdtype,
                key=k2,
                dtype=config.dtype,
            )
        else:
            self.mlp = MojoMoE(
                num_experts=config.num_experts,
                top_k=config.num_experts_per_tok,
                hidden_size=config.hidden_size,
                intermediate_size=config.moe_intermediate_size,
                key=k2,
                dtype=config.dtype,
            )

    def __call__(self, hidden, cos, sin, meta, caches, layer_idx):
        residual = hidden
        attn_out, caches = self.self_attn(
            self.input_layernorm(hidden), cos, sin, meta, caches, layer_idx
        )
        hidden = residual + attn_out
        residual = hidden
        hidden = residual + self.mlp(self.post_attention_layernorm(hidden))
        return hidden, caches


class Qwen3MoeForCausalLM(Module):
    def __init__(self, config: Qwen3MoeConfig, key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, config.num_hidden_layers + 3)
        self._config = config
        self.embed_tokens = MojoEmbedding(
            config.vocab_size, config.hidden_size, key=keys[0], dtype=config.dtype
        )
        self.layers = [
            Qwen3MoeDecoderLayer(config, keys[i + 1]) for i in range(config.num_hidden_layers)
        ]
        self.norm = MojoRMSNorm(config.hidden_size, eps=config.rms_norm_eps)
        self.rotary_emb = MojoRotaryEmbedding(config.rope_theta, config.head_dim)
        quant = config.quant in ("w8a8", "w4a8")
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
    def config(self):
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
