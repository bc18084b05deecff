"""DeepSeek-V3 reference model (MLA + MoE), TPU-native functional design.

Capability parity with reference
mojo_opset/modeling/deepseekv3/mojo_deepseek_v3.py:408-911:
  * MLA attention: q LoRA (q_a_proj + q_a_layernorm + q_b_proj),
    kv_a_proj_with_mqa, latent paged cache (c_kv + k_pe) stored via
    MojoStorePagedMLAKVCache, attention via MojoPagedPrefill/DecodeMLA
    (decompression inside the op through the shared kv_b_proj weight);
  * MoE layers: MojoMoE routed experts + shared-expert MLP
    (mojo_deepseek_v3.py:355-406); first ``first_k_dense_replace`` layers
    use a dense MLP.

Functional cache threading matches Qwen3 (modeling_qwen3.py): the session
owns an MLA cache pytree where ``keys`` hold compressed latents and
``values`` hold positional keys.
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
    MojoMoE,
    MojoQuantGemm,
    MojoQuantMoE,
    MojoRMSNorm,
    MojoRMSNormQuant,
    MojoRotaryEmbedding,
    MojoSilu,
)
from mojo_opset_tpu.experimental.operators.kv_cache import MojoStorePagedMLAKVCache
from mojo_opset_tpu.experimental.operators.mla import MojoPagedDecodeMLA, MojoPagedPrefillMLA
from mojo_opset_tpu.runtime.config import MojoConfig, MojoModelConfig
from mojo_opset_tpu.runtime.session import AttentionMetadata, KVCaches, PagedAttentionRuntimeState


@dataclass
class DeepseekV3Config:
    hidden_size: int = 7168
    intermediate_size: int = 18432
    moe_intermediate_size: int = 2048
    num_attention_heads: int = 128
    num_hidden_layers: int = 61
    vocab_size: int = 129280
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0

    q_lora_rank: Optional[int] = 1536
    kv_lora_rank: int = 512
    qk_rope_head_dim: int = 64
    qk_nope_head_dim: int = 128
    v_head_dim: int = 128

    n_routed_experts: int = 256
    n_shared_experts: int = 1
    num_experts_per_tok: int = 8
    first_k_dense_replace: int = 3

    tie_word_embeddings: bool = False
    dtype: object = jnp.bfloat16
    # "w8a8" = int8 serving: QuantGemm projections + QuantMoE routed
    # experts (the MLA decompression weight kv_b_proj stays fp inside the
    # op). Decode is weight-HBM-bound (the MLA latent cache is tiny), so
    # halving weight bytes converts ~directly into tokens/sec.
    quant: Optional[str] = None

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    def to_mojo(self) -> MojoConfig:
        return MojoConfig(
            model_config=MojoModelConfig(
                model_name="deepseek_v3",
                hidden_size=self.hidden_size,
                embed_dim=self.hidden_size,
                head_dim=self.qk_head_dim,
                num_heads=self.num_attention_heads,
                num_kv_heads=1,
                num_layers=self.num_hidden_layers,
                vocab_size=self.vocab_size,
                max_position_embeddings=self.max_position_embeddings,
                dtype=self.dtype,
                rope_theta=self.rope_theta,
                rms_norm_eps=self.rms_norm_eps,
                intermediate_size=self.intermediate_size,
                moe_expert_num=self.n_routed_experts,
                moe_topk=self.num_experts_per_tok,
                share_expert_num=self.n_shared_experts,
                moe_ffn_internal_dim=self.moe_intermediate_size,
                extra={
                    "kv_lora_rank": self.kv_lora_rank,
                    "qk_rope_head_dim": self.qk_rope_head_dim,
                },
            )
        )


class MLARuntimeState(PagedAttentionRuntimeState):
    """Paged session whose caches hold MLA latents: keys = compressed_kv
    ``(N, 1, bs, kv_lora_rank)``, values = k_pe ``(N, 1, bs, rope_dim)``."""

    def __init__(self, config: MojoConfig, batch_size: int, dtype=None, block_size: int = 128,
                 max_blocks_per_seq: Optional[int] = None):
        super().__init__(config, batch_size, dtype=dtype, block_size=block_size,
                         max_blocks_per_seq=max_blocks_per_seq)
        mc = config.model_config
        total_blocks = self.free_blocks.shape[0]
        r = mc.extra["kv_lora_rank"]
        # rope lanes padded to 128 so the Pallas MLA kernel can DMA whole
        # pages (Mosaic requires 128-aligned minor dims); ops slice to dr
        dr = -(-mc.extra["qk_rope_head_dim"] // 128) * 128
        self.caches = KVCaches(
            [jnp.zeros((total_blocks, 1, self.block_size, r), self.dtype)
             for _ in range(mc.num_layers)],
            [jnp.zeros((total_blocks, 1, self.block_size, dr), self.dtype)
             for _ in range(mc.num_layers)],
            list(range(mc.num_layers)),
        )


class DeepseekV3MLP(Module):
    def __init__(self, config: DeepseekV3Config, intermediate_size: Optional[int] = None, key=None):
        inter = intermediate_size or config.intermediate_size
        ks = jax.random.split(key if key is not None else jax.random.PRNGKey(0), 3)
        self.quant = config.quant == "w8a8"
        if self.quant:
            mk = lambda k, n: MojoQuantGemm(k, n, output_dtype=config.dtype, trans_weight=True)
            self.gate_proj = mk(config.hidden_size, inter)
            self.up_proj = mk(config.hidden_size, inter)
            self.down_proj = mk(inter, config.hidden_size)
            # fp entry quant: this MLP's input is a shared fp norm output
            # (the MoE layers feed the same hidden to the fp gating)
            self.in_quant = MojoDynamicQuant()
            self.act_quant = MojoDynamicQuant()
        else:
            self.gate_proj = MojoGemm(config.hidden_size, inter, bias=False, key=ks[0], dtype=config.dtype)
            self.up_proj = MojoGemm(config.hidden_size, inter, bias=False, key=ks[1], dtype=config.dtype)
            self.down_proj = MojoGemm(inter, config.hidden_size, bias=False, key=ks[2], dtype=config.dtype)
        self.act = MojoSilu()

    def __call__(self, x):
        if self.quant:
            x_q, x_s = self.in_quant(x)
            h = self.act(self.gate_proj(x_q, x_s)) * self.up_proj(x_q, x_s)
            h_q, h_s = self.act_quant(h)
            return self.down_proj(h_q, h_s)
        return self.down_proj(self.act(self.gate_proj(x)) * self.up_proj(x))


class DeepseekV3MoE(Module):
    """Routed MojoMoE + shared experts (reference mojo_deepseek_v3.py:355-406)."""

    def __init__(self, config: DeepseekV3Config, key=None):
        k1, k2 = jax.random.split(key if key is not None else jax.random.PRNGKey(0))
        moe_kw = dict(
            num_experts=config.n_routed_experts,
            top_k=config.num_experts_per_tok,
            hidden_size=config.hidden_size,
            intermediate_size=config.moe_intermediate_size,
            key=k1,
            dtype=config.dtype,
        )
        self.routed_experts = (
            MojoQuantMoE(**moe_kw) if config.quant == "w8a8" else MojoMoE(**moe_kw)
        )
        self.shared_experts = DeepseekV3MLP(
            config, intermediate_size=config.moe_intermediate_size * config.n_shared_experts, key=k2
        )

    def __call__(self, hidden: jax.Array) -> jax.Array:
        return self.routed_experts(hidden) + self.shared_experts(hidden)


class DeepseekV3Attention(Module):
    """Multi-head Latent Attention over the paged latent cache."""

    def __init__(self, config: DeepseekV3Config, key=None):
        c = config
        ks = jax.random.split(key if key is not None else jax.random.PRNGKey(0), 6)
        self.num_heads = c.num_attention_heads
        self.q_lora_rank = c.q_lora_rank
        self.qk_rope_head_dim = c.qk_rope_head_dim
        self.kv_lora_rank = c.kv_lora_rank
        self.v_head_dim = c.v_head_dim
        self.qk_nope_head_dim = c.qk_nope_head_dim
        self.qk_head_dim = c.qk_head_dim

        self.quant = c.quant == "w8a8"
        if self.quant:
            mk = lambda k, n: MojoQuantGemm(k, n, output_dtype=c.dtype, trans_weight=True)
        if c.q_lora_rank is None:
            if self.quant:
                self.q_proj = mk(c.hidden_size, self.num_heads * self.qk_head_dim)
            else:
                self.q_proj = MojoGemm(c.hidden_size, self.num_heads * self.qk_head_dim, bias=False,
                                       key=ks[0], dtype=c.dtype)
            self.q_a_proj = None
            self.q_a_layernorm = None
            self.q_b_proj = None
        else:
            self.q_proj = None
            if self.quant:
                self.q_a_proj = mk(c.hidden_size, c.q_lora_rank)
                # fused norm+quant between the two q LoRA stages
                self.q_a_layernorm = MojoRMSNormQuant(c.q_lora_rank, eps=c.rms_norm_eps)
                self.q_b_proj = mk(c.q_lora_rank, self.num_heads * self.qk_head_dim)
            else:
                self.q_a_proj = MojoGemm(c.hidden_size, c.q_lora_rank, bias=False, key=ks[0], dtype=c.dtype)
                self.q_a_layernorm = MojoRMSNorm(c.q_lora_rank, eps=c.rms_norm_eps)
                self.q_b_proj = MojoGemm(c.q_lora_rank, self.num_heads * self.qk_head_dim, bias=False,
                                         key=ks[1], dtype=c.dtype)

        if self.quant:
            self.kv_a_proj_with_mqa = mk(c.hidden_size, c.kv_lora_rank + c.qk_rope_head_dim)
            self.o_proj = mk(self.num_heads * c.v_head_dim, c.hidden_size)
            self.attn_quant = MojoDynamicQuant()
        else:
            self.kv_a_proj_with_mqa = MojoGemm(
                c.hidden_size, c.kv_lora_rank + c.qk_rope_head_dim, bias=False, key=ks[2], dtype=c.dtype
            )
            self.o_proj = MojoGemm(self.num_heads * c.v_head_dim, c.hidden_size, bias=False,
                                   key=ks[3], dtype=c.dtype)
        self.kv_a_layernorm = MojoRMSNorm(c.kv_lora_rank, eps=c.rms_norm_eps)

        self.rope = MojoApplyRoPE()
        self.store_kv = MojoStorePagedMLAKVCache()
        mla_kw = dict(
            num_heads=self.num_heads, qk_nope_head_dim=c.qk_nope_head_dim,
            qk_rope_head_dim=c.qk_rope_head_dim, v_head_dim=c.v_head_dim,
            kv_lora_rank=c.kv_lora_rank,
        )
        # the decompression weight (kv_b_proj) lives inside the MLA ops
        # (reference experimental/operators/attention.py:73-76). The two
        # ops hold SEPARATE pytree leaves initialized identically (same
        # key); anything that sets one (checkpoint loaders, quantizers)
        # must set BOTH — see utils/hf.py's DeepSeek converter.
        self.attn_prefill = MojoPagedPrefillMLA(**mla_kw, key=ks[4])
        self.attn_decode = MojoPagedDecodeMLA(**mla_kw, key=ks[4])
        self.scaling = self.qk_head_dim ** (-0.5)

    def __call__(self, hidden, cos, sin, meta: AttentionMetadata, caches: KVCaches, layer_idx: int):
        if self.quant:
            # hidden arrives pre-quantized by the decoder layer's
            # RMSNormQuant; both LoRA-a projections consume the same (q, s)
            x_q, x_s = hidden
            T = x_q.shape[0]
            if self.q_lora_rank is None:
                q = self.q_proj(x_q, x_s)
            else:
                qa_q, qa_s = self.q_a_layernorm(self.q_a_proj(x_q, x_s))
                q = self.q_b_proj(qa_q, qa_s)
            ckv_full = self.kv_a_proj_with_mqa(x_q, x_s)
        else:
            T = hidden.shape[0]
            if self.q_lora_rank is None:
                q = self.q_proj(hidden)
            else:
                q = self.q_b_proj(self.q_a_layernorm(self.q_a_proj(hidden)))
            ckv_full = self.kv_a_proj_with_mqa(hidden)
        q = q.reshape(T, self.num_heads, self.qk_head_dim)
        q_nope, q_rot = q[..., : self.qk_nope_head_dim], q[..., self.qk_nope_head_dim :]
        c_kv, k_rot = (
            ckv_full[..., : self.kv_lora_rank],
            ckv_full[..., self.kv_lora_rank :],
        )
        c_kv = self.kv_a_layernorm(c_kv)
        k_rot = k_rot[:, None, :]  # (T, 1, dr)

        q_rot, k_rot = self.rope(q_rot, k_rot, cos, sin, head_first=False)
        query = jnp.concatenate([q_nope, q_rot], axis=-1)

        ckv_cache, kpe_cache = caches.key(layer_idx), caches.value(layer_idx)
        ckv_cache, kpe_cache = self.store_kv(
            c_kv, k_rot[:, 0, :], ckv_cache, kpe_cache,
            meta.block_tables,
            meta.cu_q_lens if meta.is_prefill else None,
            meta.context_kv_lens,
        )
        caches = caches.update(layer_idx, ckv_cache, kpe_cache)

        if meta.is_prefill:
            cu_total = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(meta.total_seq_lens)]
            ).astype(jnp.int32)
            attn = self.attn_prefill(
                query, ckv_cache, kpe_cache, meta.cu_q_lens, meta.block_tables,
                self.scaling, cu_total,
            )
        else:
            attn = self.attn_decode(
                query, ckv_cache, kpe_cache, meta.total_seq_lens, meta.block_tables,
                self.scaling,
            )
        attn = attn.reshape(T, self.num_heads * self.v_head_dim)
        if self.quant:
            a_q, a_s = self.attn_quant(attn)
            out = self.o_proj(a_q, a_s)
        else:
            out = self.o_proj(attn)
        return out, caches


class DeepseekV3DecoderLayer(Module):
    def __init__(self, config: DeepseekV3Config, layer_idx: int, key=None):
        k1, k2 = jax.random.split(key if key is not None else jax.random.PRNGKey(layer_idx))
        # fused norm+quant feeds int8 into the attention projections; the
        # post-attention norm stays fp (it feeds the fp MoE gate — the
        # quant MLP / QuantMoE dynamic-quant their inputs internally)
        norm_cls = MojoRMSNormQuant if config.quant == "w8a8" else MojoRMSNorm
        self.input_layernorm = norm_cls(config.hidden_size, eps=config.rms_norm_eps)
        self.self_attn = DeepseekV3Attention(config, key=k1)
        self.post_attention_layernorm = MojoRMSNorm(config.hidden_size, eps=config.rms_norm_eps)
        if layer_idx >= config.first_k_dense_replace:
            self.mlp = DeepseekV3MoE(config, key=k2)
        else:
            self.mlp = DeepseekV3MLP(config, key=k2)

    def __call__(self, hidden, cos, sin, meta, caches, layer_idx):
        residual = hidden
        hidden = self.input_layernorm(hidden)
        attn_out, caches = self.self_attn(hidden, cos, sin, meta, caches, layer_idx)
        hidden = residual + attn_out
        residual = hidden
        hidden = residual + self.mlp(self.post_attention_layernorm(hidden))
        return hidden, caches


class DeepseekV3Model(Module):
    def __init__(self, config: DeepseekV3Config, key=None):
        keys = jax.random.split(key if key is not None else jax.random.PRNGKey(0),
                                config.num_hidden_layers + 1)
        self.embed_tokens = MojoEmbedding(config.vocab_size, config.hidden_size,
                                          key=keys[0], dtype=config.dtype)
        self.layers = [
            DeepseekV3DecoderLayer(config, i, key=keys[i + 1])
            for i in range(config.num_hidden_layers)
        ]
        self.norm = MojoRMSNorm(config.hidden_size, eps=config.rms_norm_eps)
        self.rotary_emb = MojoRotaryEmbedding(config.rope_theta, config.qk_rope_head_dim)

    def __call__(self, input_ids, positions, meta, caches):
        hidden = self.embed_tokens(input_ids)
        cos, sin = self.rotary_emb(hidden, position_ids=positions.astype(jnp.int32))
        cos = cos.astype(hidden.dtype)
        sin = sin.astype(hidden.dtype)
        for layer_idx, layer in enumerate(self.layers):
            hidden, caches = layer(hidden, cos, sin, meta, caches, layer_idx)
        return self.norm(hidden), caches


class DeepseekV3ForCausalLM(Module):
    """Functional paged-generation DeepSeek-V3 (MLA + MoE)."""

    def __init__(self, config: DeepseekV3Config, key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        self._config = config
        self.model = DeepseekV3Model(config, k1)
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
                config.hidden_size, config.vocab_size, bias=False, key=k2, dtype=config.dtype
            )

    @property
    def config(self) -> MojoConfig:
        return self._config.to_mojo()

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
