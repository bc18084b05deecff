"""Post-training w8a8 quantization for DeepSeek-V3 serving.

Converts a fp ``DeepseekV3ForCausalLM`` into the ``quant="w8a8"`` variant:
attention LoRA projections, o_proj, dense/shared MLPs and the lm_head run
``MojoQuantGemm`` (per-output-channel absmax int8 — reference
gemm.py:127-231), routed experts run ``MojoQuantMoE``
(``MojoQuantExperts`` int8, reference moe.py:452-667). The MLA
decompression weight (``kv_b_proj`` inside the MLA ops) and all norms
stay fp; the latent KV cache is already rank-compressed so weight bytes
dominate decode HBM traffic.
"""

from __future__ import annotations

import dataclasses

import jax

from mojo_opset_tpu.modeling.qwen3.quantize import (
    _quantize_into,
    quantize_expert_weight,
)

from .modeling_deepseek_v3 import DeepseekV3ForCausalLM


def _quantize_mlp(dst, src):
    dst.gate_proj = _quantize_into(dst.gate_proj, src.gate_proj)
    dst.up_proj = _quantize_into(dst.up_proj, src.up_proj)
    dst.down_proj = _quantize_into(dst.down_proj, src.down_proj)
    return dst


def quantize_deepseek_v3(model: DeepseekV3ForCausalLM) -> DeepseekV3ForCausalLM:
    """Return the w8a8 serving twin of a fp ``DeepseekV3ForCausalLM``."""
    cfg = dataclasses.replace(model._config, quant="w8a8")
    from mojo_opset_tpu.utils.init import skip_init_scope

    with skip_init_scope():  # every twin param is immediately overwritten
        qm = DeepseekV3ForCausalLM(cfg, key=jax.random.PRNGKey(0))

    qm.model.embed_tokens = model.model.embed_tokens
    qm.model.norm = model.model.norm
    qm.model.rotary_emb = model.model.rotary_emb
    if model.lm_head is None:
        qm.lm_head = None
    else:
        qm.lm_head = _quantize_into(qm.lm_head, model.lm_head)

    for dst, src in zip(qm.model.layers, model.model.layers):
        dst.input_layernorm = dst.input_layernorm.replace(
            weight=src.input_layernorm.weight)
        dst.post_attention_layernorm = src.post_attention_layernorm

        da, sa = dst.self_attn, src.self_attn
        if sa.q_proj is not None:
            da.q_proj = _quantize_into(da.q_proj, sa.q_proj)
        else:
            da.q_a_proj = _quantize_into(da.q_a_proj, sa.q_a_proj)
            da.q_a_layernorm = da.q_a_layernorm.replace(weight=sa.q_a_layernorm.weight)
            da.q_b_proj = _quantize_into(da.q_b_proj, sa.q_b_proj)
        da.kv_a_proj_with_mqa = _quantize_into(da.kv_a_proj_with_mqa, sa.kv_a_proj_with_mqa)
        da.kv_a_layernorm = sa.kv_a_layernorm
        da.o_proj = _quantize_into(da.o_proj, sa.o_proj)
        # the decompression weight lives inside the MLA ops and stays fp
        da.attn_prefill = sa.attn_prefill
        da.attn_decode = sa.attn_decode

        if hasattr(src.mlp, "routed_experts"):  # MoE layer
            dst.mlp.routed_experts.gating = dst.mlp.routed_experts.gating.replace(
                gate_weight=src.mlp.routed_experts.gating.gate_weight)
            up_q, up_s = quantize_expert_weight(
                src.mlp.routed_experts.experts.up_proj_weight)
            dn_q, dn_s = quantize_expert_weight(
                src.mlp.routed_experts.experts.down_proj_weight)
            dst.mlp.routed_experts.experts = dst.mlp.routed_experts.experts.replace(
                up_proj_weight=up_q, up_proj_weight_scale=up_s,
                down_proj_weight=dn_q, down_proj_weight_scale=dn_s,
            )
            _quantize_mlp(dst.mlp.shared_experts, src.mlp.shared_experts)
        else:  # dense-replace layer
            _quantize_mlp(dst.mlp, src.mlp)
    return qm
