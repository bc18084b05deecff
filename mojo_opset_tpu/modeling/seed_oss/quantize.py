"""Post-training w8a8 quantization for Seed-OSS serving.

Same converter shape as Qwen3 (modeling/qwen3/quantize.py): per-channel
absmax int8 weights into the RMSNormQuant -> QuantGemm chain. Seed-OSS
carries qkv biases (reference modeling config); QuantGemm is bias-free
by contract (reference gemm.py:127-231), so the fp biases move to
model-level ``{q,k,v,o}_bias`` leaves added after the int8 GEMMs.
"""

from __future__ import annotations

import dataclasses

import jax

from mojo_opset_tpu.modeling.qwen3.quantize import _quantize_into, quantize_linear_weight

from .modeling_seed_oss import SeedOssForCausalLM


def _quantize_biased(dst, src):
    """QuantGemm weights from a biased MojoGemm; returns (qgemm, fp bias)."""
    w_i8, scale = quantize_linear_weight(src.weight)
    return dst.replace(weight=w_i8, weight_scale=scale), src.bias


def quantize_seed_oss(model: SeedOssForCausalLM) -> SeedOssForCausalLM:
    """Return the w8a8 serving twin of a fp ``SeedOssForCausalLM``."""
    cfg = dataclasses.replace(model._config, quant="w8a8")
    from mojo_opset_tpu.utils.init import skip_init_scope

    with skip_init_scope():  # every twin param is immediately overwritten
        qm = SeedOssForCausalLM(cfg, key=jax.random.PRNGKey(0))

    qm.embed_tokens = model.embed_tokens
    qm.norm = model.norm
    qm.rotary_emb = model.rotary_emb
    if model.lm_head is None:
        qm.lm_head = None
    else:
        qm.lm_head = _quantize_into(qm.lm_head, model.lm_head)

    for dst, src in zip(qm.layers, model.layers):
        dst.input_layernorm = dst.input_layernorm.replace(
            weight=src.input_layernorm.weight)
        dst.post_attention_layernorm = dst.post_attention_layernorm.replace(
            weight=src.post_attention_layernorm.weight)

        da, sa = dst.self_attn, src.self_attn
        da.q_proj, da.q_bias = _quantize_biased(da.q_proj, sa.q_proj)
        da.k_proj, da.k_bias = _quantize_biased(da.k_proj, sa.k_proj)
        da.v_proj, da.v_bias = _quantize_biased(da.v_proj, sa.v_proj)
        da.o_proj, da.o_bias = _quantize_biased(da.o_proj, sa.o_proj)

        dm, sm = dst.mlp, src.mlp
        dm.gate_proj = _quantize_into(dm.gate_proj, sm.gate_proj)
        dm.up_proj = _quantize_into(dm.up_proj, sm.up_proj)
        dm.down_proj = _quantize_into(dm.down_proj, sm.down_proj)
    return qm
