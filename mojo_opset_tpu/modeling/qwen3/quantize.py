"""Post-training w8a8 quantization for Qwen3 serving.

Converts a bf16 ``Qwen3ForCausalLM`` into the ``quant="w8a8"`` variant:
every projection weight becomes int8 with a per-output-channel absmax
scale (the ``MojoQuantGemm`` contract, reference gemm.py:127-231), and
activations are quantized per-token at runtime by the fused
``MojoRMSNormQuant`` / ``MojoDynamicQuant`` chain the decoder layers wire
in.  Norm / embedding / rotary parameters are copied verbatim.

Decode on TPU is HBM-bandwidth-bound (PARITY.md §6: bf16 decode runs at
~94% of v5e HBM), so halving the weight bytes converts almost directly
into tokens/sec — this converter is the supported path from an HF bf16
checkpoint to the int8 serving config.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operators import MojoGemm, MojoQuantGemm

from .modeling_qwen3 import Qwen3ForCausalLM


def quantize_linear_weight(weight: jax.Array):
    """(N, K) float weight -> (int8 (N, K), float32 scale (N,)) absmax."""
    w = weight.astype(jnp.float32)
    scale = jnp.clip(jnp.max(jnp.abs(w), axis=1), 1e-8, None) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale[:, None]), -127, 127).astype(jnp.int8)
    return w_i8, scale


def _quantize_into(dst: MojoQuantGemm, src: MojoGemm) -> MojoQuantGemm:
    assert src.bias is None, "w8a8 conversion does not support projection bias"
    w_i8, scale = quantize_linear_weight(src.weight)  # both store (N, K)
    return dst.replace(weight=w_i8, weight_scale=scale)


def quantize_qwen3(model: Qwen3ForCausalLM) -> Qwen3ForCausalLM:
    """Return the w8a8 twin of a bf16 ``Qwen3ForCausalLM``."""
    cfg = dataclasses.replace(model.qwen3_config, quant="w8a8")
    qm = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(0))

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
        dst.post_attention_layernorm = dst.post_attention_layernorm.replace(
            weight=src.post_attention_layernorm.weight)

        da, sa = dst.self_attn, src.self_attn
        da.q_proj = _quantize_into(da.q_proj, sa.q_proj)
        da.k_proj = _quantize_into(da.k_proj, sa.k_proj)
        da.v_proj = _quantize_into(da.v_proj, sa.v_proj)
        da.o_proj = _quantize_into(da.o_proj, sa.o_proj)
        da.q_norm = sa.q_norm
        da.k_norm = sa.k_norm

        dm, sm = dst.mlp, src.mlp
        dm.gate_proj = _quantize_into(dm.gate_proj, sm.gate_proj)
        dm.up_proj = _quantize_into(dm.up_proj, sm.up_proj)
        dm.down_proj = _quantize_into(dm.down_proj, sm.down_proj)
    return qm
