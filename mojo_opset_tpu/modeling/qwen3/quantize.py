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


def quantize_linear_weight(weight: jax.Array, weight_dtype: str = "int8"):
    """(N, K) float weight -> (packed int8, float32 scale (N,)) absmax.

    int8: per-out-channel absmax, qmax 127, stored (N, K).
    int4: qmax 7, rows packed two-channels-per-byte -> (N//2, K)
          (core.operators.gemm.pack_int4_rows block layout).
    """
    from mojo_opset_tpu.core.operators.gemm import pack_int4_rows

    w = weight.astype(jnp.float32)
    qmax = 7.0 if weight_dtype == "int4" else 127.0
    scale = jnp.clip(jnp.max(jnp.abs(w), axis=1), 1e-8, None) / qmax
    q = jnp.round(w / scale[:, None])
    if weight_dtype == "int4":
        return pack_int4_rows(jnp.clip(q, -8, 7).astype(jnp.int8)), scale
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _quantize_into(dst: MojoQuantGemm, src: MojoGemm) -> MojoQuantGemm:
    assert src.bias is None, "quantized conversion does not support projection bias"
    wdt = "int4" if dst.weight_dtype == "int4" else "int8"
    w_q, scale = quantize_linear_weight(src.weight, wdt)  # src stores (N, K)
    return dst.replace(weight=w_q, weight_scale=scale)


def quantize_qwen3(model: Qwen3ForCausalLM, weight_dtype: str = "int8") -> Qwen3ForCausalLM:
    """Return the w8a8 (or w4a8, ``weight_dtype="int4"``) twin of a bf16
    ``Qwen3ForCausalLM``.  Under w4a8 the lm_head stays int8 (logit
    fidelity; see modeling_qwen3.py lm_head note)."""
    mode = "w4a8" if weight_dtype == "int4" else "w8a8"
    cfg = dataclasses.replace(model.qwen3_config, quant=mode)
    from mojo_opset_tpu.utils.init import skip_init_scope

    with skip_init_scope():  # every twin param is immediately overwritten
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


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack int4 values (int8 storage, range [-8, 7]) two-per-int8 along
    the OUTPUT dim, inverse of core.operators.moe.unpack_int4 (reference
    moe.py:566-573): packed row r holds rows 2r (low nibble) and 2r+1
    (high nibble)."""
    assert q.ndim == 2 and q.shape[0] % 2 == 0
    lo = q[0::2].astype(jnp.uint8) & 0x0F
    hi = (q[1::2].astype(jnp.uint8) & 0x0F) << 4
    return jax.lax.bitcast_convert_type(lo | hi, jnp.int8)


def quantize_expert_weight(weight: jax.Array, weight_dtype="int8"):
    """(E, N, K) float expert weights -> (packed int8, float32 scale (E, N)).

    int8: per-(expert, out-channel) absmax over K, qmax 127.
    int4: qmax 7, then rows packed two-per-int8 -> (E, N//2, K).
    """
    w = weight.astype(jnp.float32)
    qmax = 7.0 if weight_dtype == "int4" else 127.0
    scale = jnp.clip(jnp.max(jnp.abs(w), axis=2), 1e-8, None) / qmax
    q = jnp.round(w / scale[:, :, None])
    if weight_dtype == "int4":
        q = jnp.clip(q, -8, 7).astype(jnp.int8)
        packed = jax.vmap(pack_int4)(q)
        return packed, scale
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def quantize_qwen3_moe(model, weight_dtype="int8"):
    """Return the int8-serving twin of a bf16 ``Qwen3MoeForCausalLM``:
    attention projections + lm_head w8a8 (MojoQuantGemm), experts w8a8 or
    w4a8 (MojoQuantExperts int8 / packed-int4 weights with per-channel
    scales — reference moe.py:452-667), gate/norm/embedding copied."""
    from .modeling_qwen3_moe import Qwen3MoeForCausalLM

    mode = "w4a8" if weight_dtype == "int4" else "w8a8"
    cfg = dataclasses.replace(model._config, quant=mode)
    from mojo_opset_tpu.utils.init import skip_init_scope

    with skip_init_scope():
        qm = Qwen3MoeForCausalLM(cfg, key=jax.random.PRNGKey(0))

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
        dst.post_attention_layernorm = src.post_attention_layernorm

        da, sa = dst.self_attn, src.self_attn
        da.q_proj = _quantize_into(da.q_proj, sa.q_proj)
        da.k_proj = _quantize_into(da.k_proj, sa.k_proj)
        da.v_proj = _quantize_into(da.v_proj, sa.v_proj)
        da.o_proj = _quantize_into(da.o_proj, sa.o_proj)
        da.q_norm = sa.q_norm
        da.k_norm = sa.k_norm

        dst.mlp.gating = dst.mlp.gating.replace(gate_weight=src.mlp.gating.gate_weight)
        up_q, up_s = quantize_expert_weight(src.mlp.experts.up_proj_weight, weight_dtype)
        dn_q, dn_s = quantize_expert_weight(src.mlp.experts.down_proj_weight, weight_dtype)
        dst.mlp.experts = dst.mlp.experts.replace(
            up_proj_weight=up_q, up_proj_weight_scale=up_s,
            down_proj_weight=dn_q, down_proj_weight_scale=dn_s,
        )
    return qm
