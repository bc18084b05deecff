"""w8a8 / w4a8 Qwen3-MoE serving-mode tests.

The quantized MoE model (attention + lm_head via MojoQuantGemm, experts
via MojoQuantExperts int8 / packed-int4 — reference moe.py:452-667) must
track the fp model and run the paged generate loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operators import MojoQuantMoE
from mojo_opset_tpu.modeling.qwen3 import (
    Qwen3MoeConfig,
    Qwen3MoeForCausalLM,
    quantize_qwen3_moe,
)
from mojo_opset_tpu.runtime import PagedAttentionGenerationModel
# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def _tiny_cfg(**kw):
    return Qwen3MoeConfig(
        hidden_size=64, intermediate_size=128, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, head_dim=16,
        vocab_size=256, max_position_embeddings=128, dtype=jnp.float32,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=96, **kw,
    )


@pytest.fixture(scope="module")
def models():
    base = Qwen3MoeForCausalLM(_tiny_cfg(), key=jax.random.PRNGKey(3))
    return base, quantize_qwen3_moe(base)


def _logits(model, ids):
    gm = PagedAttentionGenerationModel(model, block_size=16)
    logits, _ = gm(ids, context_input_len=np.array([len(ids)], np.int32))
    return np.asarray(logits, np.float32)


def _cos(a, b):
    return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_quant_moe_structure(models):
    _, qm = models
    layer = qm.layers[0]
    assert isinstance(layer.mlp, MojoQuantMoE)
    assert layer.mlp.experts.up_proj_weight.dtype == jnp.int8
    assert layer.self_attn.q_proj.weight.dtype == jnp.int8
    # gate weights copied verbatim (routing must not change)
    np.testing.assert_array_equal(
        np.asarray(layer.mlp.gating.gate_weight),
        np.asarray(models[0].layers[0].mlp.gating.gate_weight),
    )


def test_quant_moe_logits_track_fp(models):
    base, qm = models
    ids = np.array([3, 141, 59, 26, 200, 77, 12], np.int32)
    lb, lq = _logits(base, ids), _logits(qm, ids)
    cos = _cos(lb, lq)
    assert cos > 0.99, f"w8a8 MoE logits diverged: cos={cos}"
    assert int(lb.argmax()) == int(lq.argmax())


def test_quant_moe_generation_runs(models):
    _, qm = models
    from mojo_opset_tpu.runtime import MojoGenerator, TopKSampler

    class Tok:
        eos_token_id = 0

    gen = MojoGenerator(
        PagedAttentionGenerationModel(qm, block_size=16), Tok(),
        TopKSampler(1), max_new_tokens=5,
    )
    out = gen.generate_from_ids(
        np.array([5, 6, 7, 8], np.int32), np.array([4], np.int32),
        ignore_eos=True, silent=True,
    )
    assert out.shape == (1, 5)


def test_w4a8_experts_track_fp(models):
    base, _ = models
    qm = quantize_qwen3_moe(base, weight_dtype="int4")
    layer = qm.layers[0]
    E = layer.mlp.experts.num_experts
    I = layer.mlp.experts.intermediate_size
    # packed: half the rows of the int8 layout
    assert layer.mlp.experts.up_proj_weight.shape[1] == I  # 2I // 2
    ids = np.array([3, 141, 59, 26, 200], np.int32)
    lb, lq = _logits(base, ids), _logits(qm, ids)
    cos = _cos(lb, lq)
    # int4 experts are noisier; still must point the same way
    assert cos > 0.95, f"w4a8 MoE logits diverged: cos={cos}"


def test_pack_unpack_int4_roundtrip():
    from mojo_opset_tpu.core.operators.moe import unpack_int4
    from mojo_opset_tpu.modeling.qwen3.quantize import pack_int4

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-8, 8, (16, 24), np.int8))
    packed = pack_int4(q)
    assert packed.shape == (8, 24) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), np.asarray(q))
