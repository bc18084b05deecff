"""w8a8 DeepSeek-V3 serving-mode tests (MLA + QuantMoE)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operators import MojoQuantGemm, MojoQuantMoE
from mojo_opset_tpu.modeling.deepseekv3 import (
    DeepseekV3Config,
    DeepseekV3ForCausalLM,
    MLARuntimeState,
    quantize_deepseek_v3,
)
from mojo_opset_tpu.runtime import PagedAttentionGenerationModel

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow

TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    moe_intermediate_size=32,
    num_attention_heads=4,
    num_hidden_layers=3,
    vocab_size=128,
    max_position_embeddings=128,
    q_lora_rank=32,
    kv_lora_rank=16,
    qk_rope_head_dim=8,
    qk_nope_head_dim=16,
    v_head_dim=16,
    n_routed_experts=4,
    n_shared_experts=1,
    num_experts_per_tok=2,
    first_k_dense_replace=1,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def models():
    base = DeepseekV3ForCausalLM(DeepseekV3Config(**TINY), key=jax.random.PRNGKey(11))
    return base, quantize_deepseek_v3(base)


def _logits(model, ids):
    gm = PagedAttentionGenerationModel(model, block_size=16, session_cls=MLARuntimeState)
    logits, _ = gm(ids, context_input_len=np.array([len(ids)], np.int32))
    return np.asarray(logits, np.float32)


def test_quant_deepseek_structure(models):
    base, qm = models
    attn = qm.model.layers[0].self_attn
    assert isinstance(attn.q_a_proj, MojoQuantGemm)
    assert attn.q_a_proj.weight.dtype == jnp.int8
    assert isinstance(attn.kv_a_proj_with_mqa, MojoQuantGemm)
    moe_layer = qm.model.layers[1].mlp  # layer 0 is dense-replace
    assert isinstance(moe_layer.routed_experts, MojoQuantMoE)
    assert moe_layer.routed_experts.experts.up_proj_weight.dtype == jnp.int8
    assert isinstance(moe_layer.shared_experts.down_proj, MojoQuantGemm)
    # MLA decompression weights shared from the fp model (never quantized)
    np.testing.assert_array_equal(
        np.asarray(qm.model.layers[0].self_attn.attn_decode.kv_b_proj,
                   np.float32),
        np.asarray(base.model.layers[0].self_attn.attn_decode.kv_b_proj,
                   np.float32),
    )


def test_quant_deepseek_logits_track_fp(models):
    base, qm = models
    ids = np.array([3, 14, 59, 26, 100, 77, 12], np.int32)
    lb, lq = _logits(base, ids), _logits(qm, ids)
    cos = float((lb * lq).sum() / (np.linalg.norm(lb) * np.linalg.norm(lq) + 1e-12))
    assert cos > 0.99, f"w8a8 DeepSeek logits diverged: cos={cos}"
    assert int(lb.argmax()) == int(lq.argmax())


def test_quant_deepseek_generation_runs(models):
    _, qm = models
    from mojo_opset_tpu.runtime import MojoGenerator, TopKSampler

    class Tok:
        eos_token_id = 0

    gen = MojoGenerator(
        PagedAttentionGenerationModel(qm, block_size=16, session_cls=MLARuntimeState),
        Tok(), TopKSampler(1), max_new_tokens=5,
    )
    out = gen.generate_from_ids(
        np.array([5, 6, 7, 8], np.int32), np.array([4], np.int32),
        ignore_eos=True, silent=True,
    )
    assert out.shape == (1, 5)
