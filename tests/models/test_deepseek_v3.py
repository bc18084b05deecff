"""DeepSeek-V3 (MLA + MoE) model-level tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.modeling.deepseekv3 import (
    DeepseekV3Config,
    DeepseekV3ForCausalLM,
    MLARuntimeState,
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


def _build(tier, monkeypatch):
    monkeypatch.setenv("MOJO_BACKEND", tier)
    return DeepseekV3ForCausalLM(DeepseekV3Config(**TINY), key=jax.random.PRNGKey(11))


def test_deepseek_generates_and_tiers_agree(monkeypatch):
    ids = np.array([1, 2, 3, 4, 5, 9, 8, 7], np.int32)
    lens = np.array([5, 3], np.int32)

    outs = {}
    for tier in ("ref", "xla"):
        model = _build(tier, monkeypatch)
        gm = PagedAttentionGenerationModel(
            model, block_size=16, session_cls=MLARuntimeState, jit=(tier == "xla")
        )
        logits, session = gm(ids, context_input_len=lens)
        toks = jnp.argmax(logits, -1).astype(jnp.int32)
        seq = [np.asarray(toks)]
        for _ in range(3):
            logits, session = gm(toks, session=session)
            toks = jnp.argmax(logits, -1).astype(jnp.int32)
            seq.append(np.asarray(toks))
        outs[tier] = (np.asarray(logits), np.stack(seq))

    np.testing.assert_allclose(outs["ref"][0], outs["xla"][0], atol=2e-3, rtol=2e-3)
    np.testing.assert_array_equal(outs["ref"][1], outs["xla"][1])


def test_deepseek_q_lora_none(monkeypatch):
    monkeypatch.setenv("MOJO_BACKEND", "xla")
    cfg = DeepseekV3Config(**{**TINY, "q_lora_rank": None})
    model = DeepseekV3ForCausalLM(cfg, key=jax.random.PRNGKey(0))
    gm = PagedAttentionGenerationModel(model, block_size=16, session_cls=MLARuntimeState)
    logits, _ = gm(np.array([1, 2, 3], np.int32), context_input_len=np.array([3], np.int32))
    assert logits.shape == (1, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_mla_session_cache_shapes():
    cfg = DeepseekV3Config(**TINY)
    sess = MLARuntimeState(cfg.to_mojo(), batch_size=2, block_size=16)
    assert sess.caches.key(0).shape[-1] == TINY["kv_lora_rank"]
    # rope lanes are padded to 128 for Pallas DMA alignment; ops slice to dr
    assert sess.caches.value(0).shape[-1] == -(-TINY["qk_rope_head_dim"] // 128) * 128
    assert sess.caches.key(0).shape[1] == 1
