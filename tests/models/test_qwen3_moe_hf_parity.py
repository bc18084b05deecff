"""Qwen3-MoE logits parity vs HuggingFace transformers (torch CPU).

Validates the full MoE chain — gating softmax/topk/renorm, dispatch,
grouped SwiGLU experts, combine — against the canonical implementation,
plus the per-expert -> fused weight stacking at load
(utils/hf.py stack_hf_moe_experts).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mojo_opset_tpu.runtime import PagedAttentionGenerationModel
from mojo_opset_tpu.utils.patching import apply_mojo_to_qwen3_moe
# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow

TINY_HF = dict(
    hidden_size=64,
    intermediate_size=128,
    num_attention_heads=4,
    num_key_value_heads=2,
    num_hidden_layers=2,
    head_dim=16,
    vocab_size=128,
    max_position_embeddings=128,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    num_experts=8,
    num_experts_per_tok=2,
    moe_intermediate_size=32,
    norm_topk_prob=True,  # our MojoMoEGating always renormalizes
    decoder_sparse_step=1,
    mlp_only_layers=[],
    attn_implementation="eager",
)


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.Qwen3MoeConfig(**TINY_HF)
    hf_model = transformers.Qwen3MoeForCausalLM(cfg).eval().to(torch.float32)
    path = tmp_path_factory.mktemp("qwen3_moe_tiny_hf")
    hf_model.save_pretrained(path, safe_serialization=True)
    return hf_model, str(path)


def _hf_logits(hf_model, ids_2d):
    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids_2d, dtype=torch.long))
    return out.logits.float().numpy()


def test_moe_prefill_logits_match_hf(hf_checkpoint):
    hf_model, path = hf_checkpoint
    model = apply_mojo_to_qwen3_moe(path, key=jax.random.PRNGKey(0))
    gm = PagedAttentionGenerationModel(model, block_size=16, jit=False)

    ids = np.array([[3, 17, 42, 5, 99, 1, 64, 23]], np.int32)
    want = _hf_logits(hf_model, ids)[:, -1]
    logits, _ = gm(ids[0], context_input_len=np.array([ids.shape[1]], np.int32))
    np.testing.assert_allclose(np.asarray(logits, np.float32), want, atol=2e-3, rtol=2e-3)


def test_moe_greedy_decode_tokens_match_hf(hf_checkpoint):
    hf_model, path = hf_checkpoint
    model = apply_mojo_to_qwen3_moe(path, key=jax.random.PRNGKey(0))
    gm = PagedAttentionGenerationModel(model, block_size=16, jit=False)

    prompt = [7, 3, 120, 11, 56]
    steps = 6
    hf_ids = list(prompt)
    for _ in range(steps):
        logits = _hf_logits(hf_model, np.array([hf_ids]))[0, -1]
        hf_ids.append(int(logits.argmax()))
    want_tokens = hf_ids[len(prompt):]

    logits, session = gm(np.array(prompt, np.int32),
                         context_input_len=np.array([len(prompt)], np.int32))
    got = []
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    got.append(int(tok[0]))
    for _ in range(steps - 1):
        logits, session = gm(tok, session=session)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        got.append(int(tok[0]))
    assert got == want_tokens
