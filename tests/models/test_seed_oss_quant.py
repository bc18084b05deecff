"""w8a8 Seed-OSS serving-mode tests (qkv biases ride outside QuantGemm)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operators import MojoQuantGemm
from mojo_opset_tpu.modeling.seed_oss import (
    SeedOssConfig,
    SeedOssForCausalLM,
    quantize_seed_oss,
)
from mojo_opset_tpu.runtime import PagedAttentionGenerationModel
# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def _tiny_cfg(**kw):
    return SeedOssConfig(
        hidden_size=64, intermediate_size=128, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, head_dim=16,
        vocab_size=256, max_position_embeddings=128, dtype=jnp.float32, **kw,
    )


@pytest.fixture(scope="module")
def models():
    base = SeedOssForCausalLM(_tiny_cfg(), key=jax.random.PRNGKey(4))
    return base, quantize_seed_oss(base)


def _logits(model, ids):
    gm = PagedAttentionGenerationModel(model, block_size=16)
    logits, _ = gm(ids, context_input_len=np.array([len(ids)], np.int32))
    return np.asarray(logits, np.float32)


def test_quant_structure_and_biases(models):
    base, qm = models
    attn = qm.layers[0].self_attn
    assert isinstance(attn.q_proj, MojoQuantGemm)
    assert attn.q_proj.weight.dtype == jnp.int8
    # qkv biases copied fp (default config has attention_bias=True)
    np.testing.assert_array_equal(
        np.asarray(attn.q_bias), np.asarray(base.layers[0].self_attn.q_proj.bias)
    )
    assert attn.o_bias is None  # attention_out_bias=False


def test_quant_logits_track_fp(models):
    base, qm = models
    ids = np.array([3, 141, 59, 26, 200, 77, 12], np.int32)
    lb, lq = _logits(base, ids), _logits(qm, ids)
    cos = float((lb * lq).sum() / (np.linalg.norm(lb) * np.linalg.norm(lq) + 1e-12))
    assert cos > 0.99, f"w8a8 Seed-OSS logits diverged: cos={cos}"
    assert int(lb.argmax()) == int(lq.argmax())


def test_quant_generation_runs(models):
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
