"""Wan2.2 umT5 encoder parity vs HuggingFace transformers UMT5 (torch CPU).

Pins T5LayerNorm, unscaled (scale=1) attention, per-layer relative bias
(MojoRelativeEmbedding) and gated-GELU FFN to the canonical UMT5
implementation via a direct weight transplant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mojo_opset_tpu.modeling.wan2_2 import T5Encoder
from mojo_opset_tpu.utils.hf import load_state_dict

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow

CFG = dict(
    vocab_size=128,
    d_model=64,
    d_kv=16,
    num_heads=4,
    d_ff=96,
    num_layers=2,
    relative_attention_num_buckets=32,
    relative_attention_max_distance=128,
    feed_forward_proj="gated-gelu",
    dropout_rate=0.0,
    is_encoder_decoder=False,
    tie_word_embeddings=False,
)


def _transplant(hf_enc, jax_enc, num_layers):
    """Map UMT5 encoder weights onto our T5Encoder pytree."""
    sd = {k: v.detach().numpy() for k, v in hf_enc.state_dict().items()}
    w = {"token_embedding.weight": sd["encoder.embed_tokens.weight"]}
    for i in range(num_layers):
        p = f"encoder.block.{i}.layer"
        q = f"blocks.{i}"
        w[f"{q}.attn.q.weight"] = sd[f"{p}.0.SelfAttention.q.weight"]
        w[f"{q}.attn.k.weight"] = sd[f"{p}.0.SelfAttention.k.weight"]
        w[f"{q}.attn.v.weight"] = sd[f"{p}.0.SelfAttention.v.weight"]
        w[f"{q}.attn.o.weight"] = sd[f"{p}.0.SelfAttention.o.weight"]
        w[f"{q}.pos_embedding.embedding"] = sd[
            f"{p}.0.SelfAttention.relative_attention_bias.weight"
        ]
        w[f"{q}.norm1.weight"] = sd[f"{p}.0.layer_norm.weight"]
        w[f"{q}.ffn.gate.weight"] = sd[f"{p}.1.DenseReluDense.wi_0.weight"]
        w[f"{q}.ffn.fc1.weight"] = sd[f"{p}.1.DenseReluDense.wi_1.weight"]
        w[f"{q}.ffn.fc2.weight"] = sd[f"{p}.1.DenseReluDense.wo.weight"]
        w[f"{q}.norm2.weight"] = sd[f"{p}.1.layer_norm.weight"]
    w["norm.weight"] = sd["encoder.final_layer_norm.weight"]
    return load_state_dict(jax_enc, w, strict=True)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    hf_cfg = transformers.UMT5Config(**CFG)
    hf = transformers.UMT5EncoderModel(hf_cfg).eval().to(torch.float32)
    enc = T5Encoder(
        vocab=CFG["vocab_size"], dim=CFG["d_model"],
        dim_attn=CFG["d_kv"] * CFG["num_heads"], dim_ffn=CFG["d_ff"],
        num_heads=CFG["num_heads"], num_layers=CFG["num_layers"],
        num_buckets=CFG["relative_attention_num_buckets"],
        shared_pos=False,  # umT5: per-layer relative bias
        key=jax.random.PRNGKey(0),
    )
    enc = _transplant(hf, enc, CFG["num_layers"])
    return hf, enc


def test_umt5_encoder_hidden_states_match(models):
    hf, enc = models
    ids = np.array([[3, 17, 42, 5, 99, 1, 64, 23]], np.int32)
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids, dtype=torch.long)).last_hidden_state.numpy()
    got = np.asarray(enc(jnp.asarray(ids)), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_umt5_encoder_respects_attention_mask(models):
    hf, enc = models
    ids = np.array([[3, 17, 42, 5, 0, 0]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0]], np.int32)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    got = np.asarray(enc(jnp.asarray(ids), jnp.asarray(mask)), np.float32)
    # only the unmasked positions are meaningful
    np.testing.assert_allclose(got[:, :4], want[:, :4], atol=2e-4, rtol=2e-4)
