"""PerfMojoGenerator e2e-protocol test at toy geometry.

The reference defines the e2e benchmark protocol through this class
(reference generation.py:284-373: prefill seqlen sweep @ bs1, decode
throughput sweep @ fixed context).  Here the protocol machinery itself is
validated on CPU with a tiny model: record structure, warm-run exclusion
(compile never lands in the record), and the fused-decode variant.
"""

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
from mojo_opset_tpu.runtime import PagedAttentionGenerationModel
from mojo_opset_tpu.runtime.generation import GreedySampler, PerfMojoGenerator
import pytest

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


class _Tok:
    eos_token_id = 0


def _perf_gen(max_new_tokens=4):
    cfg = Qwen3Config(
        hidden_size=32, intermediate_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, head_dim=8, vocab_size=64,
        max_position_embeddings=256, dtype=jnp.float32,
    )
    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(0))
    gm = PagedAttentionGenerationModel(model, block_size=16)
    gen = PerfMojoGenerator(gm, _Tok(), GreedySampler(), max_new_tokens=max_new_tokens)
    gen.DECODE_CONTEXT = 24  # shrink the protocol's fixed context for CPU
    return gen


def test_protocol_sweep_records():
    gen = _perf_gen()
    out = gen(prefill_seqlens=(16, 32), decode_batch_sizes=(1, 2))

    assert [r["in_tok"] for r in out["prefill"]] == [16, 32]
    for r in out["prefill"]:
        assert r["batch_size"] == 1
        assert r["prefill_ms"] > 0

    assert [r["batch_size"] for r in out["decode"]] == [1, 2]
    for r in out["decode"]:
        assert r["decode_steps"] == 3  # max_new_tokens - 1 stepwise decodes
        assert r["decode_avg_ms"] > 0
        assert r["throughput"] > 0
    assert out["fused_decode"] == []


def test_warm_run_excluded_from_records():
    """Each case runs twice; only the second (warm) run is recorded."""
    gen = _perf_gen()
    out = gen(prefill_seqlens=(16,), decode_batch_sizes=(1,))
    # one record per case, not two
    assert len(out["prefill"]) == 1
    assert len(out["decode"]) == 1


def test_fused_decode_sweep():
    gen = _perf_gen()
    out = gen(prefill_seqlens=(16,), decode_batch_sizes=(1,), fused=True)
    assert len(out["fused_decode"]) == 1
    r = out["fused_decode"][0]
    assert r["batch_size"] == 1 and r["decode_steps"] == 4
    assert r["throughput"] > 0
