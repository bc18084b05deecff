"""TP=4 serving decode must be token-identical to single-device decode.

Multichip e2e serving evidence (the reference's dist-test discipline,
reference tests/distributed/test_paged_gqa_tp.py:1): the full generator
loop — paged prefill, per-step decode, greedy argmax — runs over a
4-way tensor-parallel mesh on the virtual-CPU backend and must produce
exactly the tokens the unsharded model produces, both through the raw
PagedAttentionGenerationModel step loop and through
ContinuousBatchingGenerator.
"""

import pytest

from .dist_common import run_distributed

pytestmark = pytest.mark.slow


def test_tp4_generator_decode_token_parity():
    run_distributed("""
    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
    from mojo_opset_tpu.parallel.plans import qwen3_tp_rules, shard_model
    from mojo_opset_tpu.runtime import PagedAttentionGenerationModel

    cfg = Qwen3Config(hidden_size=64, intermediate_size=128, num_attention_heads=8,
                      num_key_value_heads=4, num_hidden_layers=2, head_dim=16,
                      vocab_size=256, max_position_embeddings=128, dtype=jnp.float32)
    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(3))
    rng = np.random.default_rng(11)
    B, S, steps = 2, 9, 8
    ids = rng.integers(1, 256, (B * S,)).astype(np.int32)
    lens = np.full((B,), S, np.int32)

    def decode_tokens(mdl):
        gm = PagedAttentionGenerationModel(mdl, block_size=16)
        logits, session = gm(ids, context_input_len=lens)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        toks = [np.asarray(tok)]
        for _ in range(steps - 1):
            logits, session = gm(np.asarray(tok, np.int32), session=session)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            toks.append(np.asarray(tok))
        return np.stack(toks, 1)

    want = decode_tokens(model)

    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    sharded = shard_model(model, mesh, qwen3_tp_rules(tp_axis="tp"))
    with mesh:
        got = decode_tokens(sharded)
    np.testing.assert_array_equal(got, want)
    print("TP4 generator decode parity OK", got.shape)
    """)


def test_tp4_continuous_batching_token_parity():
    run_distributed("""
    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
    from mojo_opset_tpu.parallel.plans import qwen3_tp_rules, shard_model
    from mojo_opset_tpu.runtime import PagedAttentionGenerationModel
    from mojo_opset_tpu.runtime.continuous import ContinuousBatchingGenerator

    cfg = Qwen3Config(hidden_size=64, intermediate_size=128, num_attention_heads=8,
                      num_key_value_heads=4, num_hidden_layers=2, head_dim=16,
                      vocab_size=256, max_position_embeddings=128, dtype=jnp.float32)
    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(3))
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 256, (int(n),)).astype(np.int32) for n in (5, 9, 3)]
    steps = 5

    def standalone(mdl, p):
        gm = PagedAttentionGenerationModel(mdl, block_size=16)
        logits, session = gm(p, context_input_len=np.array([len(p)], np.int32))
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        out = [int(tok[0])]
        for _ in range(steps - 1):
            logits, session = gm(np.asarray(tok, np.int32), session=session)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            out.append(int(tok[0]))
        return np.asarray(out, np.int32)

    want = [standalone(model, p) for p in prompts]

    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    sharded = shard_model(model, mesh, qwen3_tp_rules(tp_axis="tp"))
    with mesh:
        gen = ContinuousBatchingGenerator(sharded, batch_slots=2, block_size=16,
                                          max_new_tokens=steps)
        rids = [gen.submit(p) for p in prompts]
        results = gen.run()
    for rid, w in zip(rids, want):
        np.testing.assert_array_equal(results[rid], w)
    print("TP4 continuous batching parity OK")
    """)
