"""Continuous batching: per-request outputs must match standalone greedy
generation regardless of admission order, queue length, or slot reuse."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
from mojo_opset_tpu.runtime import PagedAttentionGenerationModel
from mojo_opset_tpu.runtime.continuous import ContinuousBatchingGenerator

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model():
    cfg = Qwen3Config(
        hidden_size=64, intermediate_size=128, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, head_dim=16,
        vocab_size=256, max_position_embeddings=256, dtype=jnp.float32,
    )
    return Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(13))


def _standalone(model, ids, steps):
    gm = PagedAttentionGenerationModel(model, block_size=16)
    logits, session = gm(ids, context_input_len=np.array([len(ids)], np.int32))
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    out = [int(tok[0])]
    for _ in range(steps - 1):
        logits, session = gm(np.asarray(tok, np.int32), session=session)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        out.append(int(tok[0]))
    return np.asarray(out, np.int32)


def test_more_requests_than_slots_match_standalone(model):
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 256, (int(n),)).astype(np.int32)
               for n in (5, 9, 3, 7, 4, 11, 6)]
    steps = 6
    gen = ContinuousBatchingGenerator(model, batch_slots=3, block_size=16,
                                      max_new_tokens=steps)
    rids = [gen.submit(p) for p in prompts]
    results = gen.run()
    assert sorted(results) == sorted(rids)
    for rid, p in zip(rids, prompts):
        np.testing.assert_array_equal(results[rid], _standalone(model, p, steps),
                                      err_msg=f"request {rid} diverged")


def test_eos_frees_slot_early(model):
    rng = np.random.default_rng(9)
    p0 = rng.integers(1, 256, (6,)).astype(np.int32)
    ref = _standalone(model, p0, 8)
    eos = int(ref[2])  # finish request 0 after 3 tokens
    gen = ContinuousBatchingGenerator(model, batch_slots=1, block_size=16,
                                      max_new_tokens=8, eos_token_id=eos)
    r0 = gen.submit(p0)
    p1 = rng.integers(1, 256, (4,)).astype(np.int32)
    r1 = gen.submit(p1)  # must wait for slot 0 to free
    results = gen.run()
    np.testing.assert_array_equal(results[r0], ref[:3])
    want1 = _standalone(model, p1, 8)
    got1 = results[r1]
    # request 1 may also hit the fake eos early; compare its valid prefix
    n = len(got1)
    np.testing.assert_array_equal(got1, want1[:n])


def test_second_run_reuses_session(model):
    rng = np.random.default_rng(2)
    gen = ContinuousBatchingGenerator(model, batch_slots=2, block_size=16,
                                      max_new_tokens=4)
    p = rng.integers(1, 256, (5,)).astype(np.int32)
    r0 = gen.submit(p)
    first = gen.run()
    r1 = gen.submit(p)  # same prompt resubmitted after the pool drained
    second = gen.run()
    np.testing.assert_array_equal(first[r0], second[r1])


def test_fused_window_matches_standalone(model):
    """decode_window > 1 (FusedDecode between admissions) must emit the
    same per-request streams as the step-by-step path."""
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 256, (int(n),)).astype(np.int32)
               for n in (5, 9, 3, 7, 4)]
    steps = 7
    gen = ContinuousBatchingGenerator(model, batch_slots=2, block_size=16,
                                      max_new_tokens=steps, decode_window=3)
    rids = [gen.submit(p) for p in prompts]
    results = gen.run()
    for rid, p in zip(rids, prompts):
        np.testing.assert_array_equal(results[rid], _standalone(model, p, steps),
                                      err_msg=f"request {rid} diverged (fused window)")


def test_fused_window_with_eos(model):
    rng = np.random.default_rng(9)
    p0 = rng.integers(1, 256, (6,)).astype(np.int32)
    ref = _standalone(model, p0, 8)
    eos = int(ref[4])
    gen = ContinuousBatchingGenerator(model, batch_slots=1, block_size=16,
                                      max_new_tokens=8, eos_token_id=eos,
                                      decode_window=3)
    r0 = gen.submit(p0)
    results = gen.run()
    np.testing.assert_array_equal(results[r0], ref[:5])


def test_speculative_continuous_matches_standalone(model):
    """The full stack — continuous batching + speculative rounds with an
    int8 self-draft — must still emit exact standalone greedy streams."""
    from mojo_opset_tpu.modeling.qwen3 import quantize_qwen3
    from mojo_opset_tpu.runtime.continuous import SpeculativeContinuousBatchingGenerator

    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 256, (int(n),)).astype(np.int32)
               for n in (5, 9, 3, 7, 4)]
    steps = 7
    gen = SpeculativeContinuousBatchingGenerator(
        model, quantize_qwen3(model), speculative_k=3,
        batch_slots=2, block_size=16, max_new_tokens=steps,
    )
    rids = [gen.submit(p) for p in prompts]
    results = gen.run()
    for rid, p in zip(rids, prompts):
        np.testing.assert_array_equal(results[rid], _standalone(model, p, steps),
                                      err_msg=f"request {rid} diverged (spec+cb)")


def test_speculative_continuous_eos(model):
    from mojo_opset_tpu.modeling.qwen3 import quantize_qwen3
    from mojo_opset_tpu.runtime.continuous import SpeculativeContinuousBatchingGenerator

    rng = np.random.default_rng(9)
    p0 = rng.integers(1, 256, (6,)).astype(np.int32)
    ref = _standalone(model, p0, 8)
    eos = int(ref[4])
    gen = SpeculativeContinuousBatchingGenerator(
        model, quantize_qwen3(model), speculative_k=3,
        batch_slots=1, block_size=16, max_new_tokens=8, eos_token_id=eos,
    )
    r0 = gen.submit(p0)
    results = gen.run()
    np.testing.assert_array_equal(results[r0], ref[:5])


def test_bucketed_admits_match_standalone(model):
    """bucket_admits pads the admit total via the scratch slot: bounded
    compile signatures, identical per-request streams."""
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 256, (int(n),)).astype(np.int32)
               for n in (5, 9, 3, 7, 4)]
    steps = 6
    gen = ContinuousBatchingGenerator(model, batch_slots=2, block_size=16,
                                      max_new_tokens=steps, bucket_admits=True)
    rids = [gen.submit(p) for p in prompts]
    results = gen.run()
    for rid, p in zip(rids, prompts):
        np.testing.assert_array_equal(results[rid], _standalone(model, p, steps),
                                      err_msg=f"request {rid} diverged (bucketed)")
    # every admit prefill shape was a bucket: the pool holds at most the
    # decode signature + a handful of bucketed prefill signatures
    n_sigs = len(gen.gm._runner_memo)
    assert n_sigs <= 4, f"too many compiled signatures: {n_sigs}"


def test_chunked_prefill_admission_matches_standalone(model):
    """max_prefill_chunk splits long prompts across several chunked
    prefill passes (context_kv_lens > 0 with is_prefill); streams must be
    identical to whole-prompt admission."""
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 256, (int(n),)).astype(np.int32)
               for n in (23, 4, 17, 9)]
    steps = 5
    gen = ContinuousBatchingGenerator(model, batch_slots=2, block_size=16,
                                      max_new_tokens=steps, max_prefill_chunk=8)
    rids = [gen.submit(p) for p in prompts]
    results = gen.run()
    for rid, p in zip(rids, prompts):
        np.testing.assert_array_equal(results[rid], _standalone(model, p, steps),
                                      err_msg=f"request {rid} diverged (chunked prefill)")


def test_chunked_prefill_with_buckets(model):
    rng = np.random.default_rng(12)
    prompts = [rng.integers(1, 256, (int(n),)).astype(np.int32) for n in (19, 6)]
    steps = 4
    gen = ContinuousBatchingGenerator(model, batch_slots=2, block_size=16,
                                      max_new_tokens=steps, max_prefill_chunk=8,
                                      bucket_admits=True)
    rids = [gen.submit(p) for p in prompts]
    results = gen.run()
    for rid, p in zip(rids, prompts):
        np.testing.assert_array_equal(results[rid], _standalone(model, p, steps))


def test_sampler_support_deterministic(model):
    """TopK sampling in the batcher: seeded, deterministic, in-vocab."""
    from mojo_opset_tpu.runtime import TopKSampler

    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 256, (int(n),)).astype(np.int32) for n in (5, 8, 4)]

    def run():
        gen = ContinuousBatchingGenerator(
            model, batch_slots=2, block_size=16, max_new_tokens=5,
            sampler=TopKSampler(10), seed=42,
        )
        rids = [gen.submit(p) for p in prompts]
        results = gen.run()
        return [results[r] for r in rids]

    a, b = run(), run()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
        assert ((0 <= x) & (x < 256)).all()


def test_prefix_cache_hits_and_stays_exact(model):
    """Automatic prefix caching: a repeated prompt reuses the cached
    prefix blocks (suffix-only prefill) and the stream stays exact."""
    rng = np.random.default_rng(21)
    base = rng.integers(1, 256, (37,)).astype(np.int32)
    # three requests sharing a 32-token (2-block) prefix + one unrelated
    p0 = base.copy()
    p1 = np.concatenate([base[:33], rng.integers(1, 256, (6,)).astype(np.int32)])
    p2 = base[:35].copy()
    p3 = rng.integers(1, 256, (20,)).astype(np.int32)
    steps = 5

    gen = ContinuousBatchingGenerator(model, batch_slots=1, block_size=16,
                                      max_new_tokens=steps, prefix_cache_blocks=8)
    r0 = gen.submit(p0)
    results0 = gen.run()  # p0 completes, donates floor(37/16)=2 blocks
    assert gen._prefix_owned == 2

    rids = [gen.submit(p) for p in (p1, p2, p3)]
    results = gen.run()
    results.update(results0)
    for rid, p in zip([r0] + rids, (p0, p1, p2, p3)):
        np.testing.assert_array_equal(results[rid], _standalone(model, p, steps),
                                      err_msg=f"request {rid} diverged (prefix cache)")
    # p1/p2 hit the 2-block prefix; lookups never exceed the budget
    assert gen._prefix_owned <= 8
    # the cached blocks survived every release (withheld from the pool)
    assert len(gen._prefix_block_ids) == gen._prefix_owned


def test_prefix_cache_budget_respected(model):
    rng = np.random.default_rng(22)
    gen = ContinuousBatchingGenerator(model, batch_slots=1, block_size=16,
                                      max_new_tokens=3, prefix_cache_blocks=2)
    # each distinct 37-token prompt would donate 2 blocks; budget caps at 2
    for i in range(3):
        gen.submit(rng.integers(1, 256, (37,)).astype(np.int32))
    gen.run()
    assert gen._prefix_owned <= 2


def test_prefix_cache_duplicate_prompts_do_not_leak(model):
    """Two in-flight requests with the SAME prompt: the second finisher
    must not withhold duplicate-content blocks from the pool (they would
    be scrubbed at release yet unreachable from the cache)."""
    rng = np.random.default_rng(31)
    prompt = rng.integers(1, 256, (37,)).astype(np.int32)  # 2 full blocks
    gen = ContinuousBatchingGenerator(model, batch_slots=2, block_size=16,
                                      max_new_tokens=3, prefix_cache_blocks=16)
    for _ in range(2):  # both admitted together -> both miss the cache
        gen.submit(prompt)
    gen.run()
    free_after_first = gen.session.free_block_count()
    assert gen._prefix_owned == 2  # exactly one donation
    # repeat the duplicate pair: pool usage must be stable (no drain)
    for _ in range(2):
        gen.submit(prompt)
    gen.run()
    assert gen._prefix_owned == 2
    assert gen.session.free_block_count() == free_after_first, "pool drained"


def test_empty_prompt_rejected(model):
    gen = ContinuousBatchingGenerator(model, batch_slots=1, block_size=16)
    with pytest.raises(ValueError, match="empty prompt"):
        gen.submit(np.array([], np.int32))


def test_spec_batcher_rejects_sampler(model):
    from mojo_opset_tpu.modeling.qwen3 import quantize_qwen3
    from mojo_opset_tpu.runtime import TopKSampler
    from mojo_opset_tpu.runtime.continuous import SpeculativeContinuousBatchingGenerator

    with pytest.raises(ValueError, match="greedy-only"):
        SpeculativeContinuousBatchingGenerator(
            model, quantize_qwen3(model), batch_slots=1, block_size=16,
            sampler=TopKSampler(5),
        )
