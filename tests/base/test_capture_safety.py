"""Graph-capture safety for the compiled-step runtime.

Reference analogue: tests/accuracy/operators/test_attention_cudagraph.py
(996 LoC) — attention steps captured into device graphs must replay
correctly when input VALUES change (no baked-in constants), when the
session is swapped, and across interleaved prefill/decode executables,
with donated KV buffers never corrupting the trajectory.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m
from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
from mojo_opset_tpu.runtime import PagedAttentionGenerationModel
from mojo_opset_tpu.runtime.session import FusedDecode

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def tiny_cfg(**kw):
    base = dict(
        hidden_size=64, intermediate_size=128, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, head_dim=16,
        vocab_size=128, max_position_embeddings=256, dtype=jnp.float32,
    )
    base.update(kw)
    return Qwen3Config(**base)


@pytest.fixture(scope="module")
def model():
    return Qwen3ForCausalLM(tiny_cfg(), key=jax.random.PRNGKey(7))


def _gen(model, ids, lens, steps, jit):
    """Prefill + greedy decode `steps` tokens; returns token matrix."""
    gm = PagedAttentionGenerationModel(model, block_size=16, jit=jit)
    logits, session = gm(ids, context_input_len=lens)
    toks = [np.asarray(jnp.argmax(logits, -1)).astype(np.int32)]
    for _ in range(steps):
        logits, session = gm(toks[-1], session=session)
        toks.append(np.asarray(jnp.argmax(logits, -1)).astype(np.int32))
    return np.stack(toks)


def test_captured_replay_matches_eager_trajectory(model):
    """The jitted (captured/replayed) generation path must match the
    uncompiled eager path token-for-token — the core capture-safety
    property (reference test_attention_cudagraph.py)."""
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (24,)).astype(np.int32)
    lens = np.array([16, 8], np.int32)
    want = _gen(model, ids, lens, steps=6, jit=False)
    got = _gen(model, ids, lens, steps=6, jit=True)
    np.testing.assert_array_equal(got, want)


def test_replay_with_different_values_same_shapes(model):
    """Same executable, different prompt values: results must track the
    inputs (catches metadata baked in as constants)."""
    gm = PagedAttentionGenerationModel(model, block_size=16)
    rng = np.random.default_rng(1)
    lens = np.array([12, 12], np.int32)
    ids_a = rng.integers(0, 128, (24,)).astype(np.int32)
    ids_b = rng.integers(0, 128, (24,)).astype(np.int32)
    la, _ = gm(ids_a, context_input_len=lens)
    n_exec = sum(len(p._pool) for p in [gm._pool])
    lb, _ = gm(ids_b, context_input_len=lens)
    assert sum(len(p._pool) for p in [gm._pool]) == n_exec, "should replay, not recompile"
    ref = PagedAttentionGenerationModel(model, block_size=16, jit=False)
    wa, _ = ref(ids_a, context_input_len=lens)
    wb, _ = ref(ids_b, context_input_len=lens)
    np.testing.assert_allclose(np.asarray(la), np.asarray(wa), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(wb), atol=1e-5, rtol=1e-5)
    assert not np.allclose(np.asarray(la), np.asarray(lb))


def test_session_swap_replays_safely(model):
    """A NEW session with identical shapes reuses the executable and does
    not leak KV state from the old session (reference DeviceGraphPool
    session backup/restore semantics, compile/device_graph.py:76-105)."""
    gm = PagedAttentionGenerationModel(model, block_size=16)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 128, (16,)).astype(np.int32)
    lens = np.array([16], np.int32)
    l1, s1 = gm(ids, context_input_len=lens)
    # decode a few tokens on session 1 to mutate its caches
    tok = np.asarray(jnp.argmax(l1, -1)).astype(np.int32)
    for _ in range(3):
        l1, s1 = gm(tok, session=s1)
        tok = np.asarray(jnp.argmax(l1, -1)).astype(np.int32)
    # fresh session, same prompt: prefill logits must match a fresh model
    l2, _ = gm(ids, context_input_len=lens)
    ref = PagedAttentionGenerationModel(model, block_size=16, jit=False)
    want, _ = ref(ids, context_input_len=lens)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_distinct_shapes_get_distinct_executables(model):
    gm = PagedAttentionGenerationModel(model, block_size=16)
    rng = np.random.default_rng(3)
    gm(rng.integers(0, 128, (16,)).astype(np.int32), context_input_len=np.array([16], np.int32))
    n1 = len(gm._pool._pool)
    gm(rng.integers(0, 128, (32,)).astype(np.int32), context_input_len=np.array([32], np.int32))
    n2 = len(gm._pool._pool)
    assert n2 == n1 + 1
    # same shape again: replay
    gm(rng.integers(0, 128, (32,)).astype(np.int32), context_input_len=np.array([32], np.int32))
    assert len(gm._pool._pool) == n2


def test_fused_decode_matches_step_by_step(model):
    """FusedDecode (whole window in one executable, donated caches) must
    equal the per-token jitted loop."""
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 128, (20,)).astype(np.int32)
    lens = np.array([12, 8], np.int32)
    want = _gen(model, ids, lens, steps=5, jit=True)  # step-by-step

    gm = PagedAttentionGenerationModel(model, block_size=16)
    logits, session = gm(ids, context_input_len=lens)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    fused = FusedDecode(model, sample_method="greedy")
    toks = np.asarray(fused(session, first, 5))
    got = np.concatenate([np.asarray(first)[None], toks])
    np.testing.assert_array_equal(got, want)


def test_fused_decode_window_reuse_and_fresh_session(model):
    """Back-to-back fused windows continue the sequence; a fresh session
    re-running the same prompt reproduces the same tokens (donated-buffer
    aliasing must not leak between sessions)."""
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 128, (16,)).astype(np.int32)
    lens = np.array([16], np.int32)

    def run(steps_a, steps_b):
        gm = PagedAttentionGenerationModel(model, block_size=16)
        logits, session = gm(ids, context_input_len=lens)
        first = jnp.argmax(logits, -1).astype(jnp.int32)
        fused = FusedDecode(model, sample_method="greedy")
        t1 = np.asarray(fused(session, first, steps_a))
        t2 = np.asarray(fused(session, jnp.asarray(t1[-1]), steps_b))
        return np.concatenate([t1, t2])

    a = run(4, 4)
    b = run(4, 4)
    np.testing.assert_array_equal(a, b)
    # and the full window equals one straight 8-step window
    gm = PagedAttentionGenerationModel(model, block_size=16)
    logits, session = gm(ids, context_input_len=lens)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    straight = np.asarray(FusedDecode(model, sample_method="greedy")(session, first, 8))
    np.testing.assert_array_equal(a, straight)


def test_interleaved_prefill_decode_executables(model):
    """Alternating prefill/decode across two live sessions: each replays
    its own executable, no cross-talk (pool keyed by signature)."""
    gm = PagedAttentionGenerationModel(model, block_size=16)
    rng = np.random.default_rng(6)
    ids1 = rng.integers(0, 128, (16,)).astype(np.int32)
    ids2 = rng.integers(0, 128, (16,)).astype(np.int32)
    l1, s1 = gm(ids1, context_input_len=np.array([16], np.int32))
    l2, s2 = gm(ids2, context_input_len=np.array([16], np.int32))
    t1 = np.asarray(jnp.argmax(l1, -1)).astype(np.int32)
    t2 = np.asarray(jnp.argmax(l2, -1)).astype(np.int32)
    seq1, seq2 = [t1], [t2]
    for _ in range(4):  # interleave decodes
        l1, s1 = gm(seq1[-1], session=s1)
        l2, s2 = gm(seq2[-1], session=s2)
        seq1.append(np.asarray(jnp.argmax(l1, -1)).astype(np.int32))
        seq2.append(np.asarray(jnp.argmax(l2, -1)).astype(np.int32))
    # each must equal its isolated run
    want1 = _gen(model, ids1, np.array([16], np.int32), steps=4, jit=True)
    want2 = _gen(model, ids2, np.array([16], np.int32), steps=4, jit=True)
    np.testing.assert_array_equal(np.stack(seq1), want1)
    np.testing.assert_array_equal(np.stack(seq2), want2)


def test_store_kv_capture_safe_across_offsets(model):
    """The paged KV store inside the captured step must scatter to
    positions derived from RUNTIME metadata: decode steps at different
    offsets within one executable land tokens in different slots."""
    gm = PagedAttentionGenerationModel(model, block_size=16)
    rng = np.random.default_rng(8)
    ids = rng.integers(0, 128, (8,)).astype(np.int32)
    lens = np.array([8], np.int32)
    logits, session = gm(ids, context_input_len=lens)
    k_before = np.asarray(session.caches.key(0)).copy()
    tok = np.asarray(jnp.argmax(logits, -1)).astype(np.int32)
    offsets = []
    for _ in range(3):
        logits, session = gm(tok, session=session)
        k_now = np.asarray(session.caches.key(0))
        # layout-agnostic: the set of (cache positions) whose vectors changed
        changed = frozenset(map(tuple, np.argwhere(np.any(k_now != k_before, axis=-1))))
        offsets.append(changed)
        k_before = k_now.copy()
        tok = np.asarray(jnp.argmax(logits, -1)).astype(np.int32)
    # three decode steps -> three distinct slots written, one per step
    assert all(len(o) >= 1 for o in offsets)
    assert len(set(offsets)) == len(offsets), f"stale offsets repeated: {offsets}"
