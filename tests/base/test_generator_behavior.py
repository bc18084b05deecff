"""MojoGenerator loop behaviors: EOS masking, hooks, typewriter, samplers.

Reference analogue: the generate-loop contracts in
runtime/generation.py:109-281 (EOS masking per sequence, early stop when
the whole batch ended, hook bus ordering, typewriter streaming).  Driven
with a scripted fake model so token trajectories are fully controlled.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mojo_opset_tpu.runtime.generation import (
    GeneratorHook,
    GreedySampler,
    MojoGenerator,
    TopKSampler,
    _Typewriter,
)


class _ScriptedModel:
    """Returns logits that force a given per-step token schedule."""

    def __init__(self, schedule, vocab=16):
        # schedule: list over steps of per-batch token ids; step 0 = prefill
        self.schedule = np.asarray(schedule)
        self.vocab = vocab
        self.calls = 0

    def _logits(self, step):
        toks = self.schedule[step]
        out = np.full((len(toks), self.vocab), -1e9, np.float32)
        out[np.arange(len(toks)), toks] = 0.0
        return jnp.asarray(out)

    def __call__(self, input_ids, context_input_len=None, session=None):
        logits = self._logits(self.calls)
        self.calls += 1
        return logits, object()


class _Tok:
    eos_token_id = 9

    def decode(self, ids):
        return "".join(chr(97 + int(i) % 26) for i in np.atleast_1d(ids))


def _gen(model, sampler=None, **kw):
    return MojoGenerator(model, _Tok(), sampler or GreedySampler(), **kw)


def test_eos_masks_remaining_tokens_per_sequence():
    # seq0 hits EOS at step 1; seq1 keeps generating
    model = _ScriptedModel([[3, 4], [9, 5], [7, 6], [8, 7]])
    out = _gen(model).generate_from_ids(np.zeros(2, np.int32), np.ones(2, np.int32),
                                        max_decode_steps=4, silent=True)
    np.testing.assert_array_equal(out[0], [3, 9, 9, 9])  # frozen at EOS
    np.testing.assert_array_equal(out[1], [4, 5, 6, 7])


def test_early_stop_when_all_sequences_end():
    model = _ScriptedModel([[3], [9], [1], [2]])
    out = _gen(model).generate_from_ids(np.zeros(1, np.int32), np.ones(1, np.int32),
                                        max_decode_steps=4, silent=True)
    # the batch-ending EOS step IS emitted (matching the fused path),
    # then the loop stops with no wasted steps
    np.testing.assert_array_equal(out, [[3, 9]])
    assert model.calls == 2  # prefill + one decode


def test_ignore_eos_keeps_generating():
    model = _ScriptedModel([[9], [9], [9], [9]])
    out = _gen(model).generate_from_ids(np.zeros(1, np.int32), np.ones(1, np.int32),
                                        max_decode_steps=4, ignore_eos=True, silent=True)
    np.testing.assert_array_equal(out[0], [9, 9, 9, 9])
    assert model.calls == 4


def test_missing_eos_token_disables_masking():
    class NoEos:
        eos_token_id = None

        def decode(self, ids):
            return ""

    model = _ScriptedModel([[2], [3], [4]])
    gen = MojoGenerator(model, NoEos(), GreedySampler())
    out = gen.generate_from_ids(np.zeros(1, np.int32), np.ones(1, np.int32),
                                max_decode_steps=3, silent=True)
    np.testing.assert_array_equal(out[0], [2, 3, 4])


def test_hook_bus_order_and_payloads():
    events = []

    class Rec(GeneratorHook):
        def before_prefill(self, *, input_ids, context_input_len):
            events.append(("before_prefill", len(input_ids)))

        def after_prefill(self, *, logits, session):
            events.append(("after_prefill", logits.shape[0]))

        def before_decode(self):
            events.append(("before_decode",))

        def after_decode_step(self, *, step, logits, next_token_id):
            events.append(("step", step))

        def after_decode(self, *, decode_steps, generated_ids):
            events.append(("after_decode", decode_steps, len(generated_ids)))

    model = _ScriptedModel([[1], [2], [3]])
    _gen(model, hooks=[Rec()]).generate_from_ids(
        np.zeros(3, np.int32), np.asarray([1, 1, 1], np.int32),
        max_decode_steps=3, silent=True)
    assert events[0] == ("before_prefill", 3)
    assert events[1] == ("after_prefill", 1)
    assert events[2] == ("before_decode",)
    assert [e for e in events if e[0] == "step"] == [("step", 1), ("step", 2)]
    assert events[-1] == ("after_decode", 2, 3)


def test_stepwise_and_fused_sampler_key_streams_are_deterministic():
    """Same seed -> same trajectory for a stochastic sampler."""
    sched = [[i % 7] for i in range(5)]

    def run(seed):
        model = _ScriptedModel(sched)
        gen = _gen(model, sampler=TopKSampler(3), seed=seed)
        return gen.generate_from_ids(np.zeros(1, np.int32), np.ones(1, np.int32),
                                     max_decode_steps=5, ignore_eos=True, silent=True)

    a, b, c = run(0), run(0), run(1)
    np.testing.assert_array_equal(a, b)
    assert a.shape == c.shape


def test_typewriter_streams_and_closes(capsys):
    tw = _Typewriter(_Tok())
    tw.send([np.asarray([[0, 1]]), np.asarray([[2, 3]])])
    tw.close()
    outerr = capsys.readouterr()
    assert "ab" in outerr.out and "cd" in outerr.out
    assert "Generation is done." in outerr.out
    assert not tw._thread.is_alive()


def test_call_tokenizes_prompts(capsys):
    class Tok(_Tok):
        def __call__(self, prompts, return_tensors=None):
            class R:
                input_ids = [[5, 6], [7]]

            return R()

    model = _ScriptedModel([[1, 2], [3, 4]])
    gen = MojoGenerator(model, Tok(), GreedySampler())
    out = gen("hello", max_decode_steps=2, silent=True)
    assert out.shape == (2, 2)
    # varlen packing: prefill got 3 packed tokens with lens [2, 1]
    assert "Prompt" in capsys.readouterr().out


def test_greedy_sampler_argmax_and_topk_support():
    logits = jnp.asarray([[0.1, 3.0, -1.0], [2.0, 0.0, 1.0]])
    np.testing.assert_array_equal(np.asarray(GreedySampler()(logits)), [1, 0])
    tok = TopKSampler(1)(logits, key=jnp.asarray([0, 1], jnp.uint32))
    np.testing.assert_array_equal(np.asarray(tok), [1, 0])  # k=1 == argmax


def test_decode_steps_counted_without_eos():
    model = _ScriptedModel([[1], [2], [3], [4], [5]])
    steps = []

    class Rec(GeneratorHook):
        def after_decode(self, *, decode_steps, generated_ids):
            steps.append(decode_steps)

    _gen(model, hooks=[Rec()]).generate_from_ids(
        np.zeros(1, np.int32), np.ones(1, np.int32), max_decode_steps=5,
        ignore_eos=True, silent=True)
    assert steps == [4]


def test_max_new_tokens_default_is_used():
    model = _ScriptedModel([[1]] * 6)
    gen = _gen(model)
    gen.max_new_tokens = 3
    out = gen.generate_from_ids(np.zeros(1, np.int32), np.ones(1, np.int32),
                                ignore_eos=True, silent=True)
    assert out.shape == (1, 3)
