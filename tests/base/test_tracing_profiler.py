"""Chrome-trace emitter + profiler hook tests.

Reference analogue: the MojoTracingGenerator (utils/tracing.py:9-138)
and NPUProfilerHook (utils/profiler.py:11-93) subsystems, SURVEY §5.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from mojo_opset_tpu.utils.tracing import MojoTracingGenerator


def test_chrome_trace_round_trip(tmp_path):
    tr = MojoTracingGenerator(process_name="unit")
    tr.set_thread_name("decode")
    tr.begin("prefill", model="qwen3")
    tr.end("prefill")
    tr.instant("eos")
    tr.complete("kernel", start_us=10.0, dur_us=5.0, flops=123)
    with tr.span("step"):
        pass
    out = tmp_path / "trace.json"
    tr.save(str(out))

    data = json.loads(out.read_text())
    events = data["traceEvents"] if isinstance(data, dict) else data
    phases = [e.get("ph") for e in events]
    names = [e.get("name") for e in events]
    # metadata + B/E pair + instant + complete + span pair
    assert "prefill" in names and "kernel" in names and "step" in names
    assert "B" in phases and "E" in phases and "X" in phases and "i" in phases
    # process/thread metadata present (chrome://tracing needs it)
    assert any(e.get("ph") == "M" for e in events)
    # B/E properly nested per name
    b = next(e for e in events if e.get("name") == "prefill" and e["ph"] == "B")
    e_ = next(e for e in events if e.get("name") == "prefill" and e["ph"] == "E")
    assert e_["ts"] >= b["ts"]
    assert b["args"]["model"] == "qwen3"


def test_span_records_duration(tmp_path):
    import time

    tr = MojoTracingGenerator()
    with tr.span("sleepy"):
        time.sleep(0.01)
    out = tmp_path / "t.json"
    tr.save(str(out))
    events = json.loads(out.read_text())
    events = events["traceEvents"] if isinstance(events, dict) else events
    b = next(e for e in events if e.get("name") == "sleepy" and e["ph"] == "B")
    e_ = next(e for e in events if e.get("name") == "sleepy" and e["ph"] == "E")
    assert e_["ts"] - b["ts"] >= 9_000  # ≥9ms in µs


@pytest.mark.slow
def test_profiler_hook_wires_into_generator(tmp_path):
    """TPUProfilerHook runs through a real generate loop (start/stop via
    jax.profiler; on CPU the trace may be empty but the hook must not
    break generation)."""
    import jax

    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
    from mojo_opset_tpu.runtime import (
        GreedySampler,
        MojoGenerator,
        PagedAttentionGenerationModel,
    )
    from mojo_opset_tpu.utils.profiler import TPUProfilerHook

    cfg = Qwen3Config(
        hidden_size=32, intermediate_size=64, num_attention_heads=2,
        num_key_value_heads=2, num_hidden_layers=1, head_dim=16,
        vocab_size=64, max_position_embeddings=64, dtype=jnp.float32,
    )
    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(1))
    gm = PagedAttentionGenerationModel(model, block_size=16, jit=False)

    class Tok:
        eos_token_id = 0

    gen = MojoGenerator(gm, Tok(), GreedySampler(), max_new_tokens=6)
    hook = TPUProfilerHook(log_dir=str(tmp_path), wait=1, active=2)
    gen._hooks.append(hook)
    out = gen.generate_from_ids(np.array([1, 2, 3], np.int32), np.array([3], np.int32),
                                ignore_eos=True, silent=True)
    assert out.shape == (1, 6)


@pytest.mark.slow
def test_perf_hook_records_prefill_and_decode():
    import jax

    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
    from mojo_opset_tpu.runtime import (
        GreedySampler,
        MojoGenerator,
        PagedAttentionGenerationModel,
        PerfHook,
    )

    cfg = Qwen3Config(
        hidden_size=32, intermediate_size=64, num_attention_heads=2,
        num_key_value_heads=2, num_hidden_layers=1, head_dim=16,
        vocab_size=64, max_position_embeddings=64, dtype=jnp.float32,
    )
    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(1))
    gm = PagedAttentionGenerationModel(model, block_size=16, jit=False)

    class Tok:
        eos_token_id = 0

    gen = MojoGenerator(gm, Tok(), GreedySampler(), max_new_tokens=5)
    hook = PerfHook()
    gen._hooks.append(hook)
    gen.generate_from_ids(np.array([1, 2, 3, 4], np.int32), np.array([4], np.int32),
                          ignore_eos=True, silent=True)
    assert hook.records, "PerfHook recorded nothing"
    rec = hook.records[-1]
    assert rec["batch_size"] == 1 and rec["in_tok"] == 4
    assert rec["prefill_ms"] > 0 and rec["decode_avg_ms"] > 0
