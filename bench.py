"""Benchmark entry point — prints ONE JSON line with the headline metric.

Headline: paged-decode GQA latency at the reference's published shape
(q(8,16,128) bf16, 4 kv heads, 32-block tables — reference
tests/perf/benchmark.md:13, 75.13 µs on Ascend NPU 910B with the TTX
Triton backend).  ``vs_baseline`` is the speedup ratio baseline/ours
(>1 means we are faster than the reference backend).

Also runs a small Qwen3 paged-decode model sweep (tokens/sec/chip, the
BASELINE.json metric of record) and includes it in the same JSON line as
auxiliary fields.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_PAGED_DECODE_US = 75.13  # tests/perf/benchmark.md:13 (NPU 910B, TTX)


def _time_fn(fn, *args, iters=50, warmup=5):
    from mojo_opset_tpu.benchmark import device_sync

    for _ in range(warmup):
        out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / iters


def _device_time_us(fn, *args, iters=16, **kw):
    from mojo_opset_tpu.benchmark import device_time_us

    return device_time_us(fn, *args, iters=iters, **kw)


def bench_paged_decode_gqa():
    """Reference shape: q (8, 16, 128) bf16; kv cache (·, 4, 32, 128);
    seq len ~ up to 4 blocks/seq of 32 = 128 ctx... use the benchmark.md
    row 13 layout: block tables (8, 4), block_size 32."""
    import mojo_opset_tpu as m

    B, Hq, Hkv, D = 8, 16, 4, 128
    block_size, blocks_per_seq = 32, 4
    n_blocks = B * blocks_per_seq
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, Hq, D), jnp.bfloat16)
    kc = jax.random.normal(k2, (n_blocks, Hkv, block_size, D), jnp.bfloat16)
    vc = jax.random.normal(k3, (n_blocks, Hkv, block_size, D), jnp.bfloat16)
    seq_lens = jnp.full((B,), block_size * blocks_per_seq, jnp.int32)
    bt = jnp.arange(n_blocks, dtype=jnp.int32).reshape(B, blocks_per_seq)

    op = m.MojoPagedDecodeGQA()  # highest-priority tier for the platform
    us = _device_time_us(lambda q, *r: op(q, *r), q, kc, vc, seq_lens, bt, iters=64)
    return us, type(op).__name__


def bench_qwen3_decode_tokens_per_sec():
    """Small-but-real Qwen3 paged decode throughput on one chip."""
    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
    from mojo_opset_tpu.runtime import PagedAttentionGenerationModel

    on_tpu = jax.default_backend() in ("tpu", "axon")
    # Qwen3-0.6B-like geometry (real Qwen3 uses head_dim=128 at every size)
    cfg = Qwen3Config(
        hidden_size=1024 if on_tpu else 128,
        intermediate_size=3072 if on_tpu else 256,
        num_attention_heads=16 if on_tpu else 4,
        num_key_value_heads=8 if on_tpu else 2,
        num_hidden_layers=8 if on_tpu else 2,
        head_dim=128 if on_tpu else 32,
        vocab_size=32000 if on_tpu else 512,
        max_position_embeddings=2048,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    from mojo_opset_tpu.runtime.session import FusedDecode

    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(0))
    gm = PagedAttentionGenerationModel(model, block_size=64)

    B, S = 8, 256
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (B * S,)).astype(np.int32)
    lens = np.full((B,), S, np.int32)
    logits, session = gm(ids, context_input_len=lens)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)

    fused = FusedDecode(model, sample_method="greedy")
    from mojo_opset_tpu.benchmark import device_sync

    def timed(steps, reps=3):
        toks = fused(session, tok, steps)  # compile + warm
        device_sync(toks)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            toks = fused(session, tok, steps)
            device_sync(toks)
            best = min(best, time.perf_counter() - t0)
        return best

    # steady-state tokens/sec from the marginal cost between two window
    # lengths (cancels dispatch/fetch floor, like the per-op timer)
    t_small, t_large = timed(32), timed(160)
    per_step = (t_large - t_small) / 128
    return B / per_step, cfg


def main():
    us, impl = bench_paged_decode_gqa()
    toks, cfg = bench_qwen3_decode_tokens_per_sec()
    result = {
        "metric": "paged_decode_gqa_q8x16x128_bf16_us",
        "value": round(us, 2),
        "unit": "us",
        "vs_baseline": round(BASELINE_PAGED_DECODE_US / us, 3),
        "baseline_us": BASELINE_PAGED_DECODE_US,
        "impl": impl,
        "backend": jax.default_backend(),
        "qwen3_decode_tok_per_sec_per_chip": round(toks, 1),
        "qwen3_bench_layers": cfg.num_hidden_layers,
        "qwen3_bench_hidden": cfg.hidden_size,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
