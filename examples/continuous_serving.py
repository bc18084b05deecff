"""Continuous-batching serving demo.

Feeds a synthetic request stream through ContinuousBatchingGenerator
(optionally with speculative rounds) and reports per-request streams and
aggregate throughput. CPU: `env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu
python examples/continuous_serving.py --requests 8 --slots 4`.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=8)
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--max-new-tokens", type=int, default=16)
    p.add_argument("--decode-window", type=int, default=1)
    p.add_argument("--bucket-admits", action="store_true")
    p.add_argument("--max-prefill-chunk", type=int, default=None)
    p.add_argument("--prefix-cache-blocks", type=int, default=0)
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="speculative rounds with the w8a8 self-draft")
    p.add_argument("--block-size", type=int, default=32)
    args = p.parse_args()

    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM, quantize_qwen3
    from mojo_opset_tpu.runtime import (
        ContinuousBatchingGenerator,
        SpeculativeContinuousBatchingGenerator,
    )

    cfg = Qwen3Config(
        hidden_size=256, intermediate_size=512, num_attention_heads=8,
        num_key_value_heads=4, num_hidden_layers=4, head_dim=32,
        vocab_size=32000, max_position_embeddings=4096,
        dtype=jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32,
    )
    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(0))

    if args.speculative:
        gen = SpeculativeContinuousBatchingGenerator(
            model, quantize_qwen3(model), speculative_k=args.speculative,
            batch_slots=args.slots, block_size=args.block_size,
            max_new_tokens=args.max_new_tokens,
        )
    else:
        gen = ContinuousBatchingGenerator(
            model, batch_slots=args.slots, block_size=args.block_size,
            max_new_tokens=args.max_new_tokens,
            decode_window=args.decode_window, bucket_admits=args.bucket_admits,
            max_prefill_chunk=args.max_prefill_chunk,
            prefix_cache_blocks=args.prefix_cache_blocks,
        )

    rng = np.random.default_rng(0)
    rids = [
        gen.submit(rng.integers(1, cfg.vocab_size, (int(n),)).astype(np.int32))
        for n in rng.integers(4, 48, (args.requests,))
    ]
    t0 = time.perf_counter()
    results = gen.run()
    dt = time.perf_counter() - t0
    total = sum(len(v) for v in results.values())
    for rid in rids:
        print(f"req {rid}: {results[rid].tolist()}")
    print("-" * 40)
    print(f"{len(rids)} requests, {total} tokens in {dt:.2f}s "
          f"({total / dt:.1f} tok/s aggregate)")


if __name__ == "__main__":
    main()
