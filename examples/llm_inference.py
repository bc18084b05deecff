"""Qwen3 LLM inference example.

Parity: reference examples/llm_inference.py:38-120 — build a Qwen3 model
(from an HF checkpoint when given, else random weights), run paged
prefill + decode generation, print tokens, and optionally sweep the
PerfMojoGenerator protocol.

Usage::

    python examples/llm_inference.py [--checkpoint DIR] [--prompt TEXT]
        [--max-new-tokens N] [--perf] [--tiny]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def build_model(args):
    import dataclasses

    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM, quantize_qwen3

    if args.checkpoint:
        from mojo_opset_tpu.utils.patching import apply_mojo_to_qwen3

        model = apply_mojo_to_qwen3(args.checkpoint, key=jax.random.PRNGKey(0))
    else:
        if args.tiny:
            cfg = Qwen3Config(
                hidden_size=256, intermediate_size=512, num_attention_heads=8,
                num_key_value_heads=4, num_hidden_layers=4, head_dim=32,
                vocab_size=32000, max_position_embeddings=4096,
                dtype=jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32,
            )
        else:
            cfg = Qwen3Config()  # 32-layer default
        model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(0))
    if args.quant_kv:
        # int8 KV cache: rebuild the attention wiring; the parameter pytree
        # is identical, so the weights transfer leaf-for-leaf
        cfg = dataclasses.replace(model.qwen3_config, quant_kv=True)
        kvm = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(0))
        model = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(kvm), jax.tree_util.tree_leaves(model)
        )
    if args.quant == "w8a8":
        model = quantize_qwen3(model)
    return model


class _FallbackTokenizer:
    """Byte-level stand-in when no HF tokenizer is available."""

    eos_token_id = 0

    def __call__(self, prompts, return_tensors=None):
        class R:
            input_ids = [[min(b, 255) + 1 for b in p.encode()] for p in (
                prompts if isinstance(prompts, list) else [prompts]
            )]

        return R()

    def decode(self, ids):
        return "".join(chr(max(int(i) - 1, 32) % 128) for i in np.asarray(ids).ravel())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--tokenizer", default=None)
    parser.add_argument("--prompt", default="The quick brown fox")
    parser.add_argument("--max-new-tokens", type=int, default=32)
    parser.add_argument("--block-size", type=int, default=64)
    parser.add_argument("--greedy", action="store_true")
    parser.add_argument("--fused", action="store_true",
                        help="decode the whole window in one fused XLA executable")
    parser.add_argument("--perf", action="store_true", help="run the PerfMojoGenerator sweep")
    parser.add_argument("--tiny", action="store_true", help="small random model (no checkpoint)")
    parser.add_argument("--quant", default=None, choices=(None, "w8a8"),
                        help="post-training int8 weight+activation serving mode")
    parser.add_argument("--quant-kv", action="store_true",
                        help="int8 (C8) KV cache with prefill-calibrated channel scales")
    parser.add_argument("--speculative", type=int, default=0, metavar="K",
                        help="greedy speculative decoding with K drafts/round "
                             "(draft = the w8a8 twin of the model; lossless)")
    args = parser.parse_args()

    from mojo_opset_tpu.runtime import (
        GreedySampler,
        MojoGenerator,
        PagedAttentionGenerationModel,
        PerfMojoGenerator,
        TopKSampler,
    )

    model = build_model(args)
    gen_model = PagedAttentionGenerationModel(model, block_size=args.block_size)

    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    else:
        tokenizer = _FallbackTokenizer()

    sampler = GreedySampler() if args.greedy else TopKSampler(top_k=50)

    if args.perf:
        gen = PerfMojoGenerator(gen_model, tokenizer, sampler,
                                max_new_tokens=args.max_new_tokens)
        gen(prefill_seqlens=(512, 1024, 2048), decode_batch_sizes=(1, 2, 4, 8),
            fused=args.fused)
        return

    if args.speculative:
        from mojo_opset_tpu.modeling.qwen3 import quantize_qwen3
        from mojo_opset_tpu.runtime import SpeculativeDecoder

        enc = tokenizer(args.prompt)
        raw = enc["input_ids"] if isinstance(enc, dict) else enc.input_ids
        ids = np.asarray(raw, np.int32).reshape(-1)
        spec = SpeculativeDecoder(
            model, quantize_qwen3(model), k=args.speculative,
            mode="greedy", block_size=args.block_size,
        )
        out = spec.generate(ids, np.array([ids.size], np.int32),
                            max_new_tokens=args.max_new_tokens)
        print("-" * 40)
        print(f"generated ids ({spec.last_rounds} verify rounds):", out)
        if hasattr(tokenizer, "decode"):
            print("decoded:", tokenizer.decode(out[0]))
        return

    gen = MojoGenerator(gen_model, tokenizer, sampler,
                        max_new_tokens=args.max_new_tokens)
    out = gen(args.prompt, fused_decode=args.fused)
    print("-" * 40)
    print("generated ids:", out)
    if hasattr(tokenizer, "decode"):
        print("decoded:", tokenizer.decode(out[0]))


if __name__ == "__main__":
    main()
