"""Qwen3 HF-checkpoint patching example.

Parity: reference examples/qwen3_patch.py — there, transformers'
modeling_qwen3 is monkey-patched with Mojo ops before instantiation; here
the analogous flow builds the Mojo-op JAX model directly from the HF
checkpoint (utils/patching.apply_mojo_to_qwen3) and, when torch +
transformers are available, verifies logits parity against the unpatched
HF model on the prompt.

Usage::

    python examples/qwen3_patch.py --model-path DIR [--prompt TEXT]
        [--max-new-tokens N] [--verify] [--tiny-selftest]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Run an HF Qwen3 checkpoint on Mojo TPU ops")
    p.add_argument("--model-path", type=str, default=None,
                   help="Local HF Qwen3 checkpoint directory")
    p.add_argument("--prompt", type=str, default="请用中文简要介绍 Qwen3 的主要能力。")
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-k", type=int, default=50)
    p.add_argument("--do-sample", action="store_true")
    p.add_argument("--verify", action="store_true",
                   help="compare last-token logits vs torch transformers")
    p.add_argument("--tiny-selftest", action="store_true",
                   help="save a tiny random HF checkpoint to /tmp and run on it")
    return p.parse_args()


def make_tiny_checkpoint() -> str:
    import tempfile

    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, head_dim=16,
        vocab_size=128, max_position_embeddings=128, tie_word_embeddings=False,
    )
    path = tempfile.mkdtemp(prefix="qwen3_tiny_")
    transformers.Qwen3ForCausalLM(cfg).save_pretrained(path, safe_serialization=True)
    return path


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from mojo_opset_tpu.runtime import (
        GreedySampler,
        MojoGenerator,
        PagedAttentionGenerationModel,
        TopKSampler,
    )
    from mojo_opset_tpu.utils.patching import apply_mojo_to_qwen3

    path = args.model_path or (make_tiny_checkpoint() if args.tiny_selftest else None)
    if path is None:
        raise SystemExit("pass --model-path DIR or --tiny-selftest")

    model = apply_mojo_to_qwen3(path, key=jax.random.PRNGKey(0))
    gm = PagedAttentionGenerationModel(model, block_size=16)

    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(path, local_files_only=True)
        ids = np.asarray(tokenizer(args.prompt).input_ids, np.int32)
    except Exception:
        class _Tok:
            eos_token_id = 0

            def decode(self, ids):
                return " ".join(map(str, np.asarray(ids).ravel().tolist()))

        tokenizer = _Tok()
        ids = (np.frombuffer(args.prompt.encode(), np.uint8).astype(np.int32) %
               (model.config.model_config.vocab_size - 1)) + 1

    sampler = (
        TopKSampler(args.top_k, temperature=args.temperature)
        if args.do_sample else GreedySampler()
    )
    gen = MojoGenerator(gm, tokenizer, sampler, max_new_tokens=args.max_new_tokens)
    out = gen.generate_from_ids(ids, np.array([len(ids)], np.int32),
                                ignore_eos=False, silent=True)
    print(tokenizer.decode(out[0]))

    if args.verify:
        import torch
        import transformers

        hf = transformers.AutoModelForCausalLM.from_pretrained(
            path, local_files_only=True, torch_dtype=torch.float32
        ).eval()
        with torch.no_grad():
            want = hf(input_ids=torch.tensor(ids[None], dtype=torch.long)).logits[0, -1]
        got, _ = gm(ids, context_input_len=np.array([len(ids)], np.int32))
        err = float(np.max(np.abs(np.asarray(got[0], np.float32) - want.float().numpy())))
        print(f"logits parity vs transformers: max abs err = {err:.2e}")
        assert err < 5e-2, "parity check failed"


if __name__ == "__main__":
    main()
