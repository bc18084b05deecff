"""Wan2.2 DiT end-to-end denoising perf protocol.

The diffusion-side counterpart of ``PerfMojoGenerator`` (the LLM e2e
protocol, reference runtime/generation.py:324-373): the reference's DiT
e2e path is ``examples/dit_inference.py`` (reference
examples/dit_inference.py), which has no built-in timing.  This protocol
jits one denoise step (DiT forward + Euler update), sweeps a set of
latent geometries, and reports per-step latency plus model FLOPs
utilisation, so the DiT family gets a metric-of-record row alongside the
LLM decode/prefill rows.
"""

from __future__ import annotations

import math
import time
from typing import Iterable, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.benchmark.timing import device_sync
from mojo_opset_tpu.utils.logging import get_logger, log_table

logger = get_logger(__name__)


def dit_step_flops(cfg, seq_len: int, text_len: int) -> float:
    """FLOPs of one DiT forward at ``seq_len`` latent tokens.

    Counts the matmuls of each transformer block (self-attention
    projections + scores, cross-attention against ``text_len`` context
    tokens, two-matmul FFN); patch embed / head / modulation are O(L*d)
    and ignored.  1 MAC = 2 FLOPs.
    """
    d, f, n = cfg.dim, cfg.ffn_dim, cfg.num_layers
    L, T = seq_len, text_len
    self_attn = 4 * L * d * d + 2 * L * L * d
    cross_attn = (2 * L + 2 * T) * d * d + 2 * L * T * d
    ffn = 2 * L * d * f
    return 2.0 * n * (self_attn + cross_attn + ffn)


class PerfDiTRunner:
    """Time the jitted DiT denoise step across latent geometries.

    ``sizes`` are latent ``(F, H, W)`` tuples (post-VAE, pre-patchify).
    Records one row per geometry: latent shape, token count, ms/step and
    TFLOP/s through the backbone.
    """

    # latent geometries: (frames, H, W) after VAE 8x spatial downsample.
    # 32x32 ~ 256px image; (5, 60, 104) ~ 17-frame 480x832 clip.
    SIZES: Tuple[Tuple[int, int, int], ...] = ((1, 32, 32), (1, 60, 104), (5, 60, 104))

    def __init__(self, model, text_tokens: int = 64, seed: int = 0):
        self.model = model
        self.text_tokens = min(text_tokens, model.cfg.text_len)
        self.seed = seed

    def _case_inputs(self, size: Tuple[int, int, int]):
        cfg = self.model.cfg
        F, H, W = size
        pt, ph, pw = cfg.patch_size
        assert F % pt == 0 and H % ph == 0 and W % pw == 0, (
            f"latent {size} not divisible by patch_size {cfg.patch_size}"
        )
        seq_len = (F // pt) * (H // ph) * (W // pw)
        key = jax.random.PRNGKey(self.seed)
        kx, kc = jax.random.split(key)
        x = jax.random.normal(kx, (cfg.in_dim, F, H, W), jnp.float32)
        ctx = jax.random.normal(kc, (self.text_tokens, cfg.text_dim), jnp.float32)
        return x, ctx, seq_len

    def run(self, sizes: Iterable[Tuple[int, int, int]] | None = None,
            steps: int = 4) -> List[dict]:
        records: List[dict] = []
        from mojo_opset_tpu.benchmark.timing import device_time_us

        for size in (sizes or self.SIZES):
            x, ctx, seq_len = self._case_inputs(size)
            dt = jnp.float32(-1.0 / max(steps, 1))

            def denoise_step(x, model, t):
                velocity = model([x], t, [ctx], seq_len=seq_len)[0]
                return x + velocity.astype(x.dtype) * dt

            # DEVICE time via the same elision-proof chained timer as every
            # other published number (timing.py; the chain feeds x back so
            # consecutive denoise steps are data-dependent, like a real
            # sampler loop).  The old wall-clock-over-dispatched-calls
            # protocol double-counted the tunnel's per-call host overhead
            # (~30 ms of ParseArguments on the ~1000-leaf param pytree per
            # dispatch) which pipelined serving never pays.
            t = jnp.ones((1,), jnp.float32) * 999.0
            us = device_time_us(denoise_step, x, self.model, t, iters=max(steps, 2))

            ms = us / 1e3
            flops = dit_step_flops(self.model.cfg, seq_len, self.text_tokens)
            records.append({
                "latent": tuple(size),
                "tokens": seq_len,
                "denoise_ms": ms,
                "tflops": flops / (ms * 1e-3) / 1e12,
            })

        log_table(logger, "=" * 68)
        log_table(logger, f"{'DiT Denoise Step Latency':^68}")
        log_table(logger, f"{'Latent (F,H,W)':<16} | {'Tokens':<8} | "
                          f"{'ms/step':<10} | {'TFLOP/s':<10}")
        for r in records:
            log_table(logger, f"{str(r['latent']):<16} | {r['tokens']:<8} | "
                              f"{r['denoise_ms']:<10.2f} | {r['tflops']:<10.1f}")
        return records


def run_dit_perf(dim: int = 2048, layers: int = 32, sizes=None, steps: int = 4,
                 seed: int = 0, dtype=jnp.bfloat16) -> List[dict]:
    """Build a randomly-initialised Wan DiT at the given width and run the
    protocol (checkpoint weights do not change the timing).

    ``dtype`` casts the backbone parameters (serving runs the DiT in
    bf16 — halves the weight/activation stream and doubles the MXU
    rate; latents stay f32 at the boundary)."""
    from mojo_opset_tpu.modeling.wan2_2 import WanConfig, WanModel

    cfg = WanConfig(
        patch_size=(1, 2, 2), text_len=512, in_dim=16, dim=dim,
        ffn_dim=dim * 4, freq_dim=256, text_dim=4096, out_dim=16,
        num_heads=max(dim // 128, 1), num_layers=layers,
    )
    model = WanModel(cfg, key=jax.random.PRNGKey(seed))
    if dtype is not None and dtype != jnp.float32:
        model = jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            model,
        )
    return PerfDiTRunner(model).run(sizes=sizes, steps=steps)


if __name__ == "__main__":  # pragma: no cover - chip-side entry point
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=2048)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--sizes", default=None,
                   help="semicolon list of F,H,W triples, e.g. '1,32,32;5,60,104'")
    args = p.parse_args()
    sizes = None
    if args.sizes:
        sizes = [tuple(int(v) for v in s.split(",")) for s in args.sizes.split(";")]
    import json

    recs = run_dit_perf(args.dim, args.layers, sizes=sizes, steps=args.steps)
    print(json.dumps(recs, default=str))
