"""Wan2.2 DiT denoising-loop example.

Parity: reference examples/dit_inference.py — text-to-video sampling with
the Wan DiT backbone (+ optional T5 context and VAE decode).  Without
checkpoints this runs random weights end-to-end to demonstrate the flow.

Usage::

    python examples/dit_inference.py [--steps 10] [--frames 5] [--size 64]
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
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--frames", type=int, default=2)
    parser.add_argument("--size", type=int, default=64, help="latent H=W")
    parser.add_argument("--dim", type=int, default=512)
    parser.add_argument("--layers", type=int, default=8)
    parser.add_argument("--decode-vae", action="store_true")
    parser.add_argument("--ckpt-dir", default=None,
                        help="Wan2.2 DiT checkpoint dir (sharded safetensors)")
    args = parser.parse_args()

    from mojo_opset_tpu.modeling.wan2_2 import WanConfig, WanModel

    cfg = WanConfig(
        patch_size=(1, 2, 2), text_len=64, in_dim=16, dim=args.dim,
        ffn_dim=args.dim * 4, freq_dim=256, text_dim=512, out_dim=16,
        num_heads=args.dim // 64, num_layers=args.layers,
    )
    if args.ckpt_dir:
        from mojo_opset_tpu.utils.hf import load_sharded_safetensors
        from mojo_opset_tpu.utils.patching import apply_mojo_to_wan2_2

        model = apply_mojo_to_wan2_2(
            load_sharded_safetensors(args.ckpt_dir), key=jax.random.PRNGKey(0)
        )
    else:
        model = WanModel(cfg, key=jax.random.PRNGKey(0))

    F, H, W = args.frames, args.size // 8, args.size // 8
    seq_len = F * (H // 2) * (W // 2)
    key = jax.random.PRNGKey(42)
    latents = jax.random.normal(key, (16, F, H, W))
    context = [jax.random.normal(jax.random.PRNGKey(1), (32, 512))]

    # simple Euler sigma schedule (demonstration sampler)
    sigmas = jnp.linspace(1.0, 0.0, args.steps + 1)

    x = latents
    t0 = time.perf_counter()
    for i in range(args.steps):
        t = jnp.array([float(1000 * sigmas[i])])
        velocity = model([x], t, context, seq_len=seq_len)[0]
        dt = sigmas[i + 1] - sigmas[i]
        x = x + velocity * dt
        jax.block_until_ready(x)
        print(f"step {i + 1}/{args.steps} sigma={float(sigmas[i]):.3f} "
              f"({(time.perf_counter() - t0):.2f}s elapsed)")

    print("denoised latent:", x.shape, "mean", float(jnp.mean(x)), "std", float(jnp.std(x)))

    if args.decode_vae:
        from mojo_opset_tpu.modeling.wan2_2 import WanVAE_

        vae = WanVAE_(dim=32, dec_dim=32, z_dim=16, dim_mult=(2, 2), num_res_blocks=1,
                      temperal_downsample=(True,), key=jax.random.PRNGKey(2))
        video = vae.decode(x[None])
        print("decoded video:", video.shape)


if __name__ == "__main__":
    main()
