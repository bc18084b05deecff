"""Sweep paged-decode kernel knobs on the real chip (VERDICT r1 item 2:
622 -> >=700 GB/s at ctx4096, i.e. >=85% of v5e HBM roofline).

Usage: python tools/tune_paged_decode.py [--ctx 4096] [--bs 32]
"""

from __future__ import annotations

import argparse
import itertools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mojo_opset_tpu.backends.pallas.kernels.paged_decode import paged_decode_gqa
from mojo_opset_tpu.benchmark import device_time_us

V5E_HBM_GBPS = 819.0


def run(ctx: int, block_size: int, B: int, Hq: int, Hkv: int, D: int,
        pages_per_fetch: int, kv_layout: str) -> tuple[float, float]:
    blocks_per_seq = ctx // block_size
    n_blocks = B * blocks_per_seq
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, Hq, D), jnp.bfloat16)
    shape = (
        (n_blocks, Hkv, block_size, D) if kv_layout == "HND"
        else (n_blocks, block_size, Hkv, D)
    )
    kc = jax.random.normal(k2, shape, jnp.bfloat16)
    vc = jax.random.normal(k3, shape, jnp.bfloat16)
    seq_lens = jnp.full((B,), ctx, jnp.int32)
    bt = jnp.arange(n_blocks, dtype=jnp.int32).reshape(B, blocks_per_seq)

    us = device_time_us(
        lambda *a: paged_decode_gqa(
            *a, pages_per_fetch=pages_per_fetch, kv_layout=kv_layout
        ),
        q, kc, vc, seq_lens, bt, iters=32,
    )
    bytes_moved = 2 * n_blocks * Hkv * block_size * D * 2  # K+V, bf16
    gbps = bytes_moved / (us * 1e-6) / 1e9
    return us, gbps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=4096)
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--Hq", type=int, default=16)
    ap.add_argument("--Hkv", type=int, default=4)
    ap.add_argument("--D", type=int, default=128)
    ap.add_argument("--layouts", default="HND,NHD")
    ap.add_argument("--block-sizes", default="32,64,128")
    ap.add_argument("--ppf", default="4,8,16,32,64")
    args = ap.parse_args()

    best = {}
    for layout, bs, ppf in itertools.product(
        args.layouts.split(","),
        [int(x) for x in args.block_sizes.split(",")],
        [int(x) for x in args.ppf.split(",")],
    ):
        if ppf > args.ctx // bs:
            continue
        # VMEM slab: 2 buf * 2 (K,V) * Hkv*ppf*bs*D*2B — keep under ~8 MB
        slab_mb = 2 * 2 * args.Hkv * ppf * bs * args.D * 2 / 2**20
        if slab_mb > 10:
            continue
        try:
            us, gbps = run(args.ctx, bs, args.B, args.Hq, args.Hkv, args.D, ppf, layout)
        except Exception as e:
            print(f"{layout} bs={bs:4d} ppf={ppf:3d}  FAIL {type(e).__name__}: {str(e)[:80]}")
            continue
        pct = 100 * gbps / V5E_HBM_GBPS
        print(f"{layout} bs={bs:4d} ppf={ppf:3d}  {us:8.1f} us  {gbps:6.1f} GB/s  {pct:5.1f}%")
        if layout not in best or gbps > best[layout][1]:
            best[layout] = (f"bs={bs} ppf={ppf}", gbps)
    for layout, (cfg, gbps) in best.items():
        print(f"BEST {layout}: {cfg} -> {gbps:.1f} GB/s ({100*gbps/V5E_HBM_GBPS:.1f}%)")


if __name__ == "__main__":
    main()
