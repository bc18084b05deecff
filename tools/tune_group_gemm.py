"""Sweep grouped-matmul tile sizes on the real chip (VERDICT r1 item 4:
141 -> >=165 TFLOP/s at the reference headline shape, i.e. >=85% of the
v5e bf16 MXU roofline).

Usage: python tools/tune_group_gemm.py [--M 20480] [--K 4096] [--N 4096]
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

from mojo_opset_tpu.backends.pallas.kernels.group_gemm import grouped_matmul
from mojo_opset_tpu.benchmark import device_time_us

V5E_BF16_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=20480)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--G", type=int, default=8)
    ap.add_argument("--bm", default="256,512,1024")
    ap.add_argument("--bn", default="256,512,1024")
    ap.add_argument("--bk", default="512,1024,2048,4096")
    ap.add_argument("--layouts", default="KN,NK")
    args = ap.parse_args()

    M, K, N, G = args.M, args.K, args.N, args.G
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (M, K), jnp.bfloat16)
    w = jax.random.normal(k2, (G, K, N), jnp.bfloat16) * 0.02
    # uneven groups like real MoE routing
    import numpy as np

    rng = np.random.default_rng(0)
    raw = rng.dirichlet(np.ones(G)) * M
    sizes = (raw // 8 * 8).astype(np.int32)
    sizes[-1] = M - sizes[:-1].sum()
    group_sizes = jnp.asarray(sizes)

    wt = jnp.swapaxes(w, 1, 2)  # (G, N, K) for the trans_weight path
    # correctness spot-check of the trans path vs the KN path (tiny tiles)
    o_kn = grouped_matmul(x[:2048], w, jnp.asarray([2048 // G] * G, jnp.int32), bm=256, bn=256, bk=512)
    o_nk = grouped_matmul(x[:2048], wt, jnp.asarray([2048 // G] * G, jnp.int32), bm=256, bn=256, bk=512, trans_weight=True)
    derr = float(jnp.abs(o_kn.astype(jnp.float32) - o_nk.astype(jnp.float32)).max())
    print(f"trans-vs-KN max err: {derr:.5f}")
    assert derr < 1.0

    flops = 2 * M * K * N
    best = None
    for layout, bm, bn, bk in itertools.product(
        args.layouts.split(","),
        [int(v) for v in args.bm.split(",")],
        [int(v) for v in args.bn.split(",")],
        [int(v) for v in args.bk.split(",")],
    ):
        if bk > K or bn > N:
            continue
        # VMEM: xbuf bm*K*2 + wbuf 2*bk*bn*2 + obuf bm*bn*2 + acc bm*bn*4
        vmem_mb = (bm * K * 2 + 2 * bk * bn * 2 + bm * bn * 6) / 2**20
        if vmem_mb > 14:
            continue
        trans = layout == "NK"
        try:
            us = device_time_us(
                lambda x, w_, gs: grouped_matmul(
                    x, w_, gs, bm=bm, bn=bn, bk=bk, trans_weight=trans
                ),
                x, wt if trans else w, group_sizes, iters=16,
            )
        except Exception as e:
            print(f"{layout} bm={bm:5d} bn={bn:5d} bk={bk:5d}  FAIL {type(e).__name__}: {str(e)[:70]}")
            continue
        tf = flops / (us * 1e-6) / 1e12
        pct = 100 * tf / V5E_BF16_TFLOPS
        print(f"{layout} bm={bm:5d} bn={bn:5d} bk={bk:5d}  {us/1e3:8.3f} ms  {tf:6.1f} TFLOP/s  {pct:5.1f}%  (vmem~{vmem_mb:.1f}MB)")
        if best is None or tf > best[1]:
            best = ((layout, bm, bn, bk), tf)
    if best:
        (layout, bm, bn, bk), tf = best
        print(f"BEST {layout} bm={bm} bn={bn} bk={bk} -> {tf:.1f} TFLOP/s ({100*tf/V5E_BF16_TFLOPS:.1f}%)")


if __name__ == "__main__":
    main()
