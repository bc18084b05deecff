"""Sweep int8 scaled-matmul tile sizes on the real chip (VERDICT r1 item 2:
QuantGemm 326 -> >=335 int8 TFLOP/s at 4096^3, i.e. >=85% of the v5e int8
MXU roofline; XLA dot_general control measured 326 = 83%).

Usage: python tools/tune_quant_gemm.py [--M 4096] [--K 4096] [--N 4096]
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

from mojo_opset_tpu.backends.pallas.kernels.int8_matmul import int8_scaled_matmul
from mojo_opset_tpu.benchmark import device_time_us

V5E_INT8_TOPS = 394.0


def xla_control(x, w, xs, ws):
    out = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    return (out * xs[:, None] * ws[None, :]).astype(jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=4096)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--bm", default="256,512,1024")
    ap.add_argument("--bn", default="256,512,1024")
    ap.add_argument("--bk", default="512,1024,2048,4096")
    ap.add_argument("--layouts", default="KN,NK")
    args = ap.parse_args()

    M, K, N = args.M, args.K, args.N
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K), np.int8))
    w = jnp.asarray(rng.integers(-127, 128, (K, N), np.int8))
    wt = w.T.copy()  # (N, K)
    xs = jnp.asarray(rng.uniform(0.01, 0.1, (M,)).astype(np.float32))
    ws = jnp.asarray(rng.uniform(0.5, 2.0, (N,)).astype(np.float32))

    # correctness spot-check vs the XLA control (small slice)
    want = xla_control(x[:512], w[:, :512], xs[:512], ws[:512])
    got = int8_scaled_matmul(x[:512], w[:, :512], xs[:512], ws[:512],
                             bm=256, bn=256, bk=512)
    gf, wf = got.astype(jnp.float32), want.astype(jnp.float32)
    rerr = float((jnp.abs(gf - wf) / jnp.maximum(jnp.abs(wf), 1.0)).max())
    print(f"pallas-vs-xla max rel err: {rerr:.5f}")
    # both sides round a large-magnitude f32 product to bf16; scale-mul
    # association differs, so allow ~1 bf16 ULP of relative difference
    assert rerr < 2e-2, rerr

    flops = 2 * M * K * N
    us = device_time_us(xla_control, x, w, xs, ws, iters=16)
    tf = flops / (us * 1e-6) / 1e12
    print(f"XLA control: {us/1e3:8.3f} ms  {tf:6.1f} TFLOP/s  "
          f"{100*tf/V5E_INT8_TOPS:5.1f}%")

    best = None
    for layout, bm, bn, bk in itertools.product(
        args.layouts.split(","),
        [int(v) for v in args.bm.split(",")],
        [int(v) for v in args.bn.split(",")],
        [int(v) for v in args.bk.split(",")],
    ):
        if bk > K or bn > N or bm > M:
            continue
        # VMEM (double-buffered in/out blocks + int32 acc)
        vmem_mb = (2 * (bm * bk + bk * bn) + 2 * 2 * bm * bn + 4 * bm * bn) / 2**20
        if vmem_mb > 14:
            continue
        trans = layout == "NK"
        try:
            us = device_time_us(
                lambda x_, w_, xs_, ws_: int8_scaled_matmul(
                    x_, w_, xs_, ws_, bm=bm, bn=bn, bk=bk, trans_weight=trans
                ),
                x, wt if trans else w, xs, ws, iters=16,
            )
        except Exception as e:
            print(f"{layout} bm={bm:5d} bn={bn:5d} bk={bk:5d}  FAIL "
                  f"{type(e).__name__}: {str(e)[:70]}")
            continue
        tf = flops / (us * 1e-6) / 1e12
        pct = 100 * tf / V5E_INT8_TOPS
        print(f"{layout} bm={bm:5d} bn={bn:5d} bk={bk:5d}  {us/1e3:8.3f} ms  "
              f"{tf:6.1f} TFLOP/s  {pct:5.1f}%  (vmem~{vmem_mb:.1f}MB)")
        if best is None or tf > best[1]:
            best = ((layout, bm, bn, bk), tf)
    if best:
        (layout, bm, bn, bk), tf = best
        print(f"BEST {layout} bm={bm} bn={bn} bk={bk} -> {tf:.1f} TFLOP/s "
              f"({100*tf/V5E_INT8_TOPS:.1f}%)")


if __name__ == "__main__":
    main()
