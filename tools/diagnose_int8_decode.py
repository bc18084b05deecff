"""Diagnose why int8 w8a8+C8 decode is slower than bf16 at Qwen3-4B geometry.

Round-2 measured qwen3_int8_decode 406.7 tok/s vs bf16 462.3 on one v5e
chip despite ~half the weight HBM traffic.  This times the ACTUAL ops the
decode layer dispatches (default tier on TPU = Pallas), per component:

  1. every projection shape: MojoGemm bf16 vs MojoQuantGemm (pallas tier,
     the real dispatch) vs MojoQuantGemm ref tier (XLA int8 dot)
  2. paged decode attention: bf16 MojoPagedDecodeGQA vs int8-KV
     MojoPagedDecodeGQAWithKVDequant
  3. the per-layer quant epilogues at M=8: MojoRMSNormQuant,
     MojoDynamicQuant, and the int8 paged store

Usage: python tools/diagnose_int8_decode.py [--skip-gemm] [--skip-attn]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m
from mojo_opset_tpu.benchmark.timing import device_time_us

SHAPES = [
    ("qkv_proj", 8, 2560, 6144),
    ("o_proj", 8, 4096, 2560),
    ("gate/up", 8, 2560, 9728),
    ("down", 8, 9728, 2560),
    ("lm_head", 8, 2560, 151936),
]


def bench_gemms():
    rng = np.random.default_rng(0)
    for name, M, K, N in SHAPES:
        x_bf = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        x_i8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        xs = jnp.asarray(rng.uniform(0.5, 2.0, (M,)), jnp.float32)
        w_i8 = jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
        ws = jnp.asarray(rng.uniform(0.5, 2.0, (N,)), jnp.bfloat16)
        w_bf = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)

        gemm = m.MojoGemm(K, N, bias=False).replace(weight=w_bf)
        qg_pallas = m.MojoQuantGemm.get_backend_impl("pallas", strict=True)(
            K, N, trans_weight=True).replace(weight=w_i8, weight_scale=ws)
        qg_ref = m.MojoQuantGemm.get_backend_impl("ref")(
            K, N, trans_weight=True).replace(weight=w_i8, weight_scale=ws)
        from mojo_opset_tpu.core.operators.gemm import pack_int4_rows
        w_i4 = jnp.asarray(rng.integers(-8, 8, (N, K)), jnp.int8)
        qg_i4 = m.MojoQuantGemm.get_backend_impl("pallas", strict=True)(
            K, N, trans_weight=True, weight_dtype="int4").replace(
            weight=pack_int4_rows(w_i4), weight_scale=ws)

        out = [f"{name:9s} M={M} K={K} N={N}"]
        for label, fn, fargs, wbytes in (
            ("bf16_gemm", lambda x: gemm(x), (x_bf,), N * K * 2),
            ("quant_pallas", lambda x, s: qg_pallas(x, s), (x_i8, xs), N * K),
            ("quant_ref", lambda x, s: qg_ref(x, s), (x_i8, xs), N * K),
            ("quant_int4", lambda x, s: qg_i4(x, s), (x_i8, xs), N * K // 2),
        ):
            try:
                us = device_time_us(fn, *fargs)
                out.append(f"{label}={us:8.2f}us ({wbytes / us / 1e3:6.1f} GB/s)")
            except Exception as e:  # noqa: BLE001
                out.append(f"{label}=ERR {type(e).__name__}: {str(e)[:60]}")
        print(" | ".join(out), flush=True)


def bench_attention():
    """Qwen3-4B decode attention: B=8, 32q/8kv heads, D=128, ctx 1024."""
    from mojo_opset_tpu.experimental.operators import MojoPagedDecodeGQAWithKVDequant

    rng = np.random.default_rng(1)
    B, Hq, Hkv, D, bs = 8, 32, 8, 128, 128
    ctx = 1024
    blocks_per_seq = ctx // bs
    rows = B * blocks_per_seq + 2
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    seq_lens = jnp.full((B,), ctx, jnp.int32)
    tables = jnp.asarray(
        np.arange(B * blocks_per_seq, dtype=np.int32).reshape(B, blocks_per_seq))

    kc = jnp.asarray(rng.standard_normal((rows, Hkv, bs, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((rows, Hkv, bs, D)), jnp.bfloat16)
    op = m.MojoPagedDecodeGQA()
    us = device_time_us(lambda q: op(q, kc, vc, seq_lens, tables), q)
    kv_bytes = 2 * B * ctx * Hkv * D * 2
    print(f"attn bf16  ctx={ctx}: {us:8.2f}us ({kv_bytes / us / 1e3:6.1f} GB/s)", flush=True)

    kc8 = jnp.asarray(rng.integers(-127, 128, (rows, Hkv, bs, D)), jnp.int8)
    vc8 = jnp.asarray(rng.integers(-127, 128, (rows, Hkv, bs, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (Hkv, D)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (Hkv, D)), jnp.float32)
    op8 = MojoPagedDecodeGQAWithKVDequant(query_dtype=jnp.bfloat16,
                                          compute_dtype=jnp.bfloat16)
    us8 = device_time_us(
        lambda q: op8(q, None, kc8, ks, vc8, vs, seq_lens, tables), q)
    print(f"attn c8    ctx={ctx}: {us8:8.2f}us ({kv_bytes / 2 / us8 / 1e3:6.1f} GB/s)",
          flush=True)


def bench_epilogues():
    rng = np.random.default_rng(2)
    H = 2560
    x = jnp.asarray(rng.standard_normal((8, H)), jnp.bfloat16)
    nq = m.MojoRMSNormQuant(H)
    us = device_time_us(lambda x: nq(x), x)
    print(f"rmsnorm_quant M=8 H={H}: {us:8.2f}us", flush=True)
    n = m.MojoRMSNorm(H)
    us = device_time_us(lambda x: n(x), x)
    print(f"rmsnorm       M=8 H={H}: {us:8.2f}us", flush=True)
    dq = m.MojoDynamicQuant()
    us = device_time_us(lambda x: dq(x), x)
    print(f"dynamic_quant M=8 H={H}: {us:8.2f}us", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-gemm", action="store_true")
    ap.add_argument("--skip-attn", action="store_true")
    ap.add_argument("--skip-epi", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    if not args.skip_epi:
        bench_epilogues()
    if not args.skip_attn:
        bench_attention()
    if not args.skip_gemm:
        bench_gemms()


if __name__ == "__main__":
    main()
