"""Diagnose why int8 w8a8 decode is slower than bf16 at Qwen3-4B geometry.

Round-2 measured qwen3_int8_decode 406.7 tok/s vs bf16 462.3 on one v5e
chip, despite ~half the weight HBM traffic (docs/serving.md traffic
math).  This tool times each projection shape of one decode step (M=8)
under every available lowering so the regressing tier is identified on
hardware rather than guessed:

  - bf16 dot (the baseline the decode step uses today)
  - int8 dot_general int32-accum (MojoQuantGemm core forward)
  - Pallas fused-dequant kernel (PallasQuantGemm dispatch at this M)
  - int8->bf16 dequant-then-dot (the anti-pattern: 3 bytes/param)
  - the fused RMSNormQuant epilogue cost at M=8

Usage: python tools/diagnose_int8_decode.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from mojo_opset_tpu.benchmark.timing import device_time_us

# Qwen3-4B decode projection shapes at batch 8 (36 layers each):
#   qkv: 2560 -> 4096+1024+1024 ; o: 4096 -> 2560 ; mlp: 2560 <-> 9728 x3
SHAPES = [
    ("q_proj", 8, 2560, 4096),
    ("kv_proj", 8, 2560, 1024),
    ("o_proj", 8, 4096, 2560),
    ("gate/up", 8, 2560, 9728),
    ("down", 8, 9728, 2560),
    ("lm_head", 8, 2560, 151936),
]


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    for name, M, K, N in SHAPES:
        x_bf = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        w_bf = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        x_i8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        w_i8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        w_i8_t = jnp.asarray(np.asarray(w_i8).T)  # (N, K) stored layout
        xs = jnp.asarray(rng.uniform(0.5, 2.0, (M,)), jnp.float32)
        ws = jnp.asarray(rng.uniform(0.5, 2.0, (N,)), jnp.float32)

        def bf16_dot(x, w):
            return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def int8_dot(x, w, xs, ws):
            o = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            return (o * xs[:, None] * ws[None, :]).astype(jnp.bfloat16)

        def int8_dot_t(x, w_t, xs, ws):
            o = jax.lax.dot_general(
                x, w_t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            return (o * xs[:, None] * ws[None, :]).astype(jnp.bfloat16)

        def dequant_then_dot(x, w, ws):
            wf = w.astype(jnp.bfloat16) * ws[None, :].astype(jnp.bfloat16)
            return jnp.dot(x, wf, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        rows = [
            ("bf16", bf16_dot, (x_bf, w_bf)),
            ("i8_dot(K,N)", int8_dot, (x_i8, w_i8, xs, ws)),
            ("i8_dot(N,K)T", int8_dot_t, (x_i8, w_i8_t, xs, ws)),
            ("dequant+dot", dequant_then_dot, (x_bf, w_i8, ws)),
        ]
        try:
            from mojo_opset_tpu.backends.pallas.kernels.int8_matmul import int8_scaled_matmul

            def pallas_i8(x, w_t, xs, ws):
                return int8_scaled_matmul(x, w_t, xs, ws, bm=8, bn=512, bk=1024,
                                          trans_weight=True)

            if K % 1024 == 0 and N % 512 == 0:
                rows.append(("pallas_i8", pallas_i8, (x_i8, w_i8_t, xs, ws)))
        except Exception as e:  # noqa: BLE001
            print("pallas unavailable:", e)

        out = [f"{name:9s} M={M} K={K} N={N}"]
        for label, fn, fargs in rows:
            try:
                us = device_time_us(fn, *fargs)
                # weight bytes / time -> effective GB/s (decode is w-bound)
                nbytes = fargs[1].size * fargs[1].dtype.itemsize
                out.append(f"{label}={us:8.2f}us ({nbytes / us / 1e3:6.1f} GB/s)")
            except Exception as e:  # noqa: BLE001
                out.append(f"{label}=ERR {type(e).__name__}: {str(e)[:80]}")
        print(" | ".join(out), flush=True)


if __name__ == "__main__":
    main()
