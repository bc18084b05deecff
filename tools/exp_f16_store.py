"""On-chip experiment: which f16 paged-store variant stays in-place?

All published StorePagedKVCache rows are float16 (reference
tests/perf/benchmark.md 14:36-14:38 block); TPU has no native f16, and
both the raw path and the bf16-bitcast shim measured 10-40x over the
bf16 twin in the r3 sweep.  Times every candidate at a decode row and a
prefill row to pick the final design.
"""

from __future__ import annotations

import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m
from mojo_opset_tpu.benchmark.timing import device_time_us
from mojo_opset_tpu.core.operators.kv_cache import build_paged_kv_token_indices


def make_case(B, H, S, D, bs, rows, width, dtype):
    rng = np.random.default_rng(0)
    k_new = jnp.asarray(rng.standard_normal((B * S, H, D)), dtype)
    v_new = jnp.asarray(rng.standard_normal((B * S, H, D)), dtype)
    k_cache = jnp.asarray(rng.standard_normal((rows, H, bs, D)), dtype)
    v_cache = jnp.asarray(rng.standard_normal((rows, H, bs, D)), dtype)
    total = width * bs - (bs + 1) // 2
    ctx = max(total - S, 0)
    tables = np.full((B, width), -1, np.int32)
    cur = 0
    import math

    for i in range(B):
        n = math.ceil((ctx + S) / bs)
        tables[i, :n] = np.arange(cur, cur + n, dtype=np.int32)
        cur += n
    cu_q = jnp.asarray(np.arange(B + 1) * S, jnp.int32)
    ctx_lens = jnp.asarray([ctx] * B, jnp.int32)
    return k_new, v_new, k_cache, v_cache, jnp.asarray(tables), cu_q, ctx_lens


def flat_scatter(kn, vn, kc, vc, tables, cu_q, ctx_lens):
    """HND store as ONE leading-dims scatter on the (N, H*bs, D) view."""
    N, H, bs, D = kc.shape
    T = kn.shape[0]
    dst_block, dst_offset = build_paged_kv_token_indices(
        tables, cu_q if T != tables.shape[0] else None, ctx_lens, bs, T)
    rows = jnp.arange(H, dtype=jnp.int32)[None, :] * bs + dst_offset[:, None]
    blocks = jnp.broadcast_to(dst_block[:, None], (T, H))
    out = []
    for cache, new in ((kc, kn), (vc, vn)):
        c3 = cache.reshape(N, H * bs, D)
        c3 = c3.at[blocks.reshape(-1), rows.reshape(-1), :].set(
            new.reshape(T * H, D), mode="drop", unique_indices=True)
        out.append(c3.reshape(N, H, bs, D))
    return out[0], out[1]


def run_variant(name, fn, args):
    us = device_time_us(fn, *args, thread_idx=((2, 0), (3, 1)))
    print(f"  {name:34s} {us:10.1f} us", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    decode = ("decode B=1 (1000,4,16,64)", (1, 4, 1, 64, 16, 1000, 12))
    prefill = ("prefill B=16 S=35 (1000,16,32,128)", (16, 16, 35, 128, 32, 1000, 12))
    for label, (B, H, S, D, bs, rows, width) in (decode, prefill):
        for dtype in (jnp.bfloat16, jnp.float16):
            print(f"{label} {dtype.__name__}:", flush=True)
            kn, vn, kc, vc, tb, cu, cl = make_case(B, H, S, D, bs, rows, width, dtype)
            op = m.MojoStorePagedKVCache()
            cu_arg = None if S == 1 else cu
            run_variant("dispatch (with shim)",
                        lambda kn, vn, kc, vc: op(kn, vn, kc, vc, tb, cu_arg, cl),
                        (kn, vn, kc, vc))
            raw = type(op).forward
            while hasattr(raw, "__wrapped__"):
                raw = raw.__wrapped__
            run_variant("raw tier forward (no shim)",
                        lambda kn, vn, kc, vc: raw(op, kn, vn, kc, vc, tb, cu_arg, cl),
                        (kn, vn, kc, vc))
            run_variant("flat leading-dims scatter",
                        lambda kn, vn, kc, vc: flat_scatter(kn, vn, kc, vc, tb, cu, cl),
                        (kn, vn, kc, vc))

            def bitcast_flat(kn, vn, kc, vc):
                bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.bfloat16)  # noqa: E731
                k2, v2 = flat_scatter(bc(kn), bc(vn), bc(kc), bc(vc), tb, cu, cl)
                back = lambda a: jax.lax.bitcast_convert_type(a, jnp.float16)  # noqa: E731
                return back(k2), back(v2)

            if dtype == jnp.float16:
                run_variant("bitcast + flat scatter", bitcast_flat, (kn, vn, kc, vc))


if __name__ == "__main__":
    main()
