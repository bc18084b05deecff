"""Floor ablation for the µs-scale paged-KV store rows (VERDICT r4 #3).

The 4 losing rows below 0.5× are all B=1, 32-new-token stores into a
(1000, 4, bs, 64) f16 cache — 32 KB written, reference 910B ~3.2 µs,
ours ~7.8 µs.  This ablation measures, with the sweep's EXACT protocol
(loop-carried donated caches, elision-proof chained timer), what the
cheapest possible jitted programs with the same I/O contract cost:

  passthrough   — return the carried caches untouched (pure loop-marginal
                  floor: the cost of *any* op at this signature)
  one-row dus   — a single dynamic_update_slice row write (minimal real store)
  k-only store  — the shipped scatter on one of the two caches
  shipped store — MojoStorePagedKVCache (what the benchmark row measures)

If passthrough ≈ shipped, the rows are pinned to the XLA loop-marginal
dispatch floor on this part and no kernel formulation can close them —
the same argument used for the RoPE DMA bound (docs/kernels.md).
"""

from __future__ import annotations

import math
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


def build_case(bs: int, S: int = 32, B: int = 1, H: int = 4, D: int = 64,
               width: int = 12, rows: int = 1000, dt=jnp.float16):
    rng = np.random.default_rng(0)

    def randn(shape):
        return jnp.asarray(rng.standard_normal(shape), dt)

    k_new, v_new = randn((B * S, H, D)), randn((B * S, H, D))
    k_cache, v_cache = randn((rows, H, bs, D)), randn((rows, H, bs, D))
    total = width * bs - (bs + 1) // 2
    ctx = max(total - S, 0)
    tables = np.full((B, width), -1, np.int32)
    cur = 0
    for i in range(B):
        n = math.ceil((ctx + S) / bs)
        tables[i, :n] = np.arange(cur, cur + n, dtype=np.int32)
        cur += n
    cu_q = jnp.asarray(np.arange(B + 1) * S, jnp.int32)
    ctx_lens = jnp.asarray([ctx] * B, jnp.int32)
    return k_new, v_new, k_cache, v_cache, jnp.asarray(tables), cu_q, ctx_lens


def main():
    print(f"platform={jax.devices()[0].platform}")
    op = m.MojoStorePagedKVCache()
    for bs in (16, 32):
        k_new, v_new, k_cache, v_cache, tables, cu_q, ctx_lens = build_case(bs)
        thread = ((2, 0), (3, 1))
        print(f"-- cache (1000, 4, {bs}, 64) f16, B=1, 32 new tokens --")

        def passthrough(kn, vn, kc, vc):
            return kc, vc

        def one_row_dus(kn, vn, kc, vc):
            blk = jnp.swapaxes(kn[:bs], 0, 1)[None]  # (1, H, bs, D)
            return jax.lax.dynamic_update_slice(kc, blk, (0, 0, 0, 0)), vc

        def k_only(kn, vn, kc, vc):
            out = op(kn, vn, kc, vc, tables, cu_q, ctx_lens)
            return out[0], vc

        def shipped(kn, vn, kc, vc):
            return op(kn, vn, kc, vc, tables, cu_q, ctx_lens)

        for name, fn in (("passthrough (loop-marginal floor)", passthrough),
                         ("one-row dynamic_update_slice", one_row_dus),
                         ("shipped store, k-cache only", k_only),
                         ("shipped StorePagedKVCache", shipped)):
            us = device_time_us(fn, k_new, v_new, k_cache, v_cache, thread_idx=thread)
            print(f"  {name:<36} {us:8.2f} us")


if __name__ == "__main__":
    main()
