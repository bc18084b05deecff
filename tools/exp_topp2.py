"""On-chip experiment 2 for TopPFilter: threshold + compact + small-sort.

Pipeline under test (vs the 4.3 ms aggregate_to_topk path):
  1. approx_max_k(k, aggregate_to_topk=False) -> (B, L) candidates
  2. exact k-th-largest threshold per row via monotone-uint32 bisection
  3. compact survivors into K slots (cumsum scatter, vocab order)
  4. variadic sort of the (B, K) survivors only
  5. nucleus mask + renormalize
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.benchmark.timing import device_time_us
from mojo_opset_tpu.core.operators.sampling import _nucleus_from_topk


def f32_to_mono_u32(x):
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = (b >> 31).astype(jnp.bool_)
    return jnp.where(sign, ~b, b | jnp.uint32(0x80000000))


def mono_u32_to_f32(u):
    sign = ~(u >> 31).astype(jnp.bool_)
    b = jnp.where(sign, ~u, u & jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def kth_threshold(vals, k, steps=32):
    """Exact k-th largest (as a threshold) via bisection on monotone bits."""
    u = f32_to_mono_u32(vals)
    lo = jnp.zeros((vals.shape[0],), jnp.uint32)
    hi = jnp.full((vals.shape[0],), 0xFFFFFFFF, jnp.uint32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum((u > mid[:, None]).astype(jnp.int32), axis=-1)
        # too many above mid -> raise threshold
        lo2 = jnp.where(cnt >= k, mid + 1, lo)
        hi2 = jnp.where(cnt >= k, hi, mid)
        return lo2, hi2

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    # hi = smallest u such that count(> u) < k  => threshold: keep > hi-1 i.e. >= hi
    return mono_u32_to_f32(hi)


def compact_topk(vals, idx, thr, K):
    """Scatter candidates >= thr (per row) into K slots, vocab order."""
    B, L = vals.shape
    keep = vals >= thr[:, None]
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=-1) - 1
    pos = jnp.where(keep & (pos < K), pos, K)
    out_v = jnp.full((B, K + 1), -jnp.inf, jnp.float32).at[
        jnp.arange(B)[:, None], pos].set(vals, mode="drop")[:, :K]
    out_i = jnp.zeros((B, K + 1), jnp.int32).at[
        jnp.arange(B)[:, None], pos].set(idx.astype(jnp.int32), mode="drop")[:, :K]
    return out_v, out_i


def full_pipeline(x, k, top_p=0.7, recall=0.95, steps=32):
    vals, idx = jax.lax.approx_max_k(x, k, recall_target=recall,
                                     aggregate_to_topk=False)
    thr = kth_threshold(vals, k, steps)
    cv, ci = compact_topk(vals, idx, thr, k)
    sv, si = jax.lax.sort_key_val(-cv, ci.astype(jnp.int32))
    sv = -sv
    probs = _nucleus_from_topk(sv, top_p, 1, -jnp.inf)
    return probs, si


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    for B, V, k in ((120, 151936, 1000), (15, 155136, 100)):
        x = jnp.asarray(rng.standard_normal((B, V)), jnp.float32)
        vals, idx = jax.lax.approx_max_k(x, k, recall_target=0.95,
                                         aggregate_to_topk=False)
        print(f"(B={B},V={V},k={k}) candidate L={vals.shape[-1]}")
        cases = [
            ("rowmax pass floor", lambda x: jnp.max(x, axis=-1)),
            ("stage1 agg=False", lambda x: jax.lax.approx_max_k(
                x, k, recall_target=0.95, aggregate_to_topk=False)),
            ("stage1 r=0.85", lambda x: jax.lax.approx_max_k(
                x, k, recall_target=0.85, aggregate_to_topk=False)),
            ("full pipeline", lambda x: full_pipeline(x, k)),
            ("pipeline r=0.85", lambda x: full_pipeline(x, k, recall=0.85)),
            ("pipeline steps=24", lambda x: full_pipeline(x, k, steps=24)),
        ]
        for name, fn in cases:
            jf = jax.jit(fn)
            jax.tree_util.tree_map(
                lambda a: a.block_until_ready(), jax.tree_util.tree_leaves(jf(x)))
            t = device_time_us(jf, x)
            print(f"  {name:24s} {t:9.1f} us", flush=True)
        # pieces on the candidate array
        thr = kth_threshold(vals, k)
        piece = [
            ("kth bisect 32", lambda v: kth_threshold(v, k)),
            ("compact", lambda v: compact_topk(v, idx, thr, k)),
            ("small sort (B,k)", lambda v: jax.lax.sort_key_val(
                -v[:, :k], jnp.arange(k, dtype=jnp.int32)[None].repeat(v.shape[0], 0))),
        ]
        for name, fn in piece:
            jf = jax.jit(fn)
            out = jf(vals)
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
            t = device_time_us(jf, vals)
            print(f"  {name:24s} {t:9.1f} us", flush=True)
        # correctness vs exact golden
        pv, pi = jax.jit(lambda x: full_pipeline(x, k))(x)
        tv, ti = jax.lax.top_k(x, k)
        probs_ref = _nucleus_from_topk(tv, 0.7, 1, -jnp.inf)
        same = np.mean(np.asarray(pi) == np.asarray(ti))
        err = np.max(np.abs(np.asarray(pv) - np.asarray(probs_ref)))
        print(f"  vs exact golden: index match {same:.4f}, max prob err {err:.3e}")


if __name__ == "__main__":
    main()
