"""On-chip TopPFilter primitives: what does each aggregation step cost?"""

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


def timed(name, fn, *args):
    jf = jax.jit(fn)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(),
                           jax.tree_util.tree_leaves(jf(*args)))
    t = device_time_us(jf, *args)
    print(f"  {name:34s} {t:10.1f} us", flush=True)
    return t


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    B, V, k = 120, 151936, 1000
    x = jnp.asarray(rng.standard_normal((B, V)), jnp.float32)

    for r in (0.95, 0.9, 0.85):
        vals, _ = jax.lax.approx_max_k(x, k, recall_target=r,
                                       aggregate_to_topk=False)
        print(f"recall {r}: L={vals.shape[-1]}")

    vals, idx = jax.lax.approx_max_k(x, k, recall_target=0.95,
                                     aggregate_to_topk=False)
    L = vals.shape[-1]
    small = jnp.asarray(rng.standard_normal((B, 1024)), jnp.float32)

    print(f"primitives on candidates (B={B}, L={L}):", flush=True)
    timed("agg=True full vocab r=.95", lambda x: jax.lax.approx_max_k(
        x, k, recall_target=0.95, aggregate_to_topk=True), x)
    timed("agg=True full vocab r=.85", lambda x: jax.lax.approx_max_k(
        x, k, recall_target=0.85, aggregate_to_topk=True), x)
    timed("jnp.sort cands", jnp.sort, vals)
    timed("sort_key_val cands", lambda v, i: jax.lax.sort_key_val(v, i),
          vals, idx.astype(jnp.int32))
    timed("top_k cands", lambda v: jax.lax.top_k(v, k), vals)
    timed("approx agg=True on cands", lambda v: jax.lax.approx_max_k(
        v, k, recall_target=0.95, aggregate_to_topk=True), vals)
    timed("packed u32 sort cands", lambda v, i: jnp.sort(
        ((jax.lax.bitcast_convert_type(v, jnp.uint32) ^ jnp.uint32(0x80000000))
         .astype(jnp.uint32) & jnp.uint32(0xFFFFC000))
        | i.astype(jnp.uint32), axis=-1), vals, idx.astype(jnp.int32))
    timed("jnp.sort (B,1024)", jnp.sort, small)
    timed("sort_key_val (B,1024)", lambda v: jax.lax.sort_key_val(
        v, jnp.broadcast_to(jnp.arange(1024, dtype=jnp.int32), v.shape)), small)
    timed("top_k full vocab exact", lambda x: jax.lax.top_k(x, k), x)

    B2, V2, k2 = 15, 155136, 100
    x2 = jnp.asarray(rng.standard_normal((B2, V2)), jnp.float32)
    print(f"small row (B={B2}, V={V2}, k={k2}):", flush=True)
    timed("agg=True r=.95", lambda x: jax.lax.approx_max_k(
        x, k2, recall_target=0.95, aggregate_to_topk=True), x2)
    v2, i2 = jax.lax.approx_max_k(x2, k2, recall_target=0.95,
                                  aggregate_to_topk=False)
    print(f"  (L={v2.shape[-1]})")
    timed("sort_key_val cands", lambda v, i: jax.lax.sort_key_val(v, i),
          v2, i2.astype(jnp.int32))


if __name__ == "__main__":
    main()
