"""On-chip experiment: TopPFilter at the published (15/120, 151936) rows.

The k=1000 row measures 4.4 ms via approx_max_k(aggregate_to_topk=True)
vs the reference's 881 µs — probe where the time goes and whether a
two-stage (approx candidates -> exact small top_k) or lower recall wins.
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


def variants(k):
    def agg_true(x):
        return jax.lax.approx_max_k(x, k, recall_target=0.95, aggregate_to_topk=True)

    def agg_false(x):
        return jax.lax.approx_max_k(x, k, recall_target=0.95, aggregate_to_topk=False)

    def two_stage(x):
        vals, idx = jax.lax.approx_max_k(x, k, recall_target=0.95,
                                         aggregate_to_topk=False)
        tv, ti = jax.lax.top_k(vals, k)
        return tv, jnp.take_along_axis(idx, ti, axis=-1)

    def two_stage_r85(x):
        vals, idx = jax.lax.approx_max_k(x, k, recall_target=0.85,
                                         aggregate_to_topk=False)
        tv, ti = jax.lax.top_k(vals, k)
        return tv, jnp.take_along_axis(idx, ti, axis=-1)

    def full(x):
        tv, ti = two_stage(x)
        return _nucleus_from_topk(tv, 0.7, 1, -float("inf")), ti

    return [("approx agg=True", agg_true), ("approx agg=False", agg_false),
            ("two-stage exact", two_stage), ("two-stage r=0.85", two_stage_r85),
            ("two-stage + nucleus", full)]


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    for B, V, k in ((120, 151936, 1000), (15, 155136, 100)):
        x = jnp.asarray(rng.standard_normal((B, V)), jnp.float32)
        print(f"logits ({B},{V}) k={k}:", flush=True)
        for name, fn in variants(k):
            us = device_time_us(fn, x)
            print(f"  {name:24s} {us:9.1f} us", flush=True)


if __name__ == "__main__":
    main()
