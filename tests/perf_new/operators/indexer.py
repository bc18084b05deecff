"""Perf descriptors: DeepSeek-V3.2 lightning indexer.

Reference: tests/perf_new/operators/indexer.py.
"""

import jax.numpy as jnp

from mojo_opset_tpu.benchmark.api import mojo_perf, perf_case, tensor, PerfWorkload
from mojo_opset_tpu.experimental.operators.indexer import MojoLightningIndexer


INDEXER_CASES = [
    perf_case("b4_m1024_n4096_h16_k64", tags=("smoke",), B=4, M=1024, N=4096, H=16, K=64),
    perf_case("b1_m4096_n16384_h16_k64", tags=("full",), B=1, M=4096, N=16384, H=16, K=64),
]


@mojo_perf("LightningIndexer", MojoLightningIndexer, INDEXER_CASES)
def lightning_indexer_workload(case):
    p = case.params
    B, M, N, H, K = p["B"], p["M"], p["N"], p["H"], p["K"]
    return PerfWorkload(
        inputs={
            "query": tensor((B, M, H, K), jnp.bfloat16),
            "query_scale": tensor((B, M, H), jnp.float32),
            "key": tensor((B, N, K), jnp.bfloat16),
        },
        args=("query", "query_scale", "key"),
        flops=2 * B * M * N * H * K,
    )
