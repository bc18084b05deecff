"""Perf descriptors: dense GEMM / grouped GEMM / embedding.

Reference: tests/perf_new/operators/linear.py + benchmark.md TTXGroupGemm
rows (input (20480,4096) bf16/fp16, 8 groups — 2.35/2.38 ms on 910B).
"""

import jax
import jax.numpy as jnp

from mojo_opset_tpu.benchmark.api import mojo_perf, perf_case, tensor, PerfWorkload
import mojo_opset_tpu as m


GEMM_CASES = [
    perf_case("m4096_k4096_n4096_bf16", tags=("smoke",), M=4096, K=4096, N=4096),
    perf_case("m8192_k8192_n8192_bf16", tags=("full",), M=8192, K=8192, N=8192),
]


@mojo_perf("Gemm", m.MojoGemm, GEMM_CASES)
def gemm_workload(case):
    p = case.params
    M, K, N = p["M"], p["K"], p["N"]
    return PerfWorkload(
        inputs={
            "input": tensor((M, K), jnp.bfloat16),
            "weight": tensor((N, K), jnp.bfloat16),
        },
        op_kwargs={"in_features": K, "out_features": N, "bias": False},
        state={"weight": "weight"},
        args=("input",),
        flops=2 * M * K * N,
    )


GROUP_GEMM_CASES = [
    perf_case("in20480x4096_g8_bf16", tags=("smoke", "refrow"), M=20480, K=4096, N=4096, G=8),
    perf_case("in8192x4096_g16_bf16", tags=("full",), M=8192, K=4096, N=4096, G=16),
]


@mojo_perf("GroupGemm", m.MojoGroupGemm, GROUP_GEMM_CASES)
def group_gemm_workload(case):
    p = case.params
    M, K, N, G = p["M"], p["K"], p["N"], p["G"]

    def weight(spec):
        return jax.random.normal(jax.random.PRNGKey(0), (G, K, N)).astype(jnp.bfloat16)

    def group_list(spec):
        base = M // G
        return jnp.asarray([base] * (G - 1) + [M - base * (G - 1)], jnp.int32)

    return PerfWorkload(
        inputs={
            "input": tensor((M, K), jnp.bfloat16),
            "weight": tensor((G, K, N), jnp.bfloat16, creator=weight),
            "group_list": tensor((G,), jnp.int32, creator=group_list),
        },
        op_kwargs={"weight": jnp.zeros((G, K, N), jnp.bfloat16)},
        state={"weight": "weight"},
        args=("input", "group_list"),
        flops=2 * M * K * N,
    )


EMB_CASES = [
    perf_case("t8192_v152k_d4096", tags=("smoke",), T=8192, V=152064, D=4096),
]


@mojo_perf("Embedding", m.MojoEmbedding, EMB_CASES)
def embedding_workload(case):
    p = case.params
    T, V, D = p["T"], p["V"], p["D"]

    def ids(spec):
        import numpy as np

        return jnp.asarray(np.random.default_rng(0).integers(0, V, (T,)), jnp.int32)

    return PerfWorkload(
        inputs={
            "input_ids": tensor((T,), jnp.int32, creator=ids),
            "weight": tensor((V, D), jnp.bfloat16),
        },
        op_kwargs={"num_embeddings": V, "embedding_dim": D, "dtype": jnp.bfloat16},
        state={"weight": "weight"},
        args=("input_ids",),
        read_bytes=T * D * 2,
        write_bytes=T * D * 2,
    )
