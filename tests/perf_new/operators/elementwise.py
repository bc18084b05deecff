"""Perf descriptors: activations, dense GEMM, embedding.

Reference rows: tests/perf/benchmark.md (TTXGelu (128,128) fp32, TTXSilu,
TTXSwiGLU, TTXGemm) and tests/perf_new/operators/{activation,gemm}.py.
"""

import jax.numpy as jnp

from mojo_opset_tpu.benchmark.api import mojo_perf, perf_case, tensor, PerfWorkload
import mojo_opset_tpu as m


ACT_CASES = [
    perf_case("x128x128_fp32", tags=("smoke",), T=128, D=128, dtype="float32"),
    perf_case("x4096x4096_bf16", tags=("smoke", "full"), T=4096, D=4096, dtype="bfloat16"),
    perf_case("x8192x8192_bf16", tags=("full",), T=8192, D=8192, dtype="bfloat16"),
]


def _act_workload(case):
    T, D = case.params["T"], case.params["D"]
    dt = jnp.dtype(case.params["dtype"])
    return PerfWorkload(
        inputs={"x": tensor((T, D), dt)},
        args=("x",),
        read_bytes=T * D * dt.itemsize,
        write_bytes=T * D * dt.itemsize,
    )


mojo_perf("Gelu", m.MojoGelu, ACT_CASES)(_act_workload)
mojo_perf("Silu", m.MojoSilu, ACT_CASES)(_act_workload)


@mojo_perf("SwiGLU", m.MojoSwiGLU, ACT_CASES)
def swiglu_workload(case):
    T, D = case.params["T"], case.params["D"]
    dt = jnp.dtype(case.params["dtype"])
    return PerfWorkload(
        inputs={"gate_out": tensor((T, D), dt), "up_out": tensor((T, D), dt)},
        args=("gate_out", "up_out"),
        read_bytes=2 * T * D * dt.itemsize,
        write_bytes=T * D * dt.itemsize,
    )


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
