"""Perf descriptors: GEMM / quant / MoE / KV-store / RoPE / sampling."""

import numpy as np
import jax.numpy as jnp

from mojo_opset_tpu.benchmark.api import mojo_perf, perf_case, tensor, PerfWorkload
import mojo_opset_tpu as m


GROUP_GEMM_CASES = [
    perf_case("in20480x4096_g8_bf16", tags=("smoke",), M=20480, K=4096, N=4096, G=8),
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

    import jax

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


QUANT_GEMM_CASES = [
    perf_case("m4096_k4096_n4096", tags=("smoke",), M=4096, K=4096, N=4096),
    perf_case("m8192_k8192_n8192", tags=("full",), M=8192, K=8192, N=8192),
]


@mojo_perf("QuantGemm", m.MojoQuantGemm, QUANT_GEMM_CASES)
def quant_gemm_workload(case):
    p = case.params
    M, K, N = p["M"], p["K"], p["N"]
    return PerfWorkload(
        inputs={
            "input": tensor((M, K), jnp.int8),
            "input_scale": tensor((M,), jnp.float32),
            "weight": tensor((K, N), jnp.int8),
        },
        op_kwargs={"in_features": K, "out_features": N},
        state={"weight": "weight"},
        args=("input", "input_scale"),
        flops=2 * M * K * N,
    )


STORE_KV_CASES = [
    perf_case("decode_b16", tags=("smoke",), T=16, Hkv=8, D=128, bs=64, NB=32, decode=True),
    perf_case("prefill_t4096", tags=("smoke", "full"), T=4096, Hkv=8, D=128, bs=64, NB=64, decode=False),
    perf_case("decode_b16_nhd", tags=("smoke",), T=16, Hkv=8, D=128, bs=64, NB=32, decode=True, layout="NHD"),
    perf_case("prefill_t4096_nhd", tags=("smoke", "full"), T=4096, Hkv=8, D=128, bs=64, NB=64, decode=False, layout="NHD"),
]


@mojo_perf("StorePagedKVCache", m.MojoStorePagedKVCache, STORE_KV_CASES)
def store_kv_workload(case):
    import jax

    p = case.params
    T, Hkv, D, bs, NB = p["T"], p["Hkv"], p["D"], p["bs"], p["NB"]
    B = T if p["decode"] else 1
    N = max(B, 1) * NB

    def bt(spec):
        return jnp.arange(N, dtype=jnp.int32).reshape(B, -1)[:, :NB]

    def ctx(spec):
        return jnp.zeros((B,), jnp.int32) if not p["decode"] else jnp.full((B,), bs, jnp.int32)

    def cu(spec):
        return jnp.asarray([0, T], jnp.int32)

    layout = p.get("layout", "HND")
    cache_shape = (N, bs, Hkv, D) if layout == "NHD" else (N, Hkv, bs, D)
    inputs = {
        "key_states": tensor((T, Hkv, D), jnp.bfloat16),
        "value_states": tensor((T, Hkv, D), jnp.bfloat16),
        "key_cache": tensor(cache_shape, jnp.bfloat16),
        "value_cache": tensor(cache_shape, jnp.bfloat16),
        "block_table": tensor((B, NB), jnp.int32, creator=bt),
        "context_kv_lens": tensor((B,), jnp.int32, creator=ctx),
    }
    kwargs = {}
    if not p["decode"]:
        inputs["cu_q_lens"] = tensor((2,), jnp.int32, creator=cu)
        args = ("key_states", "value_states", "key_cache", "value_cache",
                "block_table", "cu_q_lens", "context_kv_lens")
    else:
        args = ("key_states", "value_states", "key_cache", "value_cache",
                "block_table", None, "context_kv_lens")
        args = tuple(a for a in args if a is not None)
        kwargs = {"cu_q_lens": None}
        # decode path: cu_q_lens=None keyword
        args = ("key_states", "value_states", "key_cache", "value_cache", "block_table")
        kwargs = {"context_kv_lens": "context_kv_lens"}
    return PerfWorkload(
        inputs=inputs,
        op_kwargs={"kv_layout": layout},
        args=args,
        kwargs=kwargs,
        write_bytes=2 * T * Hkv * D * 2,
        # thread the updated caches back into the chain: in-place scatter
        # semantics (donated buffers), not a full cache copy per call
        thread={"key_cache": 0, "value_cache": 1},
    )


ROPE_CASES = [
    perf_case("t1024_h32_d128", tags=("smoke",), T=1024, H=32, D=128),
    perf_case("t8192_h32_d128", tags=("full",), T=8192, H=32, D=128),
]


@mojo_perf("ApplyRoPE", m.MojoApplyRoPE, ROPE_CASES)
def rope_workload(case):
    p = case.params
    T, H, D = p["T"], p["H"], p["D"]
    return PerfWorkload(
        inputs={
            "q": tensor((T, H, D), jnp.bfloat16),
            "k": tensor((T, H, D), jnp.bfloat16),
            "cos": tensor((T, D), jnp.float32),
            "sin": tensor((T, D), jnp.float32),
        },
        kwargs={"head_first": False},
        read_bytes=2 * T * H * D * 2,
        write_bytes=2 * T * H * D * 2,
    )


MOE_CASES = [
    perf_case("t4096_e64_k4_h2048_i768", tags=("smoke",), T=4096, E=64, K=4, H=2048, I=768),
]


@mojo_perf("MoE", m.MojoMoE, MOE_CASES)
def moe_workload(case):
    p = case.params
    return PerfWorkload(
        inputs={"hidden": tensor((p["T"], p["H"]), jnp.bfloat16)},
        op_kwargs={
            "num_experts": p["E"], "top_k": p["K"], "hidden_size": p["H"],
            "intermediate_size": p["I"], "dtype": jnp.bfloat16,
        },
        args=("hidden",),
        flops=2 * 3 * p["T"] * p["K"] * p["H"] * p["I"],
    )


DYNQ_CASES = [perf_case("t8192_d4096", tags=("smoke",), T=8192, D=4096)]


@mojo_perf("DynamicQuant", m.MojoDynamicQuant, DYNQ_CASES)
def dynamic_quant_workload(case):
    p = case.params
    return PerfWorkload(
        inputs={"input": tensor((p["T"], p["D"]), jnp.bfloat16)},
        args=("input",),
        read_bytes=p["T"] * p["D"] * 2,
        write_bytes=p["T"] * p["D"],
    )
