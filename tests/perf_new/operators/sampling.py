"""Perf descriptors: sampling + SWA attention.

Reference rows: tests/perf/benchmark.md (TTXTopKSampling, TTXTopPSampling,
TTXSWA) and tests/perf_new/operators/{sample,attention}.py.
"""

import numpy as np
import jax.numpy as jnp

from mojo_opset_tpu.benchmark.api import mojo_perf, perf_case, tensor, PerfWorkload
import mojo_opset_tpu as m


SAMPLE_CASES = [
    perf_case("b8_v32000", tags=("smoke",), B=8, V=32000),
    perf_case("b64_v152064", tags=("full",), B=64, V=152064),
]


@mojo_perf("TopKSampling", m.MojoTopKSampling, SAMPLE_CASES)
def topk_workload(case):
    p = case.params
    return PerfWorkload(
        inputs={"logits": tensor((p["B"], p["V"]), jnp.float32)},
        op_kwargs={"top_k": 50},
        args=("logits",),
        read_bytes=p["B"] * p["V"] * 4,
    )


@mojo_perf("TopPSampling", m.MojoTopPSampling, SAMPLE_CASES)
def topp_workload(case):
    p = case.params
    return PerfWorkload(
        inputs={"logits": tensor((p["B"], p["V"]), jnp.float32)},
        op_kwargs={"top_p": 0.9},
        args=("logits",),
        read_bytes=p["B"] * p["V"] * 4,
    )


@mojo_perf("ApplyPenaltiesTempurate", m.MojoApplyPenaltiesTempurate, SAMPLE_CASES)
def penalties_workload(case):
    p = case.params
    B, V = p["B"], p["V"]

    def out_ids(spec):
        return jnp.asarray(np.random.default_rng(1).integers(0, V, (B, 64)), jnp.int32)

    def scalar_vec(val):
        def build(spec):
            return jnp.full((B,), val, jnp.float32)

        return build

    return PerfWorkload(
        inputs={
            "logits": tensor((B, V), jnp.float32),
            "output_ids": tensor((B, 64), jnp.int32, creator=out_ids),
            "repetition_penalties": tensor((B,), jnp.float32, creator=scalar_vec(1.1)),
            "presence_penalties": tensor((B,), jnp.float32, creator=scalar_vec(0.1)),
            "frequency_penalties": tensor((B,), jnp.float32, creator=scalar_vec(0.1)),
            "temperatures": tensor((B,), jnp.float32, creator=scalar_vec(0.7)),
        },
        args=("logits", "output_ids", "repetition_penalties", "presence_penalties",
              "frequency_penalties", "temperatures"),
        read_bytes=B * V * 4,
        write_bytes=B * V * 4,
    )


SWA_CASES = [
    perf_case("t2048_w512_bf16", tags=("smoke",), T=2048, B=2, Hq=16, Hkv=4, D=128, W=512),
    perf_case("t8192_w1024_bf16", tags=("full",), T=8192, B=2, Hq=16, Hkv=4, D=128, W=1024),
]


@mojo_perf("SWA", m.MojoSWA, SWA_CASES)
def swa_workload(case):
    p = case.params
    T, B, Hq, Hkv, D, W = p["T"], p["B"], p["Hq"], p["Hkv"], p["D"], p["W"]
    per = T // B

    def cu(spec):
        lens = [per] * (B - 1) + [T - per * (B - 1)]
        return jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)

    return PerfWorkload(
        inputs={
            "query": tensor((T, Hq, D), jnp.bfloat16),
            "key": tensor((T, Hkv, D), jnp.bfloat16),
            "value": tensor((T, Hkv, D), jnp.bfloat16),
            "cu_q_lens": tensor((B + 1,), jnp.int32, creator=cu),
            "cu_total_seq_lens": tensor((B + 1,), jnp.int32, creator=cu),
        },
        op_kwargs={"local_window_size": W},
        args=("query", "key", "value", "cu_q_lens", "cu_total_seq_lens"),
        flops=4 * T * min(W, per) * Hq * D,
    )
