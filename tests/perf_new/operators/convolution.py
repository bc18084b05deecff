"""Perf descriptors: causal convolution (Mamba-style state update).

Reference: tests/perf_new/operators/convolution.py.
"""

import jax.numpy as jnp

from mojo_opset_tpu.benchmark.api import mojo_perf, perf_case, tensor, PerfWorkload
import mojo_opset_tpu as m


CONV_UPDATE_CASES = [
    perf_case("decode_b64_d4096_w4", tags=("smoke",), B=64, D=4096, T=1, W=4),
    perf_case("chunk_b8_d4096_t64_w4", tags=("smoke", "full"), B=8, D=4096, T=64, W=4),
]


@mojo_perf("CausalConv1dUpdateState", m.MojoCausalConv1dUpdateState, CONV_UPDATE_CASES)
def conv_update_workload(case):
    p = case.params
    B, D, T, W = p["B"], p["D"], p["T"], p["W"]
    return PerfWorkload(
        inputs={
            "hidden_states": tensor((B, D, T), jnp.bfloat16),
            "conv_state": tensor((B, D, W - 1), jnp.bfloat16),
            "weight": tensor((D, W), jnp.bfloat16),
        },
        args=("hidden_states", "conv_state", "weight"),
        kwargs={"activation": "silu"},
        read_bytes=B * D * (T + W - 1) * 2,
        write_bytes=B * D * (T + W - 1) * 2,
        thread={"conv_state": 1},
    )
