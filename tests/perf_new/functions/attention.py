"""Perf descriptors: training SWA attention function (fwd+bwd).

Reference: tests/perf_new/functions/attention.py.
"""

import numpy as np
import jax.numpy as jnp

from mojo_opset_tpu.benchmark.api import mojo_perf, perf_case, tensor, PerfWorkload
from mojo_opset_tpu.core.functions import MojoSWAFunction


SWA_FN_CASES = [
    perf_case("t2048_w512_bf16", tags=("smoke",), T=2048, B=2, Hq=16, Hkv=4, D=128, W=512),
]


@mojo_perf("SWAFunction", MojoSWAFunction, SWA_FN_CASES)
def swa_function_workload(case):
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
        run=lambda op, q, k, v, cu1, cu2: op.value_and_grad(
            q, k, v, cu1, cu2, argnums=(0, 1, 2)
        ),
        flops=8 * T * min(W, per) * Hq * D,
    )
