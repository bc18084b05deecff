"""Perf descriptors: fused linear + cross-entropy loss.

Reference rows: tests/perf/benchmark.md (TTXFusedLinearCrossEntropy) and
tests/perf_new/functions/loss_function.py.
"""

import numpy as np
import jax.numpy as jnp

from mojo_opset_tpu.benchmark.api import mojo_perf, perf_case, tensor, PerfWorkload
import mojo_opset_tpu as m


FLCE_CASES = [
    perf_case("t4096_h4096_v32000", tags=("smoke",), T=4096, H=4096, V=32000),
    perf_case("t8192_h4096_v152064", tags=("full",), T=8192, H=4096, V=152064),
]


@mojo_perf("FusedLinearCrossEntropyLoss", m.MojoFusedLinearCrossEntropyLoss, FLCE_CASES)
def flce_workload(case):
    p = case.params
    T, H, V = p["T"], p["H"], p["V"]

    def labels(spec):
        return jnp.asarray(np.random.default_rng(0).integers(0, V, (T,)), jnp.int32)

    return PerfWorkload(
        inputs={
            "lin_weight": tensor((V, H), jnp.bfloat16),
            "input_tensor": tensor((T, H), jnp.bfloat16),
            "target": tensor((T,), jnp.int32, creator=labels),
        },
        args=("lin_weight", "input_tensor", "target"),
        flops=2 * T * H * V,
    )
