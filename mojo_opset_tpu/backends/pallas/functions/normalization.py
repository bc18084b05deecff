"""Pallas-tier training function: RMSNorm with hand-written fwd+bwd.

Replaces autodiff-of-golden for the training hot path, mirroring the
reference's TTX rmsnorm function pair (backends/ttx/functions/,
kernels/npu/a2/rmsnorm.py).  Unsupported geometries fall back to the
golden (whose backward is derived by JAX autodiff).
"""

from __future__ import annotations

import jax

from mojo_opset_tpu.backends.pallas.kernels.rmsnorm_vjp import rmsnorm_vjp
from mojo_opset_tpu.core.functions.normalization import MojoRMSNormFunction
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


class PallasRMSNormFunction(MojoRMSNormFunction):
    # Not the default tier: on-chip (r5) XLA autodiff-of-golden measures
    # 357 µs vs 870 µs for this pair at T=16384 D=2560 bf16 (0.41x) — XLA
    # fuses the norm fwd+bwd into two streaming passes natively.
    # Reachable via MOJO_BACKEND=pallas.
    dispatch_default = False

    def forward(self, x: jax.Array, weight: jax.Array) -> jax.Array:
        D = x.shape[-1]
        # lane-aligned rows only; anything else runs the golden
        if D % 128 != 0 or x.size // D < 1:
            return super().forward(x, weight)
        return rmsnorm_vjp(x, weight, self.eps, pallas_interpret_mode())
