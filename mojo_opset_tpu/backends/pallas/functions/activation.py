"""Pallas-tier training function: SiLU fwd+bwd kernel pair.

Sixth and last of the reference's accelerated training-function
families (reference backends/ttx/functions/activation.py
TTXSiluFunction).  Lane-unaligned shapes fall back to the golden.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.silu_vjp import silu_vjp
from mojo_opset_tpu.core.functions.activation import MojoSiluFunction
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


class PallasSiluFunction(MojoSiluFunction):
    # Not the default tier: on-chip (r5, tools/bench_training_functions.py)
    # XLA's fused autodiff of the golden runs the fwd+bwd chain in a single
    # fused elementwise pass (363 µs at T=32768 D=4096 bf16) while this
    # kernel pair pays separate fwd/bwd HBM passes (4046 µs, 0.09x).
    # Elementwise fusion is XLA's home turf; the pair stays reachable via
    # MOJO_BACKEND=pallas for parity testing.
    dispatch_default = False

    def forward(self, x: jax.Array) -> jax.Array:
        if (
            x.ndim < 2
            or x.shape[-1] % 128 != 0
            or (x.size // x.shape[-1]) % 8 != 0
            or not jnp.issubdtype(x.dtype, jnp.floating)
        ):
            return super().forward(x)
        return silu_vjp(x, pallas_interpret_mode())
