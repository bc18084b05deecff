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
    def forward(self, x: jax.Array) -> jax.Array:
        if (
            x.ndim < 2
            or x.shape[-1] % 128 != 0
            or (x.size // x.shape[-1]) % 8 != 0
            or not jnp.issubdtype(x.dtype, jnp.floating)
        ):
            return super().forward(x)
        return silu_vjp(x, pallas_interpret_mode())
