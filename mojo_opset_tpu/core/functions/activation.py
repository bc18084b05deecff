"""Training activation functions (differentiable fwd+bwd).

Parity: reference mojo_opset/core/functions/activation.py:6
(MojoSiluFunction).  JAX autodiff supplies the backward; Pallas tiers may
attach ``jax.custom_vjp`` kernels.
"""

from __future__ import annotations

import jax

from mojo_opset_tpu.core.function import MojoFunction


class MojoSiluFunction(MojoFunction):
    def forward(self, x: jax.Array) -> jax.Array:
        return jax.nn.silu(x)
