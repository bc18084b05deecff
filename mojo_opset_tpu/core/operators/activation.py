"""Activation ops.

Parity: reference mojo_opset/core/operators/activation.py:6-66
(MojoGelu, MojoSilu, MojoSwiGLU with optional swiglu_limit clamp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator


class MojoGelu(MojoOperator):
    def __init__(self, approximate: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.approximate = approximate

    def forward(self, x: jax.Array) -> jax.Array:
        """Element-wise GELU; same shape/dtype as input."""
        return jax.nn.gelu(x, approximate=self.approximate)

    def extra_repr(self) -> str:
        return f"approximate={self.approximate}"


class MojoSilu(MojoOperator):
    def forward(self, x: jax.Array) -> jax.Array:
        """Element-wise SiLU (x * sigmoid(x)); same shape/dtype as input."""
        return jax.nn.silu(x)


class MojoSwiGLU(MojoOperator):
    def __init__(self, swiglu_limit: float = 0.0, **kwargs):
        super().__init__(**kwargs)
        self.swiglu_limit = swiglu_limit

    def forward(self, gate_out: jax.Array, up_out: jax.Array) -> jax.Array:
        """SiLU(gate_out) * up_out with optional clamping.

        If ``swiglu_limit > 0``, ``up_out`` is clamped to
        ``[-limit, limit]`` and ``gate_out`` to a max of ``limit`` before
        activation (reference activation.py:60-63).
        """
        if self.swiglu_limit > 0:
            up_out = jnp.clip(up_out, -self.swiglu_limit, self.swiglu_limit)
            gate_out = jnp.minimum(gate_out, self.swiglu_limit)
        return jax.nn.silu(gate_out) * up_out

    def extra_repr(self) -> str:
        return f"swiglu_limit={self.swiglu_limit}"
