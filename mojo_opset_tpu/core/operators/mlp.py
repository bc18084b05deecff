"""SwiGLU MLP block.

Parity: reference mojo_opset/core/operators/mlp.py:7-41
(fc1 to 2x hidden -> chunk -> silu*mul -> fc2).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.gemm import MojoGemm


class MojoSwiGLUMLP(MojoOperator):
    def __init__(
        self,
        input_size: int,
        output_size: int,
        hidden_size: int,
        key: Optional[jax.Array] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        self.fc1 = MojoGemm(input_size, hidden_size * 2, bias=False, key=k1, dtype=self.param_dtype)
        self.fc2 = MojoGemm(hidden_size, output_size, bias=False, key=k2, dtype=self.param_dtype)

    def forward(self, x: jax.Array) -> jax.Array:
        a = self.fc1(x)
        a1, a2 = jnp.split(a, 2, axis=-1)
        b = jax.nn.silu(a1) * a2
        return self.fc2(b)

    def extra_repr(self) -> str:
        return (
            f"input_size={self.fc1.in_features}, output_size={self.fc2.out_features}, "
            f"hidden_size={self.fc2.in_features}"
        )
