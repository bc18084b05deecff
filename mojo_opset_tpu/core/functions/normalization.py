"""Training normalization functions.

Parity: reference mojo_opset/core/functions/normalization.py:7
(MojoRMSNormFunction, fwd+bwd pair) — differentiable RMSNorm taking the
weight as a call argument (training path), unlike the parameter-holding
MojoRMSNorm operator.
"""

from __future__ import annotations

import jax

from mojo_opset_tpu.core.function import MojoFunction
from mojo_opset_tpu.core.operators.normalization import _rms_norm


class MojoRMSNormFunction(MojoFunction):
    def __init__(self, eps: float = 1e-6, **kwargs):
        super().__init__(**kwargs)
        self.eps = eps

    def forward(self, x: jax.Array, weight: jax.Array) -> jax.Array:
        return _rms_norm(x, weight, self.eps).astype(x.dtype)

    def extra_repr(self) -> str:
        return f"eps={self.eps}"
