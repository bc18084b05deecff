"""Pallas-tier normalization ops (wrappers over kernels/norms.py).

Analogue of the reference TTX wrapper ops
(backends/ttx/operators/normalization.py:28-32).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels import norms as K
from mojo_opset_tpu.core.operators.normalization import (
    MojoResidualAddRMSNorm,
    MojoRMSNorm,
    MojoRMSNormQuant,
)
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


class PallasRMSNorm(MojoRMSNorm):
    def forward(self, hidden_state: jax.Array) -> jax.Array:
        return K.rmsnorm(
            hidden_state, self.weight, self.variance_epsilon, interpret=pallas_interpret_mode()
        )


class PallasResidualAddRMSNorm(MojoResidualAddRMSNorm):
    def forward(self, hidden_state: jax.Array, residual: jax.Array):
        return K.residual_add_rmsnorm(
            hidden_state, residual, self.weight, self.variance_epsilon,
            norm_pos=self.norm_pos, interpret=pallas_interpret_mode(),
        )


class PallasRMSNormQuant(MojoRMSNormQuant):
    def forward(self, hidden_state: jax.Array, smooth_scale: Optional[jax.Array] = None):
        if smooth_scale is not None:
            # smooth-scale path stays on the golden math (rare in serving)
            return MojoRMSNormQuant.forward(self, hidden_state, smooth_scale)
        return K.rmsnorm_quant(
            hidden_state, self.weight, self.variance_epsilon,
            self.q_min, self.q_max, self.quant_dtype,
            interpret=pallas_interpret_mode(),
        )
