"""Pallas-tier training function: RoPE with hand-written fwd+bwd.

Third accelerated training-function pair (after loss.py /
normalization.py), the analogue of the reference's TTX rope function
(backends/ttx/functions/ + backends/ttx/kernels/npu/a2/rope.py).
Unsupported geometries fall back to the golden (JAX-autodiff backward).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.rope import head_first_supported, rope_train
from mojo_opset_tpu.core.functions.position_embedding import MojoApplyRoPEFunction
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


class PallasApplyRoPEFunction(MojoApplyRoPEFunction):
    def forward(
        self,
        q: jax.Array,
        k: jax.Array,
        cos: jax.Array,
        sin: jax.Array,
        head_first: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        # kernel contract: head-first (B, H, S, D) with 2-D (S, D) tables,
        # lane-aligned D, and a sequence window that tiles into VMEM
        if (
            not head_first
            or q.ndim != 4
            or cos.ndim != 2
            or q.shape[-1] % 128 != 0
            or cos.shape != q.shape[-2:]
            or sin.shape != q.shape[-2:]
            or not head_first_supported(q.shape[2], q.shape[1], q.shape[3], q.dtype)
        ):
            return super().forward(q, k, cos, sin, head_first)
        if jnp.issubdtype(q.dtype, jnp.floating) and q.dtype != k.dtype:
            return super().forward(q, k, cos, sin, head_first)
        return rope_train(q, k, cos, sin, pallas_interpret_mode())
