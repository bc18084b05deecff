"""Pallas-tier training function: arbitrary-mask diffusion attention.

Replaces autodiff-of-golden (full (S, S) score materialization) with the
streamed-mask flash fwd+bwd trio in kernels/diffusion_vjp.py — the
analogue of the reference's dedicated diffusion-attention kernel
(reference backends/ttx/kernels/npu/a2/diffution_attention.py:1 +
experimental/functions/diffusion_attention.py).  Additive (non-boolean)
masks, broadcastable mask ranks other than (S, S), and lane-unaligned
head dims fall back to the golden.

Semantic divergence (deliberate): a FULLY-masked query row returns
o = 0 with zero gradients, where the golden inherits torch-SDPA's
softmax-over--inf NaN.  Block-diffusion masks keep every token's own
block, so real workloads never hit the case; the finite definition is
the useful one when they do (tests/accuracy/functions/
test_diffusion_vjp_pallas.py::empty-rows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.diffusion_vjp import flash_diffusion
from mojo_opset_tpu.experimental.functions.diffusion_attention import (
    MojoDiffusionAttentionFunction,
)
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


class PallasDiffusionAttentionFunction(MojoDiffusionAttentionFunction):
    def forward(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        mask: jax.Array,
        scale: float = 1.0,
        enable_gqa: bool = False,
    ) -> jax.Array:
        ok = (
            query.ndim == 4
            and mask.ndim == 2
            and mask.dtype == jnp.bool_
            and query.shape[-1] % 128 == 0
            and key.shape[-1] == query.shape[-1]
            and mask.shape == (query.shape[2], key.shape[2])
            and query.shape[2] == key.shape[2]
            and jnp.issubdtype(query.dtype, jnp.floating)
            and query.dtype == key.dtype == value.dtype
            and query.dtype != jnp.float16  # Mosaic has no native f16 path
            and (query.shape[1] == key.shape[1]
                 or (enable_gqa and query.shape[1] % key.shape[1] == 0))
        )
        if not ok:
            return super().forward(query, key, value, mask, scale, enable_gqa)
        return flash_diffusion(
            query, key, value, mask, scale,
            interpret=pallas_interpret_mode(),
        )
