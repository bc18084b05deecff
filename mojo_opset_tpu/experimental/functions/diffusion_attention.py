"""Autograd attention with arbitrary masks for text-diffusion models.

Parity: reference mojo_opset/experimental/functions/diffusion_attention.py:10-120
(MojoDiffusionAttentionFunction + mojo_diffusion_attention) and the
block-diffusion mask builder (experimental/block_diffusion_attention.py —
empty in the snapshot; the standard block-causal semantics are provided).

JAX autodiff supplies the backward (the reference recomputes through
torch.autograd in its backward, :55-93).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.function import MojoFunction
from mojo_opset_tpu.core.operators.attention import MojoSdpa


class MojoDiffusionAttentionFunction(MojoFunction):
    """q/k/v (B, H, S, D) with an arbitrary (S, S) mask; differentiable."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)

    def forward(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        mask: jax.Array,
        scale: float = 1.0,
        enable_gqa: bool = False,
    ) -> jax.Array:
        sdpa = MojoSdpa._registry.get(self._backend)(scale=scale, enable_gqa=enable_gqa)
        return sdpa(query, key, value, attn_mask=mask)


def mojo_diffusion_attention(query, key, value, mask, scale: float = 1.0,
                             enable_gqa: bool = False) -> jax.Array:
    """Functional wrapper (reference :96-120)."""
    return MojoDiffusionAttentionFunction()(query, key, value, mask, scale, enable_gqa)


def block_diffusion_mask(seq_len: int, block_size: int, dtype=jnp.bool_) -> jax.Array:
    """Block-diffusion mask: token i attends to every token in its own
    block (bidirectional) and to all tokens in earlier blocks."""
    blocks = jnp.arange(seq_len) // block_size
    keep = blocks[:, None] >= blocks[None, :]
    return keep.astype(dtype)
