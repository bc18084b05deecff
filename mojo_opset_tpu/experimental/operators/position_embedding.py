"""Experimental position embedding ops.

Parity: reference mojo_opset/experimental/operators/position_embedding.py
(MojoRelativeEmbedding :9 (T5 buckets), MojoGridRoPE :80 (Wan DiT 3-D),
MojoMRoPEInplace :121).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.position_embedding import MojoMRoPE
from mojo_opset_tpu.utils import init as winit


class MojoRelativeEmbedding(MojoOperator):
    """T5-style relative position bias: returns (1, num_heads, Lq, Lk)."""

    def __init__(self, num_buckets: int, num_heads: int, bidirectional: bool, max_dist: int = 128, key=None):
        super().__init__()
        if not isinstance(num_buckets, int) or num_buckets <= 0:
            raise ValueError("num_buckets must be a positive integer")
        if not isinstance(num_heads, int) or num_heads <= 0:
            raise ValueError("num_heads must be a positive integer")
        if not isinstance(bidirectional, bool):
            raise TypeError("bidirectional must be a bool")
        if not isinstance(max_dist, int) or max_dist <= 0:
            raise ValueError("max_dist must be a positive integer")
        self.num_buckets = num_buckets
        self.num_heads = num_heads
        self.bidirectional = bidirectional
        self.max_dist = max_dist
        if key is None:
            key = jax.random.PRNGKey(0)
        self.embedding = winit.normal(key, (num_buckets, num_heads), jnp.float32)

    def _relative_position_bucket(self, rel_pos: jax.Array) -> jax.Array:
        if self.bidirectional:
            num_buckets = self.num_buckets // 2
            rel_buckets = (rel_pos > 0).astype(jnp.int32) * num_buckets
            rel_pos = jnp.abs(rel_pos)
        else:
            num_buckets = self.num_buckets
            rel_buckets = jnp.zeros_like(rel_pos)
            rel_pos = -jnp.minimum(rel_pos, 0)

        max_exact = num_buckets // 2
        large = max_exact + (
            jnp.log(jnp.maximum(rel_pos, 1).astype(jnp.float32) / max_exact)
            / math.log(self.max_dist / max_exact)
            * (num_buckets - max_exact)
        ).astype(jnp.int32)
        large = jnp.minimum(large, num_buckets - 1)
        return rel_buckets + jnp.where(rel_pos < max_exact, rel_pos, large)

    def forward(self, lq: int, lk: int) -> jax.Array:
        if not isinstance(lq, int) or not isinstance(lk, int) or lq <= 0 or lk <= 0:
            raise ValueError("lq and lk must be positive integers")
        rel_pos = jnp.arange(lk, dtype=jnp.int32)[None, :] - jnp.arange(lq, dtype=jnp.int32)[:, None]
        buckets = self._relative_position_bucket(rel_pos)
        emb = self.embedding[buckets]  # (Lq, Lk, H)
        return jnp.transpose(emb, (2, 0, 1))[None]

    def extra_repr(self) -> str:
        return (
            f"num_buckets={self.num_buckets}, num_heads={self.num_heads}, "
            f"bidirectional={self.bidirectional}, max_dist={self.max_dist}"
        )


class MojoGridRoPE(MojoOperator):
    """3-D grid RoPE over (F, H, W) axes with precomputed complex phases.

    x (B, L, N, D) with D even; ``freqs_list`` is a length-B list of
    complex unit-phase arrays (seq_len_i, 1, D/2).  Tokens past F*H*W keep
    their values (padding preserved). Reference position_embedding.py:80-118.
    """

    def forward(self, x: jax.Array, grid_sizes, freqs_list: List[jax.Array]) -> jax.Array:
        assert x.ndim == 4, "x must be 4D: [B, L, N, D]"
        assert x.shape[-1] % 2 == 0, "D must be even for complex pairing"
        import numpy as np

        grid = np.asarray(grid_sizes)
        assert grid.ndim == 2 and grid.shape[1] == 3, "grid_sizes must be [B, 3]"
        B, L, N, D = x.shape
        outs = []
        for i, (f, h, w) in enumerate(grid.tolist()):
            seq_len = int(f * h * w)
            xi = x[i, :seq_len].astype(jnp.float32).reshape(seq_len, N, D // 2, 2)
            xc = jax.lax.complex(xi[..., 0], xi[..., 1])
            rotated = xc * freqs_list[i]
            xr = jnp.stack([jnp.real(rotated), jnp.imag(rotated)], axis=-1).reshape(seq_len, N, D)
            outs.append(jnp.concatenate([xr.astype(x.dtype), x[i, seq_len:]], axis=0))
        return jnp.stack(outs).astype(x.dtype)


class MojoMRoPEInplace(MojoOperator):
    """MRoPE with the reference's inplace flag (functional in JAX; the flag
    is API parity only). Reference position_embedding.py:121-240."""

    def __init__(self, inplace: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.inplace = inplace
        self.mrope = MojoMRoPE()

    def forward(
        self,
        query: jax.Array,
        key: jax.Array,
        cos_table: jax.Array,
        sin_table: jax.Array,
        mrope_section: List[int],
        is_interleaved: bool = False,
        head_dim: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        return self.mrope(query, key, cos_table, sin_table, mrope_section, is_interleaved, head_dim)
