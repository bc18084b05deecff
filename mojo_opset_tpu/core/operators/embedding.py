"""Embedding lookup ops.

Parity: reference mojo_opset/core/operators/embedding.py:16-169
(MojoEmbedding :16, MojoParallelEmbedding :73).

TPU notes: MojoParallelEmbedding is the explicit vocab-sharded lookup for
``shard_map`` regions — each shard holds its local rows, out-of-range
indices are masked to zero, and a ``psum`` over the vocab axis assembles
the result (replacing the reference's torch.distributed all_reduce at
embedding.py:158).  Outside shard_map (``axis_name=None``) it behaves like
MojoEmbedding.  When using GSPMD/jit instead of shard_map, prefer plain
MojoEmbedding with a NamedSharding on the table — XLA partitions the
gather automatically.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator


class MojoEmbedding(MojoOperator):
    """Standard embedding lookup."""

    def __init__(
        self,
        num_embeddings: int,
        embedding_dim: int,
        padding_idx: Optional[int] = None,
        max_norm: Optional[float] = None,
        norm_type: float = 2.0,
        key: Optional[jax.Array] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.padding_idx = padding_idx
        self.max_norm = max_norm
        self.norm_type = norm_type
        if key is None:
            key = jax.random.PRNGKey(0)
        from mojo_opset_tpu.utils import init as winit

        weight = winit.normal(key, (num_embeddings, embedding_dim), self.param_dtype or jnp.float32)
        if padding_idx is not None:
            weight = weight.at[padding_idx].set(0.0)
        self.weight = weight

    def _maybe_renorm(self, rows: jax.Array) -> jax.Array:
        if self.max_norm is None:
            return rows
        norms = jnp.linalg.norm(rows.astype(jnp.float32), ord=self.norm_type, axis=-1, keepdims=True)
        factor = jnp.minimum(1.0, self.max_norm / jnp.maximum(norms, 1e-12))
        return (rows * factor).astype(rows.dtype)

    def forward(self, input: jax.Array) -> jax.Array:
        return self._maybe_renorm(self.weight[input])

    def extra_repr(self) -> str:
        s = f"num_embeddings={self.num_embeddings}, embedding_dim={self.embedding_dim}"
        if self.padding_idx is not None:
            s += f", padding_idx={self.padding_idx}"
        if self.max_norm is not None:
            s += f", max_norm={self.max_norm}, norm_type={self.norm_type}"
        return s


class MojoParallelEmbedding(MojoOperator):
    """Vocabulary-parallel embedding for shard_map regions.

    Each shard stores ``ceil(num_embeddings / num_shards)`` rows; indices
    outside the local range contribute zero vectors and a ``psum`` over
    ``axis_name`` assembles the full lookup.
    """

    def __init__(
        self,
        num_embeddings: int,
        embedding_dim: int,
        padding_idx: Optional[int] = None,
        max_norm: Optional[float] = None,
        norm_type: float = 2.0,
        axis_name: Optional[str] = None,
        num_shards: int = 1,
        key: Optional[jax.Array] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.padding_idx = padding_idx
        self.max_norm = max_norm
        self.norm_type = norm_type
        self.axis_name = axis_name
        self.num_shards = num_shards
        self.local_num_embeddings = math.ceil(num_embeddings / num_shards)
        if key is None:
            key = jax.random.PRNGKey(0)
        from mojo_opset_tpu.utils import init as winit

        # The full logical table; under shard_map pass per-shard slices of
        # shape (local_num_embeddings, embedding_dim) via .replace(weight=...).
        weight = winit.normal(
            key,
            (self.local_num_embeddings if num_shards > 1 else num_embeddings, embedding_dim),
            self.param_dtype or jnp.float32,
        )
        if padding_idx is not None and num_shards == 1:
            weight = weight.at[padding_idx].set(0.0)
        self.weight = weight

    def forward(self, input: jax.Array) -> jax.Array:
        if self.axis_name is None and self.num_shards == 1:
            rows = self.weight[input]
            if self.max_norm is not None:
                norms = jnp.linalg.norm(
                    rows.astype(jnp.float32), ord=self.norm_type, axis=-1, keepdims=True
                )
                factor = jnp.minimum(1.0, self.max_norm / jnp.maximum(norms, 1e-12))
                rows = (rows * factor).astype(rows.dtype)
            return rows

        shard = jax.lax.axis_index(self.axis_name) if self.axis_name is not None else 0
        vocab_start = shard * self.local_num_embeddings
        local_input = input - vocab_start
        in_range = (local_input >= 0) & (local_input < self.local_num_embeddings)
        masked_input = jnp.clip(local_input, 0, self.local_num_embeddings - 1)
        output = self.weight[masked_input]
        output = output * in_range[..., None].astype(output.dtype)
        if self.axis_name is not None:
            output = jax.lax.psum(output, self.axis_name)
        return output

    def extra_repr(self) -> str:
        return (
            f"num_embeddings={self.num_embeddings}, embedding_dim={self.embedding_dim}, "
            f"num_shards={self.num_shards}, axis_name={self.axis_name!r}"
        )
