"""Runtime parallel helpers (AFD FFN-side token exchange).

Parity: reference mojo_opset/runtime/parallel.py:13-83
(``dp_allreduce`` / ``dp_scatter`` / ``merge_group_and_share_ffn``) —
attention-FFN-disaggregation helpers that move tokens between the DP
attention group and the FFN group.  shard_map axis collectives replace
the torch.distributed process-group calls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dp_allreduce(x: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """Sum partial activations across the DP group (identity when unset)."""
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def dp_scatter(x: jax.Array, axis_name: Optional[str], axis: int = 0) -> jax.Array:
    """Scatter the leading dim back to DP shards (reduce-scatter sum)."""
    if axis_name is None:
        return x
    return jax.lax.psum_scatter(x, axis_name, scatter_dimension=axis, tiled=True)


def dp_gather(x: jax.Array, axis_name: Optional[str], axis: int = 0) -> jax.Array:
    """All-gather DP shards so the FFN side sees the full token set."""
    if axis_name is None:
        return x
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)


def merge_group_and_share_ffn(
    hidden: jax.Array,
    dp_axis: Optional[str],
    ffn_fn,
) -> jax.Array:
    """AFD FFN-side exchange: gather the DP group's tokens, run the shared
    FFN once over the merged set, reduce-scatter results back
    (reference runtime/parallel.py:40-83)."""
    merged = dp_gather(hidden, dp_axis, axis=0)
    out = ffn_fn(merged)
    return dp_scatter(out, dp_axis, axis=0)
