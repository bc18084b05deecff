"""Sampling ops.

Parity: reference mojo_opset/core/operators/sampling.py:12-361
(MojoTopKSampling :12, MojoTopPSampling :74, MojoTopPFilter :147,
MojoRejectSampling :209, MojoJoinProbRejectSampling :256,
MojoApplyPenaltiesTempurate :310).

JAX notes: randomness is explicit — sampling forwards take a ``key``
argument instead of relying on a global torch seed; ``forward_diff_with``
feeds both sides the same key so tier comparisons are exact.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator


def _sample_from_probs(probs: jax.Array, key: jax.Array) -> jax.Array:
    """Categorical sample over the last dim; returns index with shape (..., 1)."""
    idx = jax.random.categorical(key, jnp.log(jnp.clip(probs, min=1e-38)))
    return idx[..., None]


class MojoTopKSampling(MojoOperator):
    def __init__(
        self,
        top_k: int = 50,
        filter_value: float = -float("inf"),
        min_tokens_to_keep: int = 1,
        op_name: str = "",
        layer_idx: int = 0,
    ):
        super().__init__()
        self.op_name = op_name
        self.layer_idx = layer_idx
        self.top_k = top_k
        self.filter_value = filter_value
        self.min_tokens_to_keep = min_tokens_to_keep

    def forward(self, logits: jax.Array, key: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
        """Top-k sample; returns ``(next_probs, next_tokens)`` each (..., 1)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        logits = logits.astype(jnp.float32)
        top_k = max(min(self.top_k, logits.shape[-1]), self.min_tokens_to_keep)
        topk_logits, topk_indices = jax.lax.top_k(logits, top_k)
        probs = jax.nn.softmax(topk_logits, axis=-1)
        select = _sample_from_probs(probs, key)
        next_tokens = jnp.take_along_axis(topk_indices, select, axis=-1)
        next_probs = jnp.take_along_axis(probs, select, axis=-1)
        return next_probs, next_tokens

    def extra_repr(self) -> str:
        return f"top_k={self.top_k}, min_tokens_to_keep={self.min_tokens_to_keep}"


def _nucleus_from_topk(
    topk_logits: jax.Array, top_p: float, min_tokens_to_keep: int, filter_value: float
) -> jax.Array:
    """Nucleus mask + renormalize over DESCENDING-sorted top-k logits."""
    top_k = topk_logits.shape[-1]
    cumulative = jnp.cumsum(jax.nn.softmax(topk_logits, axis=-1), axis=-1)
    to_remove = cumulative > top_p
    if min_tokens_to_keep > 1:
        keep = jnp.arange(top_k) < (min_tokens_to_keep - 1)
        to_remove = jnp.where(keep, False, to_remove)
    # shift right so the first token above the threshold is kept
    to_remove = jnp.concatenate(
        [jnp.zeros_like(to_remove[..., :1]), to_remove[..., :-1]], axis=-1
    )
    filtered = jnp.where(to_remove, filter_value, topk_logits)
    return jax.nn.softmax(filtered, axis=-1)


def _top_p_filter(
    logits: jax.Array, top_p: float, min_tokens_to_keep: int, rand_top_k: int, filter_value: float
):
    """Shared nucleus filtering (reference sampling.py:120-132/:188-201)."""
    logits = logits.astype(jnp.float32)
    top_k = min(rand_top_k, logits.shape[-1])
    topk_logits, topk_indices = jax.lax.top_k(logits, top_k)
    probs = _nucleus_from_topk(topk_logits, top_p, min_tokens_to_keep, filter_value)
    return probs, topk_indices


class MojoTopPSampling(MojoOperator):
    def __init__(
        self,
        top_p: float = 0.75,
        filter_value: float = -float("inf"),
        min_tokens_to_keep: int = 1,
        rand_top_k: int = 1000,
    ):
        super().__init__()
        self.top_p = top_p
        self.filter_value = filter_value
        self.min_tokens_to_keep = min_tokens_to_keep
        self.rand_top_k = rand_top_k

    def forward(self, logits: jax.Array, key: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
        """Nucleus sample; returns ``(next_probs, next_tokens)`` each (..., 1)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        probs, topk_indices = _top_p_filter(
            logits, self.top_p, self.min_tokens_to_keep, self.rand_top_k, self.filter_value
        )
        select = _sample_from_probs(probs, key)
        next_tokens = jnp.take_along_axis(topk_indices, select, axis=-1)
        next_probs = jnp.take_along_axis(probs, select, axis=-1)
        return next_probs, next_tokens

    def extra_repr(self) -> str:
        return (
            f"top_p={self.top_p}, filter_value={self.filter_value}, "
            f"min_tokens_to_keep={self.min_tokens_to_keep}, rand_top_k={self.rand_top_k}"
        )


class MojoTopPFilter(MojoOperator):
    def __init__(self, filter_value: float = -float("inf")):
        super().__init__()
        self.filter_value = filter_value

    def forward(
        self, logits: jax.Array, top_p: float, min_tokens_to_keep: int, rand_top_k: int
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns ``(final_probs_dist, sorted_topk_indices)`` each (..., K)."""
        dtype = logits.dtype
        probs, topk_indices = _top_p_filter(
            logits, top_p, min_tokens_to_keep, rand_top_k, self.filter_value
        )
        return probs.astype(dtype), topk_indices

    def extra_repr(self) -> str:
        return f"filter_value={self.filter_value}"


class MojoRejectSampling(MojoOperator):
    def forward(
        self,
        target_probs: jax.Array,  # (B, S+1, V)
        draft_tokens: jax.Array,  # (B, S)
        draft_probs: jax.Array,  # (B, S)
        key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Speculative acceptance: accept step i while
        ``target_p_i / draft_p_i >= u`` with a single u ~ U(0,1) per batch;
        returns ``(next_tokens (B, S+1), accepted_len (B,))``.
        Reference sampling.py:209-253 (sentinel reject appended so argmax
        yields the accepted prefix length)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        batch_size = target_probs.shape[0]
        spec_step = draft_probs.shape[1]

        rand_vals = jax.random.uniform(key, (batch_size, 1))
        # direct 3-axis gather: slicing [:, :spec_step, :] first materializes
        # a (B, S, V) copy (27 MB at the published perf shape) before the
        # gather can fuse — index the full tensor instead
        picked = target_probs[
            jnp.arange(batch_size)[:, None],
            jnp.arange(spec_step)[None, :],
            draft_tokens.astype(jnp.int32),
        ]
        reject = (picked / draft_probs) < rand_vals
        reject = jnp.concatenate(
            [reject.astype(jnp.int32), jnp.ones((batch_size, 1), jnp.int32)], axis=1
        )
        accepted_len = jnp.argmax(reject, axis=1)
        next_tokens = jnp.concatenate(
            [draft_tokens, jnp.zeros((batch_size, 1), draft_tokens.dtype)], axis=-1
        )
        return next_tokens, accepted_len


class MojoJoinProbRejectSampling(MojoOperator):
    def forward(
        self,
        target_probs: jax.Array,
        draft_tokens: jax.Array,
        draft_probs: jax.Array,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Joint-probability speculative acceptance via cumulative ratios
        (reference sampling.py:256-307)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        batch_size = target_probs.shape[0]
        spec_step = draft_probs.shape[1]

        picked = target_probs[
            jnp.arange(batch_size)[:, None],
            jnp.arange(spec_step)[None, :],
            draft_tokens.astype(jnp.int32),
        ]  # direct gather, no (B, S, V) slice copy (see MojoRejectSampling)
        ratios = jnp.clip(picked / draft_probs, 0.0, 1.0)
        pi = jnp.cumprod(ratios, axis=1)
        rand = jnp.cumprod(jax.random.uniform(key, (batch_size, spec_step)), axis=1)
        reject = jnp.concatenate(
            [jnp.zeros((batch_size, 1), jnp.int32), (pi < rand).astype(jnp.int32)], axis=1
        )
        accepted_len = spec_step - jnp.argmin(jnp.flip(reject, axis=1), axis=1).astype(jnp.int32)
        next_tokens = jnp.concatenate(
            [draft_tokens, jnp.zeros((batch_size, 1), draft_tokens.dtype)], axis=-1
        )
        return next_tokens, accepted_len.astype(jnp.int32)


class MojoApplyPenaltiesTempurate(MojoOperator):
    def forward(
        self,
        logits: jax.Array,
        token_freqs: List[Union[None, jax.Array]],
        presence_penalties: List[float],
        frequency_penalties: List[float],
        repetition_penalties: List[float],
        temps: Optional[List[Optional[float]]] = None,
    ) -> jax.Array:
        """Apply presence/frequency/repetition penalties + temperature per
        batch row (reference sampling.py:310-361).  The per-batch penalty
        lists are host-side config, so the batch loop unrolls at trace
        time."""
        dtype = logits.dtype
        logits = logits.astype(jnp.float32)
        rows = []
        for i, freq in enumerate(token_freqs):
            row = logits[i]
            if freq is not None:
                freq = jnp.asarray(freq, jnp.float32)
                if frequency_penalties[i] != 0.0:
                    row = row - frequency_penalties[i] * freq
                if presence_penalties[i] != 0.0:
                    row = row - presence_penalties[i] * (freq > 0).astype(jnp.float32)
                if repetition_penalties[i] != 1.0:
                    conds = row * freq
                    row = jnp.where(
                        conds < 0,
                        row * repetition_penalties[i],
                        jnp.where(conds > 0, row / repetition_penalties[i], row),
                    )
            if temps is not None and temps[i] is not None:
                row = row / temps[i]
            rows.append(row)
        return jnp.stack(rows, axis=0).astype(dtype)
