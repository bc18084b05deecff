"""XLA-tier sampling: TPU-native approximate top-k selection.

``jax.lax.top_k`` over a 32k vocab costs ~57 µs on v5e (full reduction
network); ``jax.lax.approx_max_k`` — the hardware-binned TPU algorithm —
returns the same heads in ~9 µs at recall_target=0.95.  For *sampling*
(inherently stochastic, mass concentrated in the head) the approximate
candidate set is the standard TPU serving trade; the golden `ref` tier
stays exact and is what deterministic tests pin.

Replaces the reference TTX sample kernels
(backends/ttx/kernels/npu/a2/sample.py, 1170 LoC) as the accelerated
tier.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operators.sampling import (
    MojoTopKSampling,
    MojoTopPFilter,
    MojoTopPSampling,
    _nucleus_from_topk,
    _sample_from_probs,
)


_DEFAULT_RECALL = 0.95


def _recall_for(top_k: int, recall_target: float = _DEFAULT_RECALL,
                large_k_recall: float = 0.90) -> float:
    """Recall target for ``approx_max_k``: ``recall_target`` for
    head-sized k, ``large_k_recall`` once the candidate table explodes —
    but ONLY when the caller left ``recall_target`` at the class default
    (a user who explicitly configured e.g. 0.99 keeps 0.99 at every k).

    Measured on v5e at (120, 151936) k=1000 (tools/exp_topp3.py): the
    PartialReduce emits L=38016 candidates at recall 0.95 but L=9600 at
    0.90, and the sorted aggregation — the dominant cost, XLA's bitonic
    sort network — scales with L: 4312 us vs 1038 us end-to-end (the
    910B reference kernel: 828-987 us).  The ~10% of the true top-k the
    lower recall can miss are the bin-non-max stragglers at the tail of
    the distribution — the tokens nucleus filtering cuts anyway.
    Exhausted alternatives, all slower: exact ``top_k`` 23 ms; variadic /
    single-key-packed sort of the 38016 candidates 4.3-6.2 ms; bisected
    k-th threshold is fast (144 us) but ordered compaction needs a (B, L)
    scatter, 42 ms on TPU (no fast scatter path).
    """
    if top_k <= 256 or recall_target != _DEFAULT_RECALL:
        return recall_target
    return large_k_recall


class XlaTopPFilter(MojoTopPFilter):
    """Nucleus filter over the hardware-binned approximate top-k heads.

    The golden's exact ``lax.top_k`` at rand_top_k=100 over a 151k vocab
    lowers to a full variadic sort (~23 ms on v5e); ``approx_max_k`` with
    ``aggregate_to_topk=True`` returns the same sorted candidate heads in
    the serving-standard approximate way (recall 0.95 of the true set —
    the tail it can miss carries the least mass, exactly the tokens
    nucleus filtering is about to cut; 0.90 for k > 256, see
    ``_recall_for``).  Same trade as XlaTopKSampling.
    """

    recall_target: float = _DEFAULT_RECALL
    large_k_recall: float = 0.90

    def forward(
        self, logits: jax.Array, top_p: float, min_tokens_to_keep: int, rand_top_k: int
    ) -> Tuple[jax.Array, jax.Array]:
        dtype = logits.dtype
        lf = logits.astype(jnp.float32)
        top_k = min(rand_top_k, lf.shape[-1])
        topk_logits, topk_indices = jax.lax.approx_max_k(
            lf, top_k,
            recall_target=_recall_for(top_k, self.recall_target, self.large_k_recall),
            aggregate_to_topk=True
        )
        probs = _nucleus_from_topk(
            topk_logits, top_p, min_tokens_to_keep, self.filter_value
        )
        return probs.astype(dtype), topk_indices


class XlaTopKSampling(MojoTopKSampling):
    recall_target: float = _DEFAULT_RECALL
    large_k_recall: float = 0.90

    def forward(self, logits: jax.Array, key: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
        if key is None:
            key = jax.random.PRNGKey(0)
        logits = logits.astype(jnp.float32)
        top_k = max(min(self.top_k, logits.shape[-1]), self.min_tokens_to_keep)
        topk_logits, topk_indices = jax.lax.approx_max_k(
            logits, top_k,
            recall_target=_recall_for(top_k, self.recall_target, self.large_k_recall),
            aggregate_to_topk=True
        )
        probs = jax.nn.softmax(topk_logits, axis=-1)
        select = _sample_from_probs(probs, key)
        next_tokens = jnp.take_along_axis(topk_indices, select, axis=-1)
        next_probs = jnp.take_along_axis(probs, select, axis=-1)
        return next_probs, next_tokens


class XlaTopPSampling(MojoTopPSampling):
    """Nucleus sampling via a binary-searched logit threshold — no sort.

    The exact rule keeps the shortest descending-prob prefix with mass
    >= top_p; thresholding at the logit where the kept mass first
    reaches top_p selects the same set up to threshold quantization
    (16 bisection steps => kept-mass error < ~1e-4 of a token's prob).
    Each step is one fused masked-sum pass, so the whole filter is a few
    streaming reads of the logits instead of a 32k-wide sort.
    """

    bisect_steps: int = 16

    def forward(self, logits: jax.Array, key: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
        if key is None:
            key = jax.random.PRNGKey(0)
        logits = logits.astype(jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        probs = jnp.exp(logits - lse)

        # floor: the min_tokens_to_keep-th largest logit must stay kept
        mk = max(self.min_tokens_to_keep, 1)
        kth = jax.lax.approx_max_k(logits, mk, aggregate_to_topk=True)[0][..., -1:]

        hi = jnp.max(logits, axis=-1, keepdims=True)
        lo = jnp.min(logits, axis=-1, keepdims=True)

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            mass = jnp.sum(jnp.where(logits >= mid, probs, 0.0), axis=-1, keepdims=True)
            too_much = mass > self.top_p
            return jnp.where(too_much, mid, lo), jnp.where(too_much, hi, mid)

        lo, hi = jax.lax.fori_loop(0, self.bisect_steps, body, (lo, hi))
        # use `lo` (mass >= top_p side) so the token crossing the boundary
        # is retained, matching the golden prefix rule
        thresh = jnp.minimum(lo, kth)
        filtered = jnp.where(logits >= thresh, probs, 0.0)
        filtered = filtered / jnp.clip(jnp.sum(filtered, axis=-1, keepdims=True), min=1e-38)
        select = _sample_from_probs(filtered, key)
        next_probs = jnp.take_along_axis(filtered, select, axis=-1)
        return next_probs, select.astype(jnp.int32)
