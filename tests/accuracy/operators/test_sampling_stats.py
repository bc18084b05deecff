"""Statistical distribution tests for the sampling ops.

Reference analogue: the reference trusts torch.multinomial; here the
sampling path is our own (categorical over renormalized top-k/top-p
mass), so the DISTRIBUTION itself is validated: empirical frequencies
over many keys must match the renormalized truncated softmax via a
chi-square-style bound, for every accelerated tier.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m

from ..utils import tiers_of


def _empirical(op, logits, n=4000, take=-1):
    toks = []
    # vmapped over keys: one batched device call instead of n tiny ones
    keys = jax.random.split(jax.random.PRNGKey(123), n)
    out = jax.vmap(lambda k: op(logits, key=k)[take])(keys)
    toks = np.asarray(out)[..., 0, 0]  # (n,) token ids for batch row 0
    return np.bincount(toks.astype(np.int64), minlength=logits.shape[-1]) / n


def _truncated_softmax(logits, keep_idx):
    p = np.exp(logits - logits.max())
    mask = np.zeros_like(p)
    mask[keep_idx] = 1
    p = p * mask
    return p / p.sum()


def _assert_close_dist(freq, want, n, z=5.0):
    """Each cell within z standard errors of the expected frequency."""
    se = np.sqrt(np.maximum(want * (1 - want), 1e-12) / n)
    bad = np.abs(freq - want) > z * se + 1e-3
    assert not bad.any(), f"cells off: {np.nonzero(bad)[0]}, freq={freq[bad]}, want={want[bad]}"


@pytest.mark.parametrize("tier", ["ref"])
def test_topk_sampling_distribution(tier):
    V, K = 12, 4
    rng = np.random.default_rng(0)
    logits_np = rng.standard_normal(V).astype(np.float32) * 2
    logits = jnp.asarray(logits_np)[None]
    op = m.MojoTopKSampling.get_backend_impl(tier)(top_k=K)
    n = 4000
    freq = _empirical(op, logits, n)
    keep = np.argsort(-logits_np)[:K]
    want = _truncated_softmax(logits_np, keep)
    assert freq[np.setdiff1d(np.arange(V), keep)].sum() == 0  # never outside top-k
    _assert_close_dist(freq, want, n)


def test_topk_accelerated_tiers_match_ref_distribution():
    V, K, n = 16, 5, 3000
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal(V).astype(np.float32) * 2)[None]
    ref_freq = _empirical(m.MojoTopKSampling.get_backend_impl("ref")(top_k=K), logits, n)
    for tier in tiers_of(m.MojoTopKSampling):
        op = m.MojoTopKSampling.get_backend_impl(tier)(top_k=K)
        freq = _empirical(op, logits, n)
        # approximate top-k tiers may sample an approximate candidate SET,
        # but the kept mass must match within sampling noise
        se = np.sqrt(np.maximum(ref_freq * (1 - ref_freq), 1e-12) / n)
        assert (np.abs(freq - ref_freq) < 6 * se + 2e-2).all(), tier


def test_topp_sampling_distribution():
    V = 10
    logits_np = np.array([4.0, 3.0, 2.5, 1.0, 0.5, 0.0, -1, -2, -3, -4], np.float32)
    logits = jnp.asarray(logits_np)[None]
    op = m.MojoTopPSampling.get_backend_impl("ref")(top_p=0.8)
    n = 4000
    freq = _empirical(op, logits, n)
    # nucleus: smallest prefix of sorted probs with cum >= 0.8
    p = np.exp(logits_np - logits_np.max())
    p /= p.sum()
    order = np.argsort(-p)
    keep = order[: int(np.searchsorted(np.cumsum(p[order]), 0.8) + 1)]
    want = _truncated_softmax(logits_np, keep)
    assert freq[np.setdiff1d(np.arange(V), keep)].sum() == 0
    _assert_close_dist(freq, want, n)


def test_reject_sampling_acceptance_rate_matches_ratio():
    """Accept step 1 with probability min(1, target/draft) over random
    keys: empirical acceptance must match the ratio."""
    op = m.MojoRejectSampling()
    B, S, V = 1, 1, 4
    target = jnp.asarray(np.tile([[0.3, 0.2, 0.4, 0.1]], (B, S + 1, 1)), jnp.float32)
    draft_tokens = jnp.zeros((B, S), jnp.int32)  # token 0: target p=0.3
    draft_probs = jnp.full((B, S), 0.6, jnp.float32)  # ratio 0.5
    n = 3000
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    acc = jax.vmap(lambda k: op(target, draft_tokens, draft_probs, key=k)[1])(keys)
    rate = float(np.asarray(acc).mean())  # accepted_len in {0, 1}
    assert abs(rate - 0.5) < 0.05, rate


def test_join_prob_reject_chain_rate():
    """Joint acceptance over 2 steps with ratios r1, r2: P(len==2) = r1*r2
    under the cumulative-product rule."""
    op = m.MojoJoinProbRejectSampling()
    B, S, V = 1, 2, 4
    tp = np.zeros((B, S + 1, V), np.float32)
    tp[:, :, 0] = 0.4
    tp[:, :, 1:] = 0.2
    target = jnp.asarray(tp)
    draft_tokens = jnp.zeros((B, S), jnp.int32)
    draft_probs = jnp.full((B, S), 0.8, jnp.float32)  # ratio 0.5 each step
    n = 3000
    keys = jax.random.split(jax.random.PRNGKey(11), n)
    acc = np.asarray(jax.vmap(lambda k: op(target, draft_tokens, draft_probs, key=k)[1])(keys))
    # cumulative rule: len==2 iff u1*u2 <= q where q = r1*r2 = 0.25;
    # P(u1*u2 <= q) = q*(1 - ln q) for independent uniforms
    q = 0.25
    want_p2 = q * (1 - np.log(q))
    p2 = (acc == 2).mean()
    assert abs(p2 - want_p2) < 0.05, (p2, want_p2)


def test_penalties_temperature_composition():
    """Hand-computed oracle for the freq -> presence -> repetition ->
    temperature pipeline, plus a None-freq passthrough row."""
    op = m.MojoApplyPenaltiesTempurate()
    logits = jnp.asarray([[2.0, 1.0, -1.0, 0.0], [2.0, 1.0, -1.0, 0.0]])
    freq = jnp.asarray([1.0, 2.0, 1.0, 0.0])
    out = np.asarray(op(
        logits,
        [freq, None],
        presence_penalties=[0.5, 0.0],
        frequency_penalties=[0.25, 0.0],
        repetition_penalties=[2.0, 1.0],
        temps=[0.5, 2.0],
    ))
    # row 0: freq: [1.75,0.5,-1.25,0]; presence: [1.25,0,-1.75,0];
    # repetition (pos/2, neg*2, zero kept): [0.625,0,-3.5,0]; /0.5 temp
    np.testing.assert_allclose(out[0], [1.25, 0.0, -7.0, 0.0], rtol=1e-5, atol=1e-6)
    # row 1: only temperature
    np.testing.assert_allclose(out[1], [1.0, 0.5, -0.5, 0.0], rtol=1e-5, atol=1e-6)
