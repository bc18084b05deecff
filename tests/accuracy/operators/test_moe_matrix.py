"""MoE chain property matrix vs brute-force numpy oracles.

Reference analogue: tests/accuracy/operators/test_moe.py +
test_moe_quant.py (654 LoC combined).  The whole chain is checked against
a dense per-token oracle (every token through its top-k experts
explicitly), plus structural invariants the models rely on: gate
renormalization, the unordered-bucket dispatch contract, dispatch→combine
roundtrip identity, expert-permutation equivariance, and quantized-MoE
error bounds vs the fp pipeline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m

from ..utils import randn


def _dense_moe_oracle(x, gate_w, up_w, down_w, top_k):
    """Per-token brute force in float64: softmax gate -> top-k ->
    renormalize -> SwiGLU experts -> weighted sum."""
    x64 = np.asarray(x, np.float64)
    logits = x64 @ np.asarray(gate_w, np.float64)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.zeros_like(x64)
    for t in range(x64.shape[0]):
        idx = np.argsort(-p[t], kind="stable")[:top_k]
        gates = p[t, idx] / p[t, idx].sum()
        for g, e in zip(gates, idx):
            # torch Linear layout: up (2I, H), down (H, I)
            h = x64[t] @ np.asarray(up_w[e], np.float64).T  # (2I)
            gate_h, up_h = np.split(h, 2)
            act = gate_h / (1 + np.exp(-gate_h)) * up_h
            out[t] += g * (act @ np.asarray(down_w[e], np.float64).T)
    return out


@pytest.mark.parametrize("seed,E,K", [(0, 4, 2), (1, 8, 3), (2, 2, 1), (3, 6, 6)])
@pytest.mark.slow
def test_moe_matches_dense_oracle(seed, E, K):
    T, H, I = 7, 8, 16
    moe = m.MojoMoE.get_backend_impl("xla")(E, K, H, I, key=jax.random.PRNGKey(seed))
    x = randn(seed, (T, H))
    got = np.asarray(moe(x), np.float64)
    want = _dense_moe_oracle(x, moe.gating.gate_weight, moe.experts.up_proj_weight,
                             moe.experts.down_proj_weight, K)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gating_renormalizes_topk_to_one():
    op = m.MojoMoEGating(hidden_size=8, num_experts=6, top_k=3, key=jax.random.PRNGKey(0))
    idx, gates = op(randn(0, (5, 8)))
    assert idx.dtype == jnp.int32 and gates.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(gates).sum(-1), np.ones(5), rtol=1e-6)
    # indices are distinct per token
    for row in np.asarray(idx):
        assert len(set(row.tolist())) == len(row)


def test_gating_fp32_math_under_bf16_input():
    op = m.MojoMoEGating(hidden_size=64, num_experts=4, top_k=2, key=jax.random.PRNGKey(1))
    x = randn(0, (6, 64))
    i32, g32 = op(x)
    i16, g16 = op(x.astype(jnp.bfloat16))
    # gate math in fp32: indices agree, gates close despite bf16 input
    np.testing.assert_array_equal(np.asarray(i32), np.asarray(i16))
    np.testing.assert_allclose(np.asarray(g32), np.asarray(g16), atol=2e-2)


def test_dispatch_combine_roundtrip_is_identity():
    """With identity experts, combine(dispatch(x)) == x (gates renormalize
    to 1) — the structural contract of the chain."""
    E, K, T, H = 5, 2, 6, 8
    gating = m.MojoMoEGating(hidden_size=H, num_experts=E, top_k=K,
                             key=jax.random.PRNGKey(2))
    dispatch = m.MojoMoEDispatch(num_experts=E)
    combine = m.MojoMoECombine()
    x = randn(0, (T, H))
    idx, gates = gating(x)
    sorted_h, per_expert, sorted_g, tok_idx = dispatch(x, gates, idx)
    assert int(np.asarray(per_expert).sum()) == T * K
    out = combine(jnp.zeros_like(x), sorted_h, sorted_g, tok_idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_dispatch_buckets_sorted_by_expert():
    """Tokens are grouped by expert id; bucket-internal order is
    explicitly UNORDERED (reference moe.py:367-373) — so only compare
    bucket membership sets."""
    E, K, T, H = 3, 2, 5, 4
    gating = m.MojoMoEGating(hidden_size=H, num_experts=E, top_k=K,
                             key=jax.random.PRNGKey(3))
    dispatch = m.MojoMoEDispatch(num_experts=E)
    x = randn(1, (T, H))
    idx, gates = gating(x)
    sorted_h, per_expert, _sg, tok_idx = dispatch(x, gates, idx)
    idx_np = np.asarray(idx)
    starts = np.concatenate([[0], np.cumsum(np.asarray(per_expert))])
    for e in range(E):
        want_tokens = {t for t in range(T) if e in idx_np[t]}
        got_tokens = set(np.asarray(tok_idx)[starts[e]:starts[e + 1]].tolist())
        assert got_tokens == want_tokens, f"expert {e}"
        # and rows carry the right hidden states
        for r in range(int(starts[e]), int(starts[e + 1])):
            t = int(np.asarray(tok_idx)[r])
            np.testing.assert_allclose(np.asarray(sorted_h[r]), np.asarray(x[t]),
                                       rtol=1e-6)


def test_moe_expert_permutation_equivariance():
    """Permuting experts (gate cols + weight rows together) must not change
    the output."""
    E, K, T, H, I = 4, 2, 6, 8, 16
    moe = m.MojoMoE.get_backend_impl("xla")(E, K, H, I, key=jax.random.PRNGKey(4))
    x = randn(2, (T, H))
    base = np.asarray(moe(x))
    perm = np.array([2, 0, 3, 1])
    moe_p = moe.replace(
        gating=moe.gating.replace(gate_weight=moe.gating.gate_weight[:, perm]),
        experts=moe.experts.replace(
            up_proj_weight=moe.experts.up_proj_weight[perm],
            down_proj_weight=moe.experts.down_proj_weight[perm],
        ),
    )
    np.testing.assert_allclose(np.asarray(moe_p(x)), base, rtol=1e-4, atol=1e-5)


def test_moe_single_expert_reduces_to_mlp():
    """E=1, K=1: MoE must equal a plain SwiGLU MLP with the same weights."""
    T, H, I = 5, 8, 16
    moe = m.MojoMoE.get_backend_impl("xla")(1, 1, H, I, key=jax.random.PRNGKey(5))
    x = randn(3, (T, H))
    got = np.asarray(moe(x), np.float64)
    h = np.asarray(x, np.float64) @ np.asarray(moe.experts.up_proj_weight[0], np.float64).T
    gate_h, up_h = np.split(h, 2, -1)
    act = gate_h / (1 + np.exp(-gate_h)) * up_h
    want = act @ np.asarray(moe.experts.down_proj_weight[0], np.float64).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_experts_empty_bucket_rows_are_zero_cost():
    """Experts with zero tokens must not corrupt neighbors' outputs."""
    E, H, I = 3, 8, 16
    experts = m.MojoExperts.get_backend_impl("xla")(
        num_experts=E, hidden_size=H, intermediate_size=I, key=jax.random.PRNGKey(6))
    x = randn(4, (4, H))
    # all 4 tokens to expert 2
    out = experts(x, jnp.asarray([0, 0, 4], jnp.int32))
    w_up = np.asarray(experts.up_proj_weight[2], np.float64)
    w_dn = np.asarray(experts.down_proj_weight[2], np.float64)
    h = np.asarray(x, np.float64) @ w_up.T
    g, u = np.split(h, 2, -1)
    want = (g / (1 + np.exp(-g)) * u) @ w_dn.T
    np.testing.assert_allclose(np.asarray(out, np.float64), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("w_dtype", ["int8", "int4"])
def test_quant_moe_tracks_fp_moe(w_dtype):
    """QuantMoE with weights quantized FROM the fp MoE's weights must stay
    within per-channel quantization error of the fp output."""
    E, K, T, H, I = 4, 2, 6, 16, 32
    fp = m.MojoMoE.get_backend_impl("xla")(E, K, H, I, key=jax.random.PRNGKey(7))
    x = randn(5, (T, H), scale=0.5)
    want = np.asarray(fp(x), np.float64)

    qmoe = m.MojoQuantMoE.get_backend_impl("xla")(
        E, K, H, I, up_weight_dtype=w_dtype, down_weight_dtype=w_dtype,
        key=jax.random.PRNGKey(7))
    # quantize fp weights per-(expert, out-channel): weight (E, out, in)
    lim = 7.0 if w_dtype == "int4" else 127.0

    def q(w):
        w = np.asarray(w)
        scale = np.abs(w).max(2, keepdims=True) / lim  # (E, out, 1)
        codes = np.clip(np.round(w / scale), -lim - 1, lim)
        return codes, scale[:, :, 0]

    up_c, up_s = q(fp.experts.up_proj_weight)
    dn_c, dn_s = q(fp.experts.down_proj_weight)
    up_stored, dn_stored = up_c, dn_c
    if w_dtype == "int4":
        def pack(c):
            lo = c[:, 0::2].astype(np.int8)
            hi = c[:, 1::2].astype(np.int8)
            return ((hi.astype(np.uint8) << 4) | (lo.astype(np.uint8) & 0xF)).astype(np.int8)

        up_stored, dn_stored = pack(up_c), pack(dn_c)
    qmoe = qmoe.replace(
        gating=qmoe.gating.replace(gate_weight=fp.gating.gate_weight),
        experts=qmoe.experts.replace(
            up_proj_weight=jnp.asarray(up_stored, jnp.int8),
            down_proj_weight=jnp.asarray(dn_stored, jnp.int8),
            up_proj_weight_scale=jnp.asarray(up_s, jnp.bfloat16),
            down_proj_weight_scale=jnp.asarray(dn_s, jnp.bfloat16),
        ),
    )
    got = np.asarray(qmoe(x), np.float64)

    def rel_rms(a, b):
        return np.sqrt(((a - b) ** 2).mean()) / (np.sqrt((b**2).mean()) + 1e-9)

    # the sharp check: the quant pipeline must match the fp pipeline run
    # with the DEQUANTIZED weights (isolates plumbing from inherent
    # weight-quantization noise, which dominates for random int4 weights)
    ideal = fp.replace(experts=fp.experts.replace(
        up_proj_weight=jnp.asarray(up_c * up_s[:, :, None], jnp.float32),
        down_proj_weight=jnp.asarray(dn_c * dn_s[:, :, None], jnp.float32),
    ))
    want_ideal = np.asarray(ideal(x), np.float64)
    assert rel_rms(got, want_ideal) < 0.03, f"{w_dtype} plumbing error"
    # and the loose sanity bound vs the original fp weights
    loose = 0.25 if w_dtype == "int4" else 0.05
    assert rel_rms(got, want) < loose, f"{w_dtype} total quant error"
