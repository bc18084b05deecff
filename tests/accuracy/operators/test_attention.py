"""Accuracy tests for the core attention suite.

Reference analogue: tests/accuracy/operators/test_attention.py (2338 LoC)
— here the golden is validated against numpy brute force, and every
non-ref tier is validated against the golden (forward_diff_with).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mojo_opset_tpu as m

from ..utils import make_paged_case, randn, tiers_of


def np_attention(q, k, v, mask, scale):
    """Brute force: q (Hq, Lq, D), k/v (Hq, Lk, D), mask (Lq, Lk) True=keep."""
    s = np.einsum("hqd,hkd->hqk", q.astype(np.float64), k.astype(np.float64)) * scale
    s = np.where(mask[None], s, -np.inf)
    mmax = np.max(s, axis=-1, keepdims=True)
    mmax = np.where(np.isfinite(mmax), mmax, 0.0)
    p = np.exp(s - mmax)
    denom = p.sum(-1, keepdims=True)
    p = np.where(denom > 0, p / np.maximum(denom, 1e-38), 0.0)
    return np.einsum("hqk,hkd->hqd", p, v.astype(np.float64))


def expand_np(kv, group, layout):
    # kv (Hkv, L, D) -> (Hq, L, D)
    if group == 1:
        return kv
    if layout == "AABB":
        return np.repeat(kv, group, axis=0)
    return np.tile(kv, (group, 1, 1))


def gather_np(cache, row, seq_len):
    """cache (N, Hkv, bs, D), row of block ids -> (Hkv, seq_len, D)."""
    bs = cache.shape[2]
    nb = -(-seq_len // bs)
    parts = [np.asarray(cache[int(row[j])]) for j in range(nb)]
    dense = np.concatenate(parts, axis=1)  # (Hkv, nb*bs, D)
    return dense[:, :seq_len]


@pytest.mark.parametrize("layout", ["AABB", "ABAB"])
def test_decode_gqa_vs_numpy(layout):
    B, Hq, Hkv, S, D = 3, 8, 2, 11, 16
    q = randn(0, (B, Hq, D))
    k = randn(1, (B, Hkv, S, D))
    v = randn(2, (B, Hkv, S, D))
    lens = jnp.array([11, 4, 0], jnp.int32)
    op = m.MojoDecodeGQA.get_backend_impl("ref")(gqa_layout=layout)
    out = op(q, k, v, lens)
    scale = 1.0 / np.sqrt(D)
    for i, sl in enumerate([11, 4, 0]):
        if sl == 0:
            np.testing.assert_allclose(np.asarray(out[i]), 0.0)
            continue
        ki = expand_np(np.asarray(k[i])[:, :sl], Hq // Hkv, layout)
        vi = expand_np(np.asarray(v[i])[:, :sl], Hq // Hkv, layout)
        want = np_attention(
            np.asarray(q[i])[:, None], ki, vi, np.ones((1, sl), bool), scale
        )[:, 0]
        np.testing.assert_allclose(np.asarray(out[i]), want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("layout", ["AABB", "ABAB"])
@pytest.mark.slow
def test_paged_decode_gqa_vs_numpy(layout):
    case = make_paged_case(seq_lens=(7, 1, 13))
    B = 3
    q = randn(3, (B, case["hq"], case["head_dim"]))
    op = m.MojoPagedDecodeGQA.get_backend_impl("ref")(gqa_layout=layout)
    out = op(q, case["key_cache"], case["value_cache"], case["seq_lens"], case["block_tables"])
    scale = 1.0 / np.sqrt(case["head_dim"])
    group = case["hq"] // case["hkv"]
    for i in range(B):
        sl = int(case["seq_lens"][i])
        ki = expand_np(gather_np(case["key_cache"], case["block_tables"][i], sl), group, layout)
        vi = expand_np(gather_np(case["value_cache"], case["block_tables"][i], sl), group, layout)
        want = np_attention(np.asarray(q[i])[:, None], ki, vi, np.ones((1, sl), bool), scale)[:, 0]
        np.testing.assert_allclose(np.asarray(out[i]), want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("layout", ["AABB", "ABAB"])
@pytest.mark.slow
def test_paged_prefill_gqa_vs_numpy(layout):
    case = make_paged_case(seq_lens=(7, 1, 13), q_lens=(5, 1, 6))
    q = randn(4, (case["total_q"], case["hq"], case["head_dim"]))
    op = m.MojoPagedPrefillGQA.get_backend_impl("ref")(gqa_layout=layout)
    out = op(
        q, case["key_cache"], case["value_cache"], case["cu_q_lens"], case["block_tables"],
        None, case["cu_total_seq_lens"],
    )
    scale = 1.0 / np.sqrt(case["head_dim"])
    group = case["hq"] // case["hkv"]
    cu = np.asarray(case["cu_q_lens"])
    for i in range(3):
        ql = int(case["q_lens"][i])
        sl = int(case["seq_lens"][i])
        qi = np.asarray(q[cu[i] : cu[i + 1]]).transpose(1, 0, 2)  # (Hq, ql, D)
        ki = expand_np(gather_np(case["key_cache"], case["block_tables"][i], sl), group, layout)
        vi = expand_np(gather_np(case["value_cache"], case["block_tables"][i], sl), group, layout)
        mask = np.tril(np.ones((ql, sl), bool), sl - ql)
        want = np_attention(qi, ki, vi, mask, scale).transpose(1, 0, 2)
        np.testing.assert_allclose(np.asarray(out[cu[i] : cu[i + 1]]), want, atol=2e-5, rtol=2e-5)


def test_paged_prefill_tiers_match_ref():
    case = make_paged_case(seq_lens=(7, 1, 13), q_lens=(5, 1, 6))
    q = randn(4, (case["total_q"], case["hq"], case["head_dim"]))
    args = (
        q, case["key_cache"], case["value_cache"], case["cu_q_lens"], case["block_tables"],
        None, case["cu_total_seq_lens"],
    )
    ref = m.MojoPagedPrefillGQA.get_backend_impl("ref")()
    for tier in tiers_of(m.MojoPagedPrefillGQA):
        op = m.MojoPagedPrefillGQA.get_backend_impl(tier)()
        op.forward_diff_with(ref, *args, atol=1e-4, rtol=1e-4)


def test_paged_decode_tiers_match_ref():
    case = make_paged_case(seq_lens=(9, 2, 16))
    q = randn(5, (3, case["hq"], case["head_dim"]))
    args = (q, case["key_cache"], case["value_cache"], case["seq_lens"], case["block_tables"])
    ref = m.MojoPagedDecodeGQA.get_backend_impl("ref")()
    for tier in tiers_of(m.MojoPagedDecodeGQA):
        op = m.MojoPagedDecodeGQA.get_backend_impl(tier)()
        op.forward_diff_with(ref, *args, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_prefill_gqa_padded():
    B, Hq, Hkv, S, D = 2, 4, 2, 8, 16
    q = randn(0, (B, Hq, S, D))
    k = randn(1, (B, Hkv, S, D))
    v = randn(2, (B, Hkv, S, D))
    cu = jnp.array([0, S, 2 * S], jnp.int32)
    op = m.MojoPrefillGQA.get_backend_impl("ref")(gqa_layout="ABAB")
    out = op(q, k, v, cu)
    assert out.shape == (B, S, Hq, D)
    scale = 1.0 / np.sqrt(D)
    for b in range(B):
        ki = expand_np(np.asarray(k[b]), Hq // Hkv, "ABAB")
        vi = expand_np(np.asarray(v[b]), Hq // Hkv, "ABAB")
        want = np_attention(np.asarray(q[b]), ki, vi, np.tril(np.ones((S, S), bool)), scale)
        np.testing.assert_allclose(
            np.asarray(out[b]), want.transpose(1, 0, 2), atol=2e-5, rtol=2e-5
        )


def test_sdpa_gqa_and_mask():
    B, Hq, Hkv, S, D = 2, 4, 2, 6, 8
    q = randn(0, (B, Hq, S, D))
    k = randn(1, (B, Hkv, S, D))
    v = randn(2, (B, Hkv, S, D))
    mask = jnp.tril(jnp.ones((S, S), bool))
    op = m.MojoSdpa.get_backend_impl("ref")(enable_gqa=True)
    out = op(q, k, v, attn_mask=mask)
    scale = 1.0 / np.sqrt(D)
    for b in range(B):
        ki = np.repeat(np.asarray(k[b]), 2, axis=0)
        vi = np.repeat(np.asarray(v[b]), 2, axis=0)
        want = np_attention(np.asarray(q[b]), ki, vi, np.asarray(mask), scale)
        np.testing.assert_allclose(np.asarray(out[b]), want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("local,glob", [(4, None), (None, 3), (4, 3), (None, None)])
@pytest.mark.slow
def test_swa_dense_window(local, glob):
    Hq, Hkv, D = 4, 2, 8
    q_lens, kv_lens = (5, 3), (9, 7)
    T, Tk = sum(q_lens), sum(kv_lens)
    q = randn(0, (T, Hq, D))
    k = randn(1, (Tk, Hkv, D))
    v = randn(2, (Tk, Hkv, D))
    cu_q = jnp.array([0, 5, 8], jnp.int32)
    cu_kv = jnp.array([0, 9, 16], jnp.int32)
    op = m.MojoSWA.get_backend_impl("ref")(
        local_window_size=local, global_window_size=glob
    )
    out = op(q, k, v, cu_q, cu_kv)
    scale = 1.0 / np.sqrt(D)
    for i in range(2):
        ql, kl = q_lens[i], kv_lens[i]
        qi = np.asarray(q[int(cu_q[i]) : int(cu_q[i + 1])]).transpose(1, 0, 2)
        ki = expand_np(np.asarray(k[int(cu_kv[i]) : int(cu_kv[i + 1])]).transpose(1, 0, 2), 2, "AABB")
        vi = expand_np(np.asarray(v[int(cu_kv[i]) : int(cu_kv[i + 1])]).transpose(1, 0, 2), 2, "AABB")
        off = kl - ql
        rows = np.arange(ql)[:, None] + off
        cols = np.arange(kl)[None, :]
        mask = rows >= cols
        if local is not None or glob is not None:
            lm = (rows <= cols + local) if local is not None else np.zeros_like(mask)
            gm = np.broadcast_to(cols < glob, mask.shape) if glob is not None else np.zeros_like(mask)
            mask = mask & (lm | gm)
        want = np_attention(qi, ki, vi, mask, scale).transpose(1, 0, 2)
        np.testing.assert_allclose(
            np.asarray(out[int(cu_q[i]) : int(cu_q[i + 1])]), want, atol=2e-5, rtol=2e-5
        )


@pytest.mark.slow
def test_paged_swa_prefill_and_decode():
    case = make_paged_case(seq_lens=(7, 13), q_lens=(5, 6), batch=2)
    q = randn(4, (case["total_q"], case["hq"], case["head_dim"]))
    pre = m.MojoPagedPrefillSWA.get_backend_impl("ref")(local_window_size=4)
    out = pre(
        q, case["key_cache"], case["value_cache"], case["cu_q_lens"], case["block_tables"],
        None, case["cu_total_seq_lens"],
    )
    assert out.shape == q.shape

    qd = randn(5, (2, case["hq"], case["head_dim"]))
    dec = m.MojoPagedDecodeSWA.get_backend_impl("ref")(local_window_size=4)
    outd = dec(qd, case["key_cache"], case["value_cache"], case["seq_lens"][:2], case["block_tables"][:2])
    assert outd.shape == qd.shape
    # decode with a local window == attend only to the last (local+1) tokens
    scale = 1.0 / np.sqrt(case["head_dim"])
    group = case["hq"] // case["hkv"]
    for i in range(2):
        sl = int(case["seq_lens"][i])
        ki = expand_np(gather_np(case["key_cache"], case["block_tables"][i], sl), group, "AABB")
        vi = expand_np(gather_np(case["value_cache"], case["block_tables"][i], sl), group, "AABB")
        mask = np.zeros((1, sl), bool)
        mask[0, max(0, sl - 1 - 4) :] = True
        want = np_attention(np.asarray(qd[i])[:, None], ki, vi, mask, scale)[:, 0]
        np.testing.assert_allclose(np.asarray(outd[i]), want, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_xla_swa_matches_golden():
    """Chunked online-softmax SWA tier vs the dense golden, across window
    configs and varlen batches (chunk boundary at 256 exercised)."""
    import itertools

    T_lens, kv_lens = (300, 200), (300, 260)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(T_lens)]), jnp.int32)
    cu_kv = jnp.asarray(np.concatenate([[0], np.cumsum(kv_lens)]), jnp.int32)
    T, Tk = int(cu_q[-1]), int(cu_kv[-1])
    q = randn(0, (T, 8, 32))
    k = randn(1, (Tk, 2, 32))
    v = randn(2, (Tk, 2, 32))
    for local, glob in [(64, None), (None, 32), (64, 32), (None, None)]:
        ref = m.MojoSWA.get_backend_impl("ref")(
            local_window_size=local, global_window_size=glob)
        xla = m.MojoSWA.get_backend_impl("xla")(
            local_window_size=local, global_window_size=glob)
        want = ref(q, k, v, cu_q, cu_kv)
        got = xla(q, k, v, cu_q, cu_kv)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5,
            err_msg=f"local={local} glob={glob}",
        )
