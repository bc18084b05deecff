"""Paged-attention shape-matrix tests.

Mirrors the reference's parametrized config grids
(tests/accuracy/operators/test_attention.py:86-92 decode grid,
:433-439 prefill grid): bf16, non-128-multiple head dims, long contexts
with big pages, MQA (1 kv head), zero-length sequences, chunked prefill
over pre-existing cache — every case checked against a float64 numpy
oracle under both GQA layouts.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mojo_opset_tpu as m

from ..utils import tols_for
from .test_attention import expand_np, gather_np, np_attention

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow

# (B, Hq, Hkv, D, max_seq, block_size, id) — reference decode grid
DECODE_GRID = [
    (8, 16, 4, 128, 1024, 32, "M_BF16"),
    (8, 16, 4, 96, 1024, 128, "M_BF16_PADDIM"),
    (4, 8, 1, 128, 4096, 512, "M_BF16_LONG"),
    (4, 8, 1, 128, 2048, 512, "M_BF16_BIGPAGE"),
    (8, 8, 1, 128, 0, 512, "M_BF16_PADSEQ"),
]

# (B, Hq, Hkv, D, max_q, max_cached, block_size, id) — reference prefill grid
PREFILL_GRID = [
    (2, 16, 4, 128, 256, 0, 32, "M_BF16"),
    (2, 16, 4, 96, 256, 0, 128, "M_BF16_PADDIM"),
    (2, 8, 1, 128, 512, 1024, 128, "M_BF16_WITH_CACHE"),
    (2, 8, 1, 128, 256, 512, 512, "M_BF16_BIGPAGE"),
    (2, 8, 1, 128, 0, 0, 512, "M_BF16_PADSEQ"),
]


def _rand_lens(rng, batch, max_len):
    if max_len == 0:
        return np.zeros((batch,), np.int32)
    lens = rng.integers(1, max_len + 1, (batch,)).astype(np.int32)
    lens[0] = max_len  # always cover the max
    return lens


def _paged_cache(rng, batch, lens, block_size, hkv, d, dtype):
    """Build caches + tables holding `lens[i]` tokens per sequence."""
    blocks_per_seq = [-(-int(l) // block_size) for l in lens]
    max_blocks = max(max(blocks_per_seq), 1)
    n_blocks = max(sum(blocks_per_seq), 1) + 1
    kc = rng.standard_normal((n_blocks, hkv, block_size, d)).astype(dtype)
    vc = rng.standard_normal((n_blocks, hkv, block_size, d)).astype(dtype)
    tables = np.full((batch, max_blocks), -1, np.int32)
    nxt = 0
    for i, nb in enumerate(blocks_per_seq):
        tables[i, :nb] = np.arange(nxt, nxt + nb)
        nxt += nb
    return kc, vc, tables


@pytest.mark.parametrize("layout", ["AABB", "ABAB"])
@pytest.mark.parametrize("B,Hq,Hkv,D,S,BS,case_id", DECODE_GRID)
def test_paged_decode_grid_vs_numpy(B, Hq, Hkv, D, S, BS, case_id, layout):
    rng = np.random.default_rng(hash((case_id, layout)) % 2**31)
    lens = _rand_lens(rng, B, S)
    kc, vc, tables = _paged_cache(rng, B, lens, BS, Hkv, D, np.float32)
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)

    op = m.MojoPagedDecodeGQA(gqa_layout=layout)
    out = np.asarray(
        op(
            jnp.asarray(q, jnp.bfloat16),
            jnp.asarray(kc, jnp.bfloat16),
            jnp.asarray(vc, jnp.bfloat16),
            jnp.asarray(lens, jnp.int32),
            jnp.asarray(tables, jnp.int32),
        ),
        dtype=np.float32,
    )

    scale = 1.0 / math.sqrt(D)
    group = Hq // Hkv
    for i in range(B):
        sl = int(lens[i])
        if sl == 0:
            assert np.all(out[i] == 0.0), f"{case_id}: zero-len row must be zeros"
            continue
        k_i = gather_np(kc, tables[i], sl)
        v_i = gather_np(vc, tables[i], sl)
        k_i = expand_np(k_i, group, layout)
        v_i = expand_np(v_i, group, layout)
        mask = np.ones((1, sl), bool)
        want = np_attention(q[i][:, None, :], k_i, v_i, mask, scale)[:, 0]
        np.testing.assert_allclose(out[i], want, atol=0.08, rtol=0.05)


@pytest.mark.parametrize("layout", ["AABB", "ABAB"])
@pytest.mark.parametrize("B,Hq,Hkv,D,QL,CL,BS,case_id", PREFILL_GRID)
def test_paged_prefill_grid_vs_numpy(B, Hq, Hkv, D, QL, CL, BS, case_id, layout):
    """Chunked prefill: new q tokens attend causally over cached + new KV."""
    rng = np.random.default_rng(hash((case_id, layout, 7)) % 2**31)
    q_lens = _rand_lens(rng, B, QL)
    if QL == 0:
        q_lens = np.maximum(q_lens, 1)  # at least one q token overall
        q_lens[1:] = 0
    ctx_lens = _rand_lens(rng, B, CL) if CL else np.zeros((B,), np.int32)
    total = q_lens + ctx_lens
    kc, vc, tables = _paged_cache(rng, B, total, BS, Hkv, D, np.float32)
    T = int(q_lens.sum())
    q = rng.standard_normal((T, Hq, D)).astype(np.float32)
    cu_q = np.concatenate([[0], np.cumsum(q_lens)]).astype(np.int32)
    cu_total = np.concatenate([[0], np.cumsum(total)]).astype(np.int32)

    op = m.MojoPagedPrefillGQA(gqa_layout=layout)
    out = np.asarray(
        op(
            jnp.asarray(q, jnp.bfloat16),
            jnp.asarray(kc, jnp.bfloat16),
            jnp.asarray(vc, jnp.bfloat16),
            jnp.asarray(cu_q, jnp.int32),
            jnp.asarray(tables, jnp.int32),
            None,
            jnp.asarray(cu_total, jnp.int32),
        ),
        dtype=np.float32,
    )

    scale = 1.0 / math.sqrt(D)
    group = Hq // Hkv
    for i in range(B):
        ql, tot = int(q_lens[i]), int(total[i])
        if ql == 0:
            continue
        k_i = expand_np(gather_np(kc, tables[i], tot), group, layout)
        v_i = expand_np(gather_np(vc, tables[i], tot), group, layout)
        q_i = np.transpose(q[cu_q[i] : cu_q[i + 1]], (1, 0, 2))  # (Hq, ql, D)
        # causal over the full context: q position j attends keys <= ctx+j
        ctx = tot - ql
        mask = np.arange(tot)[None, :] <= (ctx + np.arange(ql))[:, None]
        want = np_attention(q_i, k_i, v_i, mask, scale)
        got = np.transpose(out[cu_q[i] : cu_q[i + 1]], (1, 0, 2))
        np.testing.assert_allclose(got, want, atol=0.08, rtol=0.05)


@pytest.mark.parametrize("B,Hq,Hkv,D,S,BS,case_id", DECODE_GRID[:2])
def test_paged_decode_grid_tiers_match_golden(B, Hq, Hkv, D, S, BS, case_id):
    """Every registered non-ref tier reproduces the golden on the grid."""
    rng = np.random.default_rng(3)
    lens = _rand_lens(rng, B, S)
    kc, vc, tables = _paged_cache(rng, B, lens, BS, Hkv, D, np.float32)
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    args = (
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(kc, jnp.bfloat16),
        jnp.asarray(vc, jnp.bfloat16),
        jnp.asarray(lens, jnp.int32),
        jnp.asarray(tables, jnp.int32),
    )
    ref = m.MojoPagedDecodeGQA.get_backend_impl("ref")()
    want = np.asarray(ref(*args), np.float32)
    for tier in m.MojoPagedDecodeGQA.get_registered_backends():
        if tier == "ref":
            continue
        try:
            op = m.MojoPagedDecodeGQA.get_backend_impl(tier, strict=True)()
        except Exception:
            continue
        got = np.asarray(op(*args), np.float32)
        np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05, err_msg=f"tier={tier}")


def test_decode_matches_prefill_single_token_grid():
    """One-token prefill == decode on every grid geometry (consistency)."""
    for B, Hq, Hkv, D, S, BS, case_id in DECODE_GRID[:3]:
        rng = np.random.default_rng(11)
        lens = np.maximum(_rand_lens(rng, B, max(S, 1)), 1)
        kc, vc, tables = _paged_cache(rng, B, lens, BS, Hkv, D, np.float32)
        q = rng.standard_normal((B, Hq, D)).astype(np.float32)

        dec = m.MojoPagedDecodeGQA()
        out_d = np.asarray(dec(
            jnp.asarray(q, jnp.float32), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(lens, jnp.int32), jnp.asarray(tables, jnp.int32),
        ))

        pre = m.MojoPagedPrefillGQA()
        cu_q = jnp.asarray(np.arange(B + 1), jnp.int32)
        cu_total = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
        out_p = np.asarray(pre(
            jnp.asarray(q, jnp.float32), jnp.asarray(kc), jnp.asarray(vc),
            cu_q, jnp.asarray(tables, jnp.int32), None, cu_total,
        ))
        tol = tols_for(jnp.float32)
        np.testing.assert_allclose(out_d, out_p, atol=tol["atol"], rtol=tol["rtol"],
                                   err_msg=case_id)
