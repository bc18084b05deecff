"""Randomized property matrix for the paged-KV store stack.

Reference analogue: tests/accuracy/operators/test_kv_cache.py (825 LoC —
shape matrices over batch/block-size/context/q-len combinations for the
chunk planner and every store op). Here the matrix is driven by a
token-by-token numpy oracle: for each random configuration the oracle
writes every (sequence, position) pair individually; all vectorized
paths — chunk-metadata plan, per-token jittable plan, the store ops in
both cache layouts and experimental variants — must agree with it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m
from ..utils import seed_split
import mojo_opset_tpu.experimental as exp
from mojo_opset_tpu.core.operators.kv_cache import (
    build_paged_kv_chunk_metadata,
    build_paged_kv_token_indices,
)


def _random_case(rng, decode=False, allow_zero_q=True):
    """A random paged-store configuration with adversarial features:
    zero-length queries, zero context, block-boundary contexts, unused
    table slots (-1), multi-block spans."""
    batch = int(rng.integers(1, 5))
    block_size = int(rng.choice([2, 4, 8, 16]))
    max_blocks = int(rng.integers(2, 7))
    ctx_choices = [0, 1, block_size - 1, block_size, 2 * block_size]
    ctx = np.array(
        [min(int(rng.choice(ctx_choices)), (max_blocks - 1) * block_size) for _ in range(batch)],
        np.int32,
    )
    if decode:
        q_lens = np.ones(batch, np.int32)
    else:
        hi = 2 * block_size + 2
        q_lens = np.array([int(rng.integers(0 if allow_zero_q else 1, hi)) for _ in range(batch)],
                          np.int32)
        # clamp so ctx+q fits the table
        q_lens = np.minimum(q_lens, max_blocks * block_size - ctx).astype(np.int32)
    # block table: enough real blocks for each row, rest -1
    table = np.full((batch, max_blocks), -1, np.int32)
    nxt = 0
    for b in range(batch):
        need = -(-(int(ctx[b]) + int(q_lens[b])) // block_size)
        need = max(need, 1)
        table[b, :need] = np.arange(nxt, nxt + need)
        nxt += need
    n_blocks = nxt + 2
    return dict(batch=batch, block_size=block_size, table=table, ctx=ctx,
                q_lens=q_lens, n_blocks=n_blocks)


def _oracle_positions(case, decode):
    """(token, dst_block, dst_offset) triples written token-by-token."""
    out = []
    t = 0
    for b in range(case["batch"]):
        n_new = 1 if decode else int(case["q_lens"][b])
        for i in range(n_new):
            pos = int(case["ctx"][b]) + i
            logical = pos // case["block_size"]
            if logical < case["table"].shape[1]:
                phys = int(case["table"][b, logical])
                if phys >= 0:
                    out.append((t, phys, pos % case["block_size"]))
            t += 1
    return out


@pytest.mark.parametrize("seed", seed_split(3, 12))
@pytest.mark.parametrize("decode", [False, True])
def test_token_plan_matches_oracle(seed, decode):
    rng = np.random.default_rng(seed)
    case = _random_case(rng, decode=decode)
    cu = None if decode else jnp.asarray(
        np.concatenate([[0], np.cumsum(case["q_lens"])]), jnp.int32)
    T = case["batch"] if decode else int(case["q_lens"].sum())
    if T == 0:
        pytest.skip("empty token batch")
    dst_block, dst_offset = build_paged_kv_token_indices(
        jnp.asarray(case["table"]), cu, jnp.asarray(case["ctx"]), case["block_size"], T
    )
    got = {(t, int(dst_block[t]), int(dst_offset[t]))
           for t in range(T) if int(dst_block[t]) >= 0}
    want = set(_oracle_positions(case, decode))
    assert got == want


@pytest.mark.parametrize("seed", seed_split(3, 8))
@pytest.mark.parametrize("decode", [False, True])
def test_chunk_metadata_covers_exactly_the_oracle_tokens(seed, decode):
    """Chunk rows, expanded, must cover exactly the oracle's writes —
    compared as SETS (the reference's explicit unordered contract,
    kv_cache.py:33-101)."""
    rng = np.random.default_rng(100 + seed)
    case = _random_case(rng, decode=decode)
    cu = None if decode else jnp.asarray(
        np.concatenate([[0], np.cumsum(case["q_lens"])]), jnp.int32)
    meta = np.asarray(build_paged_kv_chunk_metadata(
        jnp.asarray(case["table"]), cu, jnp.asarray(case["ctx"]), case["block_size"]))
    expanded = set()
    for src, blk, off, ln in meta:
        assert ln >= 1
        assert 0 <= off and off + ln <= case["block_size"]  # chunks never cross blocks
        for i in range(ln):
            expanded.add((int(src + i), int(blk), int(off + i)))
    assert expanded == set(_oracle_positions(case, decode))


@pytest.mark.parametrize("seed", seed_split(2, 6))
@pytest.mark.parametrize("kv_layout", ["HND", "NHD"])
# float16 exercises the block-window merge store (XLA tier; TPU has no
# native f16 — backends/xla/operators/kv_cache.py _f16_block_merge_store);
# equality must stay EXACT — the merge moves rows, never converts values
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.float16])
def test_store_matches_oracle(seed, kv_layout, dtype):
    rng = np.random.default_rng(200 + seed)
    case = _random_case(rng, decode=False)
    T = int(case["q_lens"].sum())
    if T == 0:
        pytest.skip("empty token batch")
    hkv, d = 2, 8
    bs = case["block_size"]
    k_new = jnp.asarray(rng.standard_normal((T, hkv, d)), dtype)
    v_new = jnp.asarray(rng.standard_normal((T, hkv, d)), dtype)
    shape = ((case["n_blocks"], hkv, bs, d) if kv_layout == "HND"
             else (case["n_blocks"], bs, hkv, d))
    k_cache = jnp.asarray(rng.standard_normal(shape), dtype)
    v_cache = jnp.asarray(rng.standard_normal(shape), dtype)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(case["q_lens"])]), jnp.int32)

    op = m.MojoStorePagedKVCache(kv_layout=kv_layout)
    got_k, got_v = op(k_new, v_new, k_cache, v_cache, jnp.asarray(case["table"]),
                      cu, jnp.asarray(case["ctx"]))

    want_k, want_v = np.asarray(k_cache, np.float32), np.asarray(v_cache, np.float32)
    want_k, want_v = want_k.copy(), want_v.copy()
    for t, blk, off in _oracle_positions(case, decode=False):
        if kv_layout == "HND":
            want_k[blk, :, off, :] = np.asarray(k_new[t], np.float32)
            want_v[blk, :, off, :] = np.asarray(v_new[t], np.float32)
        else:
            want_k[blk, off, :, :] = np.asarray(k_new[t], np.float32)
            want_v[blk, off, :, :] = np.asarray(v_new[t], np.float32)
    np.testing.assert_array_equal(np.asarray(got_k, np.float32), want_k)
    np.testing.assert_array_equal(np.asarray(got_v, np.float32), want_v)


@pytest.mark.parametrize("seed", seed_split(2, 4))
def test_store_chunk_metadata_path_matches_legacy_path(seed):
    rng = np.random.default_rng(300 + seed)
    case = _random_case(rng, decode=False)
    T = int(case["q_lens"].sum())
    if T == 0:
        pytest.skip("empty token batch")
    hkv, d = 2, 4
    k_new = jnp.asarray(rng.standard_normal((T, hkv, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((T, hkv, d)), jnp.float32)
    k_cache = jnp.zeros((case["n_blocks"], hkv, case["block_size"], d))
    v_cache = jnp.zeros_like(k_cache)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(case["q_lens"])]), jnp.int32)
    table = jnp.asarray(case["table"])
    ctx = jnp.asarray(case["ctx"])

    op = m.MojoStorePagedKVCache()
    k1, v1 = op(k_new, v_new, k_cache, v_cache, table, cu, ctx)
    meta = build_paged_kv_chunk_metadata(table, cu, ctx, case["block_size"])
    k2, v2 = op(k_new, v_new, k_cache, v_cache, chunk_metadata=meta)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


@pytest.mark.parametrize("seed", seed_split(2, 4))
def test_c8_store_quantizes_at_oracle_positions(seed):
    rng = np.random.default_rng(400 + seed)
    case = _random_case(rng, decode=False, allow_zero_q=False)
    T = int(case["q_lens"].sum())
    hkv, d = 2, 4
    bs = case["block_size"]
    k_new = jnp.asarray(rng.standard_normal((T, hkv, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((T, hkv, d)), jnp.float32)
    k_scale = jnp.asarray(rng.uniform(0.02, 0.1, (hkv, d)), jnp.float32)
    v_scale = jnp.asarray(rng.uniform(0.02, 0.1, (hkv, d)), jnp.float32)
    k_cache = jnp.zeros((case["n_blocks"], hkv, bs, d), jnp.int8)
    v_cache = jnp.zeros_like(k_cache)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(case["q_lens"])]), jnp.int32)

    op = exp.MojoStorePagedKVCacheC8()
    got_k, got_v = op(k_new, v_new, k_cache, v_cache, k_scale, v_scale,
                      jnp.asarray(case["table"]), cu, jnp.asarray(case["ctx"]))
    want_k = np.zeros(k_cache.shape, np.int8)
    want_v = np.zeros_like(want_k)
    qk = np.clip(np.round(np.asarray(k_new) / np.asarray(k_scale)), -128, 127).astype(np.int8)
    qv = np.clip(np.round(np.asarray(v_new) / np.asarray(v_scale)), -128, 127).astype(np.int8)
    for t, blk, off in _oracle_positions(case, decode=False):
        want_k[blk, :, off, :] = qk[t]
        want_v[blk, :, off, :] = qv[t]
    np.testing.assert_array_equal(np.asarray(got_k), want_k)
    np.testing.assert_array_equal(np.asarray(got_v), want_v)


@pytest.mark.parametrize("seed", seed_split(2, 4))
def test_mla_store_matches_oracle_with_lane_padded_rope_cache(seed):
    rng = np.random.default_rng(500 + seed)
    case = _random_case(rng, decode=True)
    B = case["batch"]
    r, dr, pad = 6, 4, 4  # rope cache lane-padded beyond dr
    bs = case["block_size"]
    c_new = jnp.asarray(rng.standard_normal((B, r)), jnp.float32)
    pe_new = jnp.asarray(rng.standard_normal((B, dr)), jnp.float32)
    c_cache = jnp.zeros((case["n_blocks"], 1, bs, r))
    pe_cache = jnp.zeros((case["n_blocks"], 1, bs, dr + pad))

    op = exp.MojoStorePagedMLAKVCache()
    got_c, got_pe = op(c_new, pe_new, c_cache, pe_cache, jnp.asarray(case["table"]),
                       None, jnp.asarray(case["ctx"]))
    want_c = np.zeros(c_cache.shape, np.float32)
    want_pe = np.zeros(pe_cache.shape, np.float32)
    for t, blk, off in _oracle_positions(case, decode=True):
        want_c[blk, 0, off, :] = np.asarray(c_new[t])
        want_pe[blk, 0, off, :dr] = np.asarray(pe_new[t])
    np.testing.assert_array_equal(np.asarray(got_c), want_c)
    np.testing.assert_array_equal(np.asarray(got_pe), want_pe)


def test_store_lowrank_matches_oracle():
    rng = np.random.default_rng(0)
    B, N, S, D, T = 3, 2, 8, 4, 5
    cache = jnp.asarray(rng.standard_normal((B, N, S, D)), jnp.float32)
    key_lr = jnp.asarray(rng.standard_normal((T + 2, N, D)), jnp.float32)
    blocks = jnp.asarray([0, 2, 1, 0, 2, 9, 9], jnp.int32)  # beyond T ignored
    tokens = jnp.asarray([1, 7, 3, 2, 0, 5, 5], jnp.int32)
    got = exp.MojoStoreLowrank()(cache, key_lr, blocks, tokens, token_num=T)
    want = np.asarray(cache).copy()
    for t in range(T):
        want[int(blocks[t]), :, int(tokens[t]), :] = np.asarray(key_lr[t])
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.slow
def test_store_then_attend_consistency_random_matrix():
    """End-to-end: after a random store, paged decode over the cache must
    equal dense attention over the oracle-reconstructed K/V."""
    rng = np.random.default_rng(7)
    for seed in range(3):
        case = _random_case(rng, decode=False, allow_zero_q=False)
        hq, hkv, d = 4, 2, 8
        bs = case["block_size"]
        # context must be zero for dense reconstruction simplicity
        case["ctx"][:] = 0
        T = int(case["q_lens"].sum())
        k_new = jnp.asarray(rng.standard_normal((T, hkv, d)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((T, hkv, d)), jnp.float32)
        k_cache = jnp.zeros((case["n_blocks"], hkv, bs, d))
        v_cache = jnp.zeros_like(k_cache)
        cu = np.concatenate([[0], np.cumsum(case["q_lens"])])
        k_cache, v_cache = m.MojoStorePagedKVCache()(
            k_new, v_new, k_cache, v_cache, jnp.asarray(case["table"]),
            jnp.asarray(cu, jnp.int32), jnp.asarray(case["ctx"]))

        q = jnp.asarray(rng.standard_normal((case["batch"], hq, d)), jnp.float32)
        lens = jnp.asarray(case["q_lens"], jnp.int32)
        got = np.asarray(m.MojoPagedDecodeGQA()(q, k_cache, v_cache, lens,
                                                jnp.asarray(case["table"])))
        for b in range(case["batch"]):
            L = int(case["q_lens"][b])
            kb = np.asarray(k_new[cu[b]:cu[b] + L])  # (L, hkv, d)
            vb = np.asarray(v_new[cu[b]:cu[b] + L])
            kq = np.repeat(kb, hq // hkv, axis=1)
            vq = np.repeat(vb, hq // hkv, axis=1)
            scores = np.einsum("hd,lhd->hl", np.asarray(q[b]), kq) / np.sqrt(d)
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            want_b = np.einsum("hl,lhd->hd", p, vq)
            np.testing.assert_allclose(got[b], want_b, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed", seed_split(2, 4))
@pytest.mark.parametrize("kv_layout", ["HND", "NHD"])
def test_store_decode_path_f16_matches_oracle(seed, kv_layout):
    """Decode (cu_q_lens=None) through the f16 block-window merge store."""
    rng = np.random.default_rng(400 + seed)
    case = _random_case(rng, decode=True)
    B = case["batch"]
    hkv, d = 2, 8
    bs = case["block_size"]
    k_new = jnp.asarray(rng.standard_normal((B, hkv, d)), jnp.float16)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, d)), jnp.float16)
    shape = ((case["n_blocks"], hkv, bs, d) if kv_layout == "HND"
             else (case["n_blocks"], bs, hkv, d))
    k_cache = jnp.asarray(rng.standard_normal(shape), jnp.float16)
    v_cache = jnp.asarray(rng.standard_normal(shape), jnp.float16)

    op = m.MojoStorePagedKVCache(kv_layout=kv_layout)
    got_k, got_v = op(k_new, v_new, k_cache, v_cache, jnp.asarray(case["table"]),
                      None, jnp.asarray(case["ctx"]))

    want_k = np.asarray(k_cache, np.float32).copy()
    want_v = np.asarray(v_cache, np.float32).copy()
    for t, blk, off in _oracle_positions(case, decode=True):
        if kv_layout == "HND":
            want_k[blk, :, off, :] = np.asarray(k_new[t], np.float32)
            want_v[blk, :, off, :] = np.asarray(v_new[t], np.float32)
        else:
            want_k[blk, off, :, :] = np.asarray(k_new[t], np.float32)
            want_v[blk, off, :, :] = np.asarray(v_new[t], np.float32)
    np.testing.assert_array_equal(np.asarray(got_k, np.float32), want_k)
    np.testing.assert_array_equal(np.asarray(got_v, np.float32), want_v)


@pytest.mark.parametrize("kv_layout", ["HND", "NHD"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float16])
def test_invalid_tokens_never_touch_the_last_block(kv_layout, dtype):
    """Regression: dst_block=-1 under mode='drop' WRAPS to the last cache
    row (Python negative indexing happens before the drop filter), so
    invalid tokens used to corrupt block N-1 silently."""
    hkv, d, bs, nb = 2, 8, 4, 6
    rng = np.random.default_rng(7)
    # 5 tokens but the table only covers 1 block of 4 -> token 4 invalid;
    # also a -1 table slot in range
    table = jnp.asarray([[1, -1]], jnp.int32)
    ctx = jnp.asarray([0], jnp.int32)
    cu = jnp.asarray([0, 5], jnp.int32)
    k_new = jnp.asarray(rng.standard_normal((5, hkv, d)), dtype)
    v_new = jnp.asarray(rng.standard_normal((5, hkv, d)), dtype)
    shape = (nb, hkv, bs, d) if kv_layout == "HND" else (nb, bs, hkv, d)
    k_cache = jnp.asarray(rng.standard_normal(shape), dtype)
    v_cache = jnp.asarray(rng.standard_normal(shape), dtype)
    for tier in ("ref", "xla"):
        op = m.MojoStorePagedKVCache.get_backend_impl(tier)(kv_layout=kv_layout)
        got_k, got_v = op(k_new, v_new, k_cache, v_cache, table, cu, ctx)
        # block 1 written with tokens 0..3; every OTHER block untouched
        np.testing.assert_array_equal(np.asarray(got_k[0]), np.asarray(k_cache[0]))
        np.testing.assert_array_equal(
            np.asarray(got_k[2:]), np.asarray(k_cache[2:]), err_msg=tier)
        np.testing.assert_array_equal(
            np.asarray(got_v[2:]), np.asarray(v_cache[2:]), err_msg=tier)
        if kv_layout == "HND":
            np.testing.assert_array_equal(
                np.asarray(got_k[1, :, :, :], np.float32),
                np.swapaxes(np.asarray(k_new[:4], np.float32), 0, 1))
        else:
            np.testing.assert_array_equal(
                np.asarray(got_k[1], np.float32), np.asarray(k_new[:4], np.float32))


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("decode", [False, True])
def test_c8_store_xla_tier_matches_golden(seed, decode):
    """The XLA C8 tier (quantize + block-window merge) must place the same
    int8 values as the golden scatter — bit-exact."""
    rng = np.random.default_rng(500 + seed)
    case = _random_case(rng, decode=decode)
    T = case["batch"] if decode else int(case["q_lens"].sum())
    if T == 0:
        pytest.skip("empty token batch")
    hkv, d = 2, 8
    bs = case["block_size"]
    k_new = jnp.asarray(rng.standard_normal((T, hkv, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((T, hkv, d)), jnp.bfloat16)
    k_cache = jnp.asarray(rng.integers(-128, 128, (case["n_blocks"], hkv, bs, d)), jnp.int8)
    v_cache = jnp.asarray(rng.integers(-128, 128, k_cache.shape), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (hkv, d)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (hkv, d)), jnp.float32)
    cu = None if decode else jnp.asarray(
        np.concatenate([[0], np.cumsum(case["q_lens"])]), jnp.int32)
    table, ctx = jnp.asarray(case["table"]), jnp.asarray(case["ctx"])

    ref = exp.MojoStorePagedKVCacheC8.get_backend_impl("ref")()
    xla = exp.MojoStorePagedKVCacheC8.get_backend_impl("xla", strict=True)()
    want = ref(k_new, v_new, k_cache, v_cache, ks, vs, table, cu, ctx)
    got = xla(k_new, v_new, k_cache, v_cache, ks, vs, table, cu, ctx)
    np.testing.assert_array_equal(np.asarray(want[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(want[1]), np.asarray(got[1]))


@pytest.mark.parametrize("seed", seed_split(2, 3))
@pytest.mark.parametrize("decode", [False, True])
@pytest.mark.parametrize("kv_layout", ["HND", "NHD"])
def test_f16_store_accel_tier_matches_golden_bitexact(seed, decode, kv_layout):
    """f16 caches through the accelerated store tier are pure data
    movement (native f16 scatter / block merge — the r4 uint16-bitcast
    detour was removed when the toolchain's native f16 row moves became
    in-place, r5), so equality vs the golden scatter must be BIT-exact —
    no value ever converts."""
    rng = np.random.default_rng(900 + seed)
    case = _random_case(rng, decode=decode)
    T = case["batch"] if decode else int(case["q_lens"].sum())
    if T == 0:
        pytest.skip("empty token batch")
    hkv, d = 2, 128  # D=128: the Pallas-eligible lane-aligned head dim
    bs = case["block_size"]
    k_new = jnp.asarray(rng.standard_normal((T, hkv, d)), jnp.float16)
    v_new = jnp.asarray(rng.standard_normal((T, hkv, d)), jnp.float16)
    shape = ((case["n_blocks"], hkv, bs, d) if kv_layout == "HND"
             else (case["n_blocks"], bs, hkv, d))
    k_cache = jnp.asarray(rng.standard_normal(shape), jnp.float16)
    v_cache = jnp.asarray(rng.standard_normal(shape), jnp.float16)
    cu = None if decode else jnp.asarray(
        np.concatenate([[0], np.cumsum(case["q_lens"])]), jnp.int32)
    table, ctx = jnp.asarray(case["table"]), jnp.asarray(case["ctx"])

    ref = m.MojoStorePagedKVCache.get_backend_impl("ref")(kv_layout=kv_layout)
    pls = m.MojoStorePagedKVCache.get_backend_impl("xla", strict=True)(
        kv_layout=kv_layout)
    want = ref(k_new, v_new, k_cache, v_cache, table, cu, ctx)
    got = pls(k_new, v_new, k_cache, v_cache, table, cu, ctx)
    assert got[0].dtype == jnp.float16 and got[1].dtype == jnp.float16
    np.testing.assert_array_equal(
        np.asarray(want[0]).view(np.uint16), np.asarray(got[0]).view(np.uint16))
    np.testing.assert_array_equal(
        np.asarray(want[1]).view(np.uint16), np.asarray(got[1]).view(np.uint16))
