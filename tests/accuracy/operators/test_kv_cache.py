"""Accuracy tests for paged KV-cache store ops.

Reference analogue: tests/accuracy/operators/test_kv_cache.py (825 LoC).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mojo_opset_tpu as m

from ..utils import make_paged_case, randn


def test_chunk_metadata_decode_fast_path():
    bt = jnp.array([[0, 1], [2, 3]], jnp.int32)
    ctx = jnp.array([3, 5], jnp.int32)
    md = m.build_paged_kv_chunk_metadata(bt, None, ctx, 4)
    want = np.array([[0, 0, 3, 1], [1, 3, 1, 1]], np.int32)
    np.testing.assert_array_equal(np.asarray(md), want)


def test_chunk_metadata_prefill_spanning_blocks():
    bt = jnp.array([[5, 6, 7]], jnp.int32)
    cu_q = jnp.array([0, 6], jnp.int32)
    ctx = jnp.array([3], jnp.int32)
    md = m.build_paged_kv_chunk_metadata(bt, cu_q, ctx, 4)
    # tokens occupy kv positions 3..8 -> chunks: blk5 off3 len1, blk6 off0
    # len4, blk7 off0 len1
    want = np.array([[0, 5, 3, 1], [1, 6, 0, 4], [5, 7, 0, 1]], np.int32)
    np.testing.assert_array_equal(np.asarray(md), want)


def test_chunk_metadata_invalid_rows_filtered():
    bt = jnp.array([[0, -1]], jnp.int32)
    md = m.build_paged_kv_chunk_metadata(bt, None, jnp.array([7], jnp.int32), 4)
    assert md.shape[0] == 0  # logical block 1 is unmapped


def test_store_prefill_roundtrip():
    case = make_paged_case(seq_lens=(7, 1, 13), q_lens=(5, 1, 6))
    T = case["total_q"]
    hkv, d, bs = case["hkv"], case["head_dim"], case["block_size"]
    k_new = randn(1, (T, hkv, d))
    v_new = randn(2, (T, hkv, d))
    ctx = case["seq_lens"] - case["q_lens"]
    op = m.MojoStorePagedKVCache.get_backend_impl("ref")()
    kc, vc = op(
        k_new, v_new, case["key_cache"], case["value_cache"],
        case["block_tables"], case["cu_q_lens"], ctx,
    )
    # read back each token from its expected slot
    cu = np.asarray(case["cu_q_lens"])
    for b in range(3):
        for p in range(int(case["q_lens"][b])):
            pos = int(ctx[b]) + p
            blk = int(case["block_tables"][b, pos // bs])
            t = cu[b] + p
            np.testing.assert_allclose(np.asarray(kc[blk, :, pos % bs, :]), np.asarray(k_new[t]))
            np.testing.assert_allclose(np.asarray(vc[blk, :, pos % bs, :]), np.asarray(v_new[t]))


def test_store_decode_and_metadata_paths_agree():
    case = make_paged_case(seq_lens=(6, 9), q_lens=(1, 1))
    hkv, d = case["hkv"], case["head_dim"]
    k_new = randn(3, (2, hkv, d))
    v_new = randn(4, (2, hkv, d))
    ctx = case["seq_lens"] - 1
    op = m.MojoStorePagedKVCache.get_backend_impl("ref")()
    kc1, vc1 = op(k_new, v_new, case["key_cache"], case["value_cache"], case["block_tables"], None, ctx)
    md = m.build_paged_kv_chunk_metadata(case["block_tables"], None, ctx, case["block_size"])
    kc2, vc2 = op(k_new, v_new, case["key_cache"], case["value_cache"], chunk_metadata=md)
    np.testing.assert_array_equal(np.asarray(kc1), np.asarray(kc2))
    np.testing.assert_array_equal(np.asarray(vc1), np.asarray(vc2))


def test_store_is_jittable_and_donatable():
    case = make_paged_case(seq_lens=(6, 9), q_lens=(1, 1))
    hkv, d = case["hkv"], case["head_dim"]
    k_new = randn(3, (2, hkv, d))
    v_new = randn(4, (2, hkv, d))
    ctx = case["seq_lens"] - 1
    op = m.MojoStorePagedKVCache.get_backend_impl("ref")()

    @jax.jit
    def step(kc, vc, kn, vn, bt, ctx):
        return op(kn, vn, kc, vc, bt, None, ctx)

    kc, vc = step(case["key_cache"], case["value_cache"], k_new, v_new, case["block_tables"], ctx)
    kc2, vc2 = op(k_new, v_new, case["key_cache"], case["value_cache"], case["block_tables"], None, ctx)
    np.testing.assert_allclose(np.asarray(kc), np.asarray(kc2))


def test_store_mixed_args_rejected():
    case = make_paged_case(seq_lens=(6,), q_lens=(1,))
    op = m.MojoStorePagedKVCache.get_backend_impl("ref")()
    md = jnp.zeros((0, 4), jnp.int32)
    with pytest.raises(AssertionError):
        op(
            jnp.zeros((1, 2, 16)), jnp.zeros((1, 2, 16)),
            case["key_cache"], case["value_cache"],
            block_table=case["block_tables"], chunk_metadata=md,
        )
