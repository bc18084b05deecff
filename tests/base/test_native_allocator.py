"""Native (C++) block allocator vs the numpy fallback.

The native allocator (runtime/native/block_allocator.cpp) must produce
bit-identical block tables and context lengths to the Python fallback in
PagedAttentionRuntimeState (reference keeps this bookkeeping in its C++
NPU runtime; ours shares numpy buffers zero-copy via ctypes)."""

import numpy as np
import pytest

from mojo_opset_tpu.runtime.native import NativeBlockAllocator, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


def _python_reserve(q_lens, seq_lens, block_tables, free_blocks, num_free, block_size):
    prev = seq_lens.copy()
    for i in range(len(seq_lens)):
        oldb = -(-int(prev[i]) // block_size)
        newb = -(-(int(prev[i]) + int(q_lens[i])) // block_size)
        if newb > oldb:
            n = newb - oldb
            if n > num_free:
                raise ValueError("oom")
            block_tables[i, oldb:newb] = free_blocks[num_free - n : num_free]
            num_free -= n
    seq_lens += q_lens
    return prev, num_free


def test_reserve_parity_randomized():
    rng = np.random.default_rng(0)
    B, MBS, bs = 4, 16, 8
    total = B * MBS

    nat = NativeBlockAllocator(B, MBS, total, bs)
    n_seq = np.zeros(B, np.int32)
    n_bt = np.full((B, MBS), -1, np.int32)

    p_seq = np.zeros(B, np.int32)
    p_bt = np.full((B, MBS), -1, np.int32)
    p_free = np.arange(total, dtype=np.int32)
    p_nfree = total

    for _ in range(10):
        q = rng.integers(0, 6, B).astype(np.int32)
        ctx_n = nat.reserve(q, n_seq, n_bt)
        ctx_p, p_nfree = _python_reserve(q, p_seq, p_bt, p_free, p_nfree, bs)
        np.testing.assert_array_equal(ctx_n, ctx_p)
        np.testing.assert_array_equal(n_seq, p_seq)
        np.testing.assert_array_equal(n_bt, p_bt)
        assert nat.num_free_blocks == p_nfree


def test_oom_is_transactional():
    nat = NativeBlockAllocator(2, 8, 8, 4)
    seq = np.zeros(2, np.int32)
    bt = np.full((2, 8), -1, np.int32)
    nat.reserve(np.array([16, 12], np.int32), seq, bt)  # 4 + 3 blocks
    seq_before, bt_before = seq.copy(), bt.copy()
    with pytest.raises(ValueError, match="Out of paged KV cache memory"):
        nat.reserve(np.array([0, 16], np.int32), seq, bt)  # needs 4, has 1
    np.testing.assert_array_equal(seq, seq_before)
    np.testing.assert_array_equal(bt, bt_before)
    assert nat.num_free_blocks == 1


def test_per_seq_table_overflow():
    nat = NativeBlockAllocator(1, 2, 8, 4)
    seq = np.zeros(1, np.int32)
    bt = np.full((1, 2), -1, np.int32)
    with pytest.raises(ValueError, match="max_blocks_per_seq"):
        nat.reserve(np.array([12], np.int32), seq, bt)


def test_release_and_reuse():
    nat = NativeBlockAllocator(2, 4, 8, 4)
    seq = np.zeros(2, np.int32)
    bt = np.full((2, 4), -1, np.int32)
    nat.reserve(np.array([8, 8], np.int32), seq, bt)
    assert nat.num_free_blocks == 4
    nat.release(0, seq, bt)
    assert nat.num_free_blocks == 6
    assert seq[0] == 0 and (bt[0] == -1).all()
    # released blocks are reusable
    nat.reserve(np.array([16, 0], np.int32), seq, bt)
    assert nat.num_free_blocks == 2
    assert (bt[0, :4] >= 0).all()


def test_session_uses_native_and_matches_fallback(monkeypatch):
    """End-to-end: PagedAttentionRuntimeState with native vs forced-numpy
    allocator produces identical tables across prefill+decode."""
    import jax.numpy as jnp

    from mojo_opset_tpu.runtime.config import MojoConfig, MojoModelConfig
    from mojo_opset_tpu.runtime.session import PagedAttentionRuntimeState

    cfg = MojoConfig(
        model_config=MojoModelConfig(
            num_layers=1, hidden_size=32, num_heads=2,
            num_kv_heads=1, head_dim=16, vocab_size=64,
            max_position_embeddings=64, dtype=jnp.float32,
        )
    )

    sessions = []
    for force_off in (False, True):
        if force_off:
            monkeypatch.setenv("MOJO_NATIVE", "0")
        s = PagedAttentionRuntimeState(cfg, batch_size=2, block_size=8)
        if not force_off:
            assert s._native is not None
        s.prepare_prefill_inputs(
            np.arange(10, dtype=np.int32), np.array([6, 4], np.int32)
        )
        for _ in range(5):
            s.prepare_decode_inputs(np.array([1, 2], np.int32))
        sessions.append(s)

    a, b = sessions
    np.testing.assert_array_equal(a.block_tables, b.block_tables)
    np.testing.assert_array_equal(a.total_seq_lens, b.total_seq_lens)
    assert a.free_block_count() == b.free_block_count()


def _leak_after_rollback(native: bool):
    """Rollback (speculative rewind) must not leak blocks on release."""
    import os

    import numpy as np

    from mojo_opset_tpu.runtime.config import MojoConfig, MojoModelConfig
    from mojo_opset_tpu.runtime.session import PagedAttentionRuntimeState

    prev = os.environ.get("MOJO_NATIVE")
    os.environ["MOJO_NATIVE"] = "1" if native else "0"
    try:
        cfg = MojoConfig(model_config=MojoModelConfig(
            model_name="t", hidden_size=32, embed_dim=32, head_dim=16,
            num_heads=2, num_kv_heads=1, num_layers=1, vocab_size=64,
            max_position_embeddings=256, dtype="float32"))
        sess = PagedAttentionRuntimeState(cfg, batch_size=1, block_size=16)
        if native and sess._native is None:
            import pytest

            pytest.skip("native allocator unavailable")
        free0 = sess.free_block_count()
        for _ in range(10):
            # grow to 15, reserve 4 (crosses into a 2nd block), rewind to 16
            sess.total_seq_lens[:] = 0
            sess._reserve(np.array([15], np.int32))
            sess._reserve(np.array([4], np.int32))
            sess.total_seq_lens[:] = np.int32(16)
            sess.release_sequence(0)
        assert sess.free_block_count() == free0, (
            f"leaked {free0 - sess.free_block_count()} blocks after rollbacks")
    finally:
        if prev is None:
            os.environ.pop("MOJO_NATIVE", None)
        else:
            os.environ["MOJO_NATIVE"] = prev


def test_release_after_rollback_no_leak_numpy():
    _leak_after_rollback(native=False)


def test_release_after_rollback_no_leak_native():
    _leak_after_rollback(native=True)


def _reserve_reuses_after_rollback(native: bool):
    """Reserve after a rollback must reuse the still-owned entry instead
    of overwriting it with a fresh block (which would drop the old id)."""
    import os

    import numpy as np

    from mojo_opset_tpu.runtime.config import MojoConfig, MojoModelConfig
    from mojo_opset_tpu.runtime.session import PagedAttentionRuntimeState

    prev = os.environ.get("MOJO_NATIVE")
    os.environ["MOJO_NATIVE"] = "1" if native else "0"
    try:
        cfg = MojoConfig(model_config=MojoModelConfig(
            model_name="t", hidden_size=32, embed_dim=32, head_dim=16,
            num_heads=2, num_kv_heads=1, num_layers=1, vocab_size=64,
            max_position_embeddings=256, dtype="float32"))
        sess = PagedAttentionRuntimeState(cfg, batch_size=1, block_size=16)
        if native and sess._native is None:
            import pytest

            pytest.skip("native allocator unavailable")
        sess._reserve(np.array([15], np.int32))
        sess._reserve(np.array([4], np.int32))  # crosses into block 2
        owned = int(sess.block_tables[0, 1])
        assert owned >= 0
        sess.total_seq_lens[:] = np.int32(16)  # speculative rewind
        free_before = sess.free_block_count()
        sess._reserve(np.array([4], np.int32))  # 16 -> 20, needs block 2
        assert int(sess.block_tables[0, 1]) == owned, "entry not reused"
        assert sess.free_block_count() == free_before, "allocated a duplicate"
    finally:
        if prev is None:
            os.environ.pop("MOJO_NATIVE", None)
        else:
            os.environ["MOJO_NATIVE"] = prev


def test_reserve_reuse_after_rollback_numpy():
    _reserve_reuses_after_rollback(native=False)


def test_reserve_reuse_after_rollback_native():
    _reserve_reuses_after_rollback(native=True)
