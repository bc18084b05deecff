"""Attention edge cases: chunked prefill, custom masks, zero-length
sequences, padded block tables, odd GQA group sizes, non-default
softmax scales, bf16.

Reference analogue: the long tail of tests/accuracy/operators/
test_attention.py (2338 LoC there) — shapes and degenerate inputs that
production paged serving actually produces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m

from ..utils import make_paged_case, randn

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def _ref(cls, *a, **k):
    return cls.get_backend_impl(k.pop("_tier", "ref"))(*a, **k)


def _gather_seq(cache, bt_row, sl, bs):
    nb = -(-sl // bs)
    return jnp.concatenate(
        [jnp.swapaxes(cache[int(bt_row[j])], 0, 1) for j in range(nb)]
    )[:sl]  # (sl, Hkv, D)


def test_chunked_prefill_equals_tail_of_full_prefill():
    """cu_total_seq_lens > cu_q_lens: the chunk's rows must equal the last
    q_len rows of a full prefill over the whole context."""
    case = make_paged_case(key=3, hq=4, hkv=2, head_dim=16,
                           seq_lens=(11, 6), q_lens=(4, 3))
    op = _ref(m.MojoPagedPrefillGQA, gqa_layout="AABB")
    T = case["total_q"]
    q_chunk = randn(7, (T, 4, 16))

    got = op(q_chunk, case["key_cache"], case["value_cache"], case["cu_q_lens"],
             case["block_tables"], None, case["cu_total_seq_lens"])

    # oracle: dense causal attention over the full context, query rows
    # placed at absolute positions (kv_len - q_len + i)
    off = 0
    for b, (sl, ql) in enumerate(zip((11, 6), (4, 3))):
        k = np.asarray(_gather_seq(case["key_cache"], case["block_tables"][b], sl, case["block_size"]))
        v = np.asarray(_gather_seq(case["value_cache"], case["block_tables"][b], sl, case["block_size"]))
        q_b = np.asarray(q_chunk[off : off + ql], np.float32)  # (ql, Hq, D)
        scale = 1 / np.sqrt(16)
        for i in range(ql):
            kv_len = sl - ql + i + 1
            for hq in range(4):
                hk = hq // 2  # AABB
                s = (q_b[i, hq] @ k[:kv_len, hk].T.astype(np.float32)) * scale
                p = np.exp(s - s.max())
                p /= p.sum()
                want = p @ v[:kv_len, hk].astype(np.float32)
                np.testing.assert_allclose(
                    np.asarray(got[off + i, hq], np.float32), want, atol=2e-5, rtol=2e-5
                )
        off += ql


def test_paged_prefill_custom_mask_matches_causal():
    """A non-causal op with an explicit lower-triangular keep mask must
    reproduce the causal op (mask is consulted only when is_causal=False,
    reference attention.py:438-444)."""
    case = make_paged_case(key=5, hq=2, hkv=2, head_dim=16,
                           seq_lens=(6, 4), q_lens=(6, 4))
    q = randn(9, (case["total_q"], 2, 16))
    causal = _ref(m.MojoPagedPrefillGQA)
    masked = _ref(m.MojoPagedPrefillGQA, is_causal=False)
    tri = jnp.tril(jnp.ones((6, 6), bool))
    got = masked(q, case["key_cache"], case["value_cache"], case["cu_q_lens"],
                 case["block_tables"], None, None, tri)
    want = causal(q, case["key_cache"], case["value_cache"], case["cu_q_lens"],
                  case["block_tables"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_zero_length_query_rows_in_batch():
    """A sequence with q_len=0 contributes no rows and doesn't disturb
    its neighbours."""
    full = make_paged_case(key=6, hq=4, hkv=2, head_dim=16,
                           seq_lens=(7, 5), q_lens=(7, 5))
    op = _ref(m.MojoPagedPrefillGQA)
    q = randn(11, (12, 4, 16))
    base = op(q, full["key_cache"], full["value_cache"], full["cu_q_lens"],
              full["block_tables"])

    # same batch with an empty sequence wedged in the middle
    cu = jnp.array([0, 7, 7, 12], jnp.int32)
    bt = jnp.concatenate(
        [full["block_tables"][0:1],
         jnp.full((1, full["block_tables"].shape[1]), -1, jnp.int32),
         full["block_tables"][1:2]]
    )
    got = op(q, full["key_cache"], full["value_cache"], cu, bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=2e-5, rtol=2e-5)


def test_decode_zero_seq_len_gives_zeros():
    case = make_paged_case(key=7, hq=4, hkv=2, head_dim=16, seq_lens=(9, 0))
    op = _ref(m.MojoPagedDecodeGQA)
    q = randn(1, (2, 4, 16))
    lens = jnp.array([9, 0], jnp.int32)
    bt = case["block_tables"].at[1].set(-1)
    out = op(q, case["key_cache"], case["value_cache"], lens, bt)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    np.testing.assert_array_equal(np.asarray(out[1]), 0)
    assert np.abs(np.asarray(out[0])).max() > 0


def test_softmax_scale_override_matches_manual():
    case = make_paged_case(key=8, hq=2, hkv=2, head_dim=16, seq_lens=(5,))
    q = randn(13, (1, 2, 16))
    op = _ref(m.MojoPagedDecodeGQA)
    got = op(q, case["key_cache"], case["value_cache"], case["seq_lens"],
             case["block_tables"], 0.5)
    k = np.asarray(_gather_seq(case["key_cache"], case["block_tables"][0], 5, case["block_size"]))
    v = np.asarray(_gather_seq(case["value_cache"], case["block_tables"][0], 5, case["block_size"]))
    for h in range(2):
        s = (np.asarray(q[0, h], np.float32) @ k[:, h].T) * 0.5
        p = np.exp(s - s.max())
        p /= p.sum()
        np.testing.assert_allclose(
            np.asarray(got[0, h], np.float32), p @ v[:, h], atol=2e-5, rtol=2e-5
        )


@pytest.mark.parametrize("hq,hkv", [(16, 2), (8, 8), (7, 7)])
def test_gqa_group_sizes(hq, hkv):
    """Group sizes beyond the common 4x, incl. MHA (group=1) and
    non-power-of-two head counts."""
    case = make_paged_case(key=hq, hq=hq, hkv=hkv, head_dim=16, seq_lens=(6, 3))
    q = randn(17, (2, hq, 16))
    op = _ref(m.MojoPagedDecodeGQA, gqa_layout="AABB")
    got = op(q, case["key_cache"], case["value_cache"], case["seq_lens"], case["block_tables"])
    group = hq // hkv
    for b, sl in enumerate((6, 3)):
        k = np.asarray(_gather_seq(case["key_cache"], case["block_tables"][b], sl, case["block_size"]))
        v = np.asarray(_gather_seq(case["value_cache"], case["block_tables"][b], sl, case["block_size"]))
        for h in range(hq):
            hk = h // group
            s = (np.asarray(q[b, h], np.float32) @ k[:, hk].T) / np.sqrt(16)
            p = np.exp(s - s.max())
            p /= p.sum()
            np.testing.assert_allclose(
                np.asarray(got[b, h], np.float32), p @ v[:, hk], atol=2e-5, rtol=2e-5
            )


def test_bf16_decode_within_tolerance():
    case = make_paged_case(key=21, hq=4, hkv=2, head_dim=16, seq_lens=(13, 7),
                           dtype=jnp.bfloat16)
    q = randn(23, (2, 4, 16), jnp.bfloat16)
    ref = _ref(m.MojoPagedDecodeGQA)
    got = ref(q, case["key_cache"], case["value_cache"], case["seq_lens"], case["block_tables"])
    assert got.dtype == jnp.bfloat16
    # fp32 recompute as oracle
    case32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
        case,
    )
    want = ref(q.astype(jnp.float32), case32["key_cache"], case32["value_cache"],
               case["seq_lens"], case["block_tables"])
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.1, rtol=0.05
    )


def test_prefill_single_token_sequences():
    """q_len=1 per sequence through the *prefill* path must equal the
    decode path (serving mixes these)."""
    case = make_paged_case(key=31, hq=4, hkv=2, head_dim=16,
                           seq_lens=(9, 5), q_lens=(1, 1))
    q = randn(37, (2, 4, 16))
    prefill = _ref(m.MojoPagedPrefillGQA)
    decode = _ref(m.MojoPagedDecodeGQA)
    got = prefill(q, case["key_cache"], case["value_cache"], case["cu_q_lens"],
                  case["block_tables"], None, case["cu_total_seq_lens"])
    want = decode(q, case["key_cache"], case["value_cache"], case["seq_lens"],
                  case["block_tables"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_pallas_paged_decode_swa_matches_golden():
    """Window-skipping flash decode vs the dense golden, across window
    configs (interpret mode; page-skip arithmetic exercised)."""
    case = make_paged_case(key=41, hq=8, hkv=2, head_dim=16,
                           seq_lens=(200, 70), block_size=4, max_blocks=50,
                           n_blocks=128)
    q = randn(43, (2, 8, 16))
    for local, glob in [(16, None), (None, 12), (16, 12), (None, None)]:
        ref = m.MojoPagedDecodeSWA.get_backend_impl("ref")(
            local_window_size=local, global_window_size=glob)
        pal = m.MojoPagedDecodeSWA.get_backend_impl("pallas")(
            local_window_size=local, global_window_size=glob)
        want = ref(q, case["key_cache"], case["value_cache"], case["seq_lens"],
                   case["block_tables"])
        got = pal(q, case["key_cache"], case["value_cache"], case["seq_lens"],
                  case["block_tables"])
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5,
            err_msg=f"local={local} glob={glob}",
        )


def test_pallas_int8_swa_decode_matches_golden():
    """Scale folding + window skipping composed, vs the dequant golden."""
    N, Hkv, bs, D, B = 32, 2, 4, 16, 2
    rng = np.random.default_rng(7)
    kc8 = jnp.asarray(rng.integers(-127, 127, (N, Hkv, bs, D)), jnp.int8)
    vc8 = jnp.asarray(rng.integers(-127, 127, (N, Hkv, bs, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (Hkv, D)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (Hkv, D)), jnp.float32)
    q = randn(51, (B, 4, D), jnp.bfloat16)
    lens = jnp.array([60, 17], jnp.int32)
    bt = jnp.arange(B * 16, dtype=jnp.int32).reshape(B, 16)
    import mojo_opset_tpu.experimental as exp

    for local, glob in [(12, None), (12, 8), (None, None)]:
        ref = exp.MojoPagedDecodeSWAWithKVDequant.get_backend_impl("ref")(
            local_window_size=local, global_window_size=glob)
        pal = exp.MojoPagedDecodeSWAWithKVDequant.get_backend_impl("pallas")(
            local_window_size=local, global_window_size=glob)
        want = ref(q, None, kc8, ks, vc8, vs, lens, bt)
        got = pal(q, None, kc8, ks, vc8, vs, lens, bt)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-3, rtol=5e-2, err_msg=f"local={local} glob={glob}",
        )
