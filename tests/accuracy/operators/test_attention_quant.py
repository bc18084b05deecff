"""Quantized-KV attention matrix suite.

Reference analogue: tests/accuracy/operators/test_attention_quant.py
(814 LoC — MojoPagedPrefillGQAWithKVDequant :326, MojoPagedDecodeGQAWithKVDequant
:425, MojoPagedPrefillSWAWithKVDequant :538, MojoPagedDecodeSWAWithKVDequant
:650, MojoPagedPrefillSageGQA :750).

Oracle design: quantize fp caches with per-channel scales, then the
KV-dequant op on the int8 caches must match the plain fp op run on the
*dequantized* caches — exact up to fp32 summation order for the
bf16-compute path, and within requant error for the int8-compute path.
This isolates the dequant plumbing from quantization loss.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m
import mojo_opset_tpu.experimental as exp

from ..utils import make_paged_case, randn
# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def _quantize_cache(cache, hkv_axis=1):
    """Per-(head, channel) symmetric int8 quant of a paged cache
    (N, Hkv, bs, D) -> (int8 cache, (Hkv, D) scale, dequantized fp cache)."""
    absmax = jnp.max(jnp.abs(cache), axis=(0, 2))  # (Hkv, D)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(cache / scale[None, :, None, :]), -128, 127).astype(jnp.int8)
    dq = q.astype(jnp.float32) * scale[None, :, None, :]
    return q, scale.astype(jnp.float32), dq


def _tols(compute_dtype):
    # bf16-compute path = fp32 math on dequantized ints -> tight;
    # int8-compute path requantizes q and probs -> requant error.
    return dict(atol=3e-5, rtol=3e-5) if compute_dtype == "bfloat16" else dict(atol=0.08, rtol=0.08)


DECODE_GRID = [
    # B, Hq, Hkv, D, block_size, seq_lens
    (2, 4, 2, 32, 4, (9, 14)),
    (1, 8, 1, 64, 16, (33,)),          # MQA, head_dim 64, crosses 2 blocks
    (3, 16, 2, 128, 16, (1, 16, 47)),  # group 8, single-token + block-exact + ragged
    (2, 4, 4, 32, 8, (0, 11)),         # MHA (group 1) + zero-length row
]


@pytest.mark.parametrize("layout", ["AABB", "ABAB"])
@pytest.mark.parametrize("compute_dtype", ["bfloat16", "int8"])
@pytest.mark.parametrize("B,Hq,Hkv,D,BS,lens", DECODE_GRID)
def test_paged_decode_kv_dequant_grid(B, Hq, Hkv, D, BS, lens, compute_dtype, layout):
    case = make_paged_case(
        key=B * 131 + D, batch=B, hq=Hq, hkv=Hkv, head_dim=D, block_size=BS,
        seq_lens=lens, n_blocks=max(8, sum(-(-max(s, 1) // BS) for s in lens) + 2),
        max_blocks=max(-(-max(s, 1) // BS) for s in lens),
    )
    q = randn(7 * B + D, (B, Hq, D))
    kq, ks, kdq = _quantize_cache(case["key_cache"])
    vq, vs, vdq = _quantize_cache(case["value_cache"])

    op = exp.MojoPagedDecodeGQAWithKVDequant.get_backend_impl("ref")(
        gqa_layout=layout, compute_dtype=jnp.dtype(compute_dtype)
    )
    got = op(q, None, kq, ks, vq, vs, case["seq_lens"], case["block_tables"])

    fp = m.MojoPagedDecodeGQA.get_backend_impl("ref")(gqa_layout=layout)
    want = fp(q, kdq, vdq, case["seq_lens"], case["block_tables"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **_tols(compute_dtype))
    # zero-length rows must be exactly zero
    for b, sl in enumerate(lens):
        if sl == 0:
            assert not np.any(np.asarray(got[b]))


PREFILL_GRID = [
    # Hq, Hkv, D, BS, seq_lens, q_lens   (q < seq -> chunked prefill w/ context)
    (4, 2, 32, 4, (7, 13), (7, 13)),       # fresh prefill
    (4, 2, 32, 4, (10, 17), (4, 6)),       # chunked: 6/11 tokens of context
    (8, 1, 64, 16, (40,), (40,)),          # MQA long single sequence
    (16, 2, 128, 16, (19, 1, 35), (3, 1, 35)),  # mixed context + 1-token row
]


@pytest.mark.parametrize("layout", ["AABB", "ABAB"])
@pytest.mark.parametrize("compute_dtype", ["bfloat16", "int8"])
@pytest.mark.parametrize("Hq,Hkv,D,BS,lens,qlens", PREFILL_GRID)
def test_paged_prefill_kv_dequant_grid(Hq, Hkv, D, BS, lens, qlens, compute_dtype, layout):
    case = make_paged_case(
        key=Hq * 17 + D, hq=Hq, hkv=Hkv, head_dim=D, block_size=BS,
        seq_lens=lens, q_lens=qlens,
        n_blocks=max(8, sum(-(-max(s, 1) // BS) for s in lens) + 2),
        max_blocks=max(-(-max(s, 1) // BS) for s in lens),
    )
    q = randn(3 * Hq + D, (case["total_q"], Hq, D))
    kq, ks, kdq = _quantize_cache(case["key_cache"])
    vq, vs, vdq = _quantize_cache(case["value_cache"])

    op = exp.MojoPagedPrefillGQAWithKVDequant.get_backend_impl("ref")(
        gqa_layout=layout, compute_dtype=jnp.dtype(compute_dtype)
    )
    got = op(q, None, kq, ks, vq, vs, case["cu_q_lens"], case["block_tables"],
             cu_total_seq_lens=case["cu_total_seq_lens"])

    fp = m.MojoPagedPrefillGQA.get_backend_impl("ref")(gqa_layout=layout)
    want = fp(q, kdq, vdq, case["cu_q_lens"], case["block_tables"],
              cu_total_seq_lens=case["cu_total_seq_lens"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **_tols(compute_dtype))


def test_paged_prefill_kv_dequant_noncausal_mask():
    """is_causal=False + explicit mask rows (reference custom-mask path)."""
    case = make_paged_case(seq_lens=(8, 8), q_lens=(8, 8), head_dim=32, hq=4, hkv=2)
    T = case["total_q"]
    q = randn(11, (T, 4, 32))
    kq, ks, kdq = _quantize_cache(case["key_cache"])
    vq, vs, vdq = _quantize_cache(case["value_cache"])
    # causal mask expressed as an explicit (max_q, max_kv) boolean table
    mask = jnp.tril(jnp.ones((8, 8), bool))

    op = exp.MojoPagedPrefillGQAWithKVDequant.get_backend_impl("ref")(is_causal=False)
    got = op(q, None, kq, ks, vq, vs, case["cu_q_lens"], case["block_tables"], mask=mask)

    causal = exp.MojoPagedPrefillGQAWithKVDequant.get_backend_impl("ref")(is_causal=True)
    want = causal(q, None, kq, ks, vq, vs, case["cu_q_lens"], case["block_tables"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6, rtol=3e-6)


WINDOW_GRID = [
    # global_window, local_window
    (None, 8),     # sliding window only
    (4, None),     # global prefix only
    (4, 8),        # both
    (None, 1024),  # window wider than any sequence == plain causal
]


@pytest.mark.parametrize("compute_dtype", ["bfloat16", "int8"])
@pytest.mark.parametrize("glob,loc", WINDOW_GRID)
def test_paged_decode_swa_kv_dequant_windows(glob, loc, compute_dtype):
    case = make_paged_case(key=5, hq=8, hkv=2, head_dim=64, block_size=8,
                           seq_lens=(29, 5, 17), max_blocks=4, n_blocks=16)
    q = randn(21, (3, 8, 64))
    kq, ks, kdq = _quantize_cache(case["key_cache"])
    vq, vs, vdq = _quantize_cache(case["value_cache"])

    op = exp.MojoPagedDecodeSWAWithKVDequant.get_backend_impl("ref")(
        global_window_size=glob, local_window_size=loc,
        compute_dtype=jnp.dtype(compute_dtype),
    )
    got = op(q, None, kq, ks, vq, vs, case["seq_lens"], case["block_tables"])

    fp = m.MojoPagedDecodeSWA.get_backend_impl("ref")(
        global_window_size=glob, local_window_size=loc
    )
    want = fp(q, kdq, vdq, case["seq_lens"], case["block_tables"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **_tols(compute_dtype))


@pytest.mark.parametrize("compute_dtype", ["bfloat16", "int8"])
@pytest.mark.parametrize("glob,loc", WINDOW_GRID)
def test_paged_prefill_swa_kv_dequant_windows(glob, loc, compute_dtype):
    case = make_paged_case(key=6, hq=8, hkv=2, head_dim=64, block_size=8,
                           seq_lens=(21, 13), q_lens=(9, 13), max_blocks=3, n_blocks=12)
    q = randn(22, (case["total_q"], 8, 64))
    kq, ks, kdq = _quantize_cache(case["key_cache"])
    vq, vs, vdq = _quantize_cache(case["value_cache"])

    op = exp.MojoPagedPrefillSWAWithKVDequant.get_backend_impl("ref")(
        global_window_size=glob, local_window_size=loc,
        compute_dtype=jnp.dtype(compute_dtype),
    )
    got = op(q, None, kq, ks, vq, vs, case["cu_q_lens"], case["block_tables"],
             cu_total_seq_lens=case["cu_total_seq_lens"])

    fp = m.MojoPagedPrefillSWA.get_backend_impl("ref")(
        global_window_size=glob, local_window_size=loc
    )
    want = fp(q, kdq, vdq, case["cu_q_lens"], case["block_tables"],
              cu_total_seq_lens=case["cu_total_seq_lens"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **_tols(compute_dtype))


def test_swa_wide_window_equals_plain_gqa():
    """Window wider than every sequence: the SWA-dequant op must agree with
    the plain GQA-dequant op bit-for-bit on the same int8 caches."""
    case = make_paged_case(key=8, hq=4, hkv=2, head_dim=32, seq_lens=(7, 13))
    q = randn(30, (2, 4, 32))
    kq, ks, _ = _quantize_cache(case["key_cache"])
    vq, vs, _ = _quantize_cache(case["value_cache"])
    swa = exp.MojoPagedDecodeSWAWithKVDequant.get_backend_impl("ref")(
        local_window_size=4096
    )
    plain = exp.MojoPagedDecodeGQAWithKVDequant.get_backend_impl("ref")()
    a = swa(q, None, kq, ks, vq, vs, case["seq_lens"], case["block_tables"])
    b = plain(q, None, kq, ks, vq, vs, case["seq_lens"], case["block_tables"])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decode_swa_dequant_matches_last_row_of_prefill():
    """Decode == final row of a full SWA prefill over the same window."""
    case = make_paged_case(key=9, hq=8, hkv=2, head_dim=32, block_size=8,
                           seq_lens=(24,), q_lens=(24,), max_blocks=3, n_blocks=8)
    q = randn(31, (24, 8, 32))
    kq, ks, _ = _quantize_cache(case["key_cache"])
    vq, vs, _ = _quantize_cache(case["value_cache"])
    kw = dict(global_window_size=2, local_window_size=6)
    pre = exp.MojoPagedPrefillSWAWithKVDequant.get_backend_impl("ref")(**kw)
    dec = exp.MojoPagedDecodeSWAWithKVDequant.get_backend_impl("ref")(**kw)
    full = pre(q, None, kq, ks, vq, vs, case["cu_q_lens"], case["block_tables"])
    last = dec(q[23:24], None, kq, ks, vq, vs, case["seq_lens"], case["block_tables"])
    np.testing.assert_allclose(np.asarray(full[23]), np.asarray(last[0]),
                               atol=3e-6, rtol=3e-6)


def _sage_quant_q(q):
    """Per-(head, token) symmetric int8 quant of q (T, Hq, D) ->
    (int8 q, (Hq, T) scales)."""
    absmax = jnp.max(jnp.abs(q), axis=-1)  # (T, Hq)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    qq = jnp.clip(jnp.round(q / scale[..., None]), -128, 127).astype(jnp.int8)
    return qq, scale.T.astype(jnp.float32)  # (Hq, T)


def _sage_quant_cache_per_token(cache):
    """Per-(block, head, slot) K quant -> (int8, (N, Hkv, bs) scales)."""
    absmax = jnp.max(jnp.abs(cache), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(cache / scale[..., None]), -128, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


@pytest.mark.parametrize("layout", ["AABB", "ABAB"])
@pytest.mark.parametrize("Hq,Hkv,D,lens,qlens", [
    (4, 2, 32, (7, 13), (7, 13)),
    (8, 1, 64, (24,), (10,)),      # MQA chunked
    (4, 4, 32, (9, 3), (9, 3)),    # MHA
])
def test_paged_prefill_sage_gqa(Hq, Hkv, D, lens, qlens, layout):
    """Sage (quantized Q + per-token K scales) vs fp attention on the
    dequantized tensors, within requant error."""
    BS = 8
    case = make_paged_case(
        key=Hq + D, hq=Hq, hkv=Hkv, head_dim=D, block_size=BS,
        seq_lens=lens, q_lens=qlens,
        n_blocks=max(8, sum(-(-max(s, 1) // BS) for s in lens) + 2),
        max_blocks=max(-(-max(s, 1) // BS) for s in lens),
    )
    q = randn(40 + Hq, (case["total_q"], Hq, D))
    qq, q_scale = _sage_quant_q(q)
    kq, ks = _sage_quant_cache_per_token(case["key_cache"])
    vq, vs, vdq = _quantize_cache(case["value_cache"])

    op = exp.MojoPagedPrefillSageGQA.get_backend_impl("ref")(gqa_layout=layout)
    got = op(qq, q_scale, kq, ks, vq, vs, case["cu_q_lens"], case["block_tables"],
             cu_total_seq_lens=case["cu_total_seq_lens"])

    # fp oracle on dequantized q/k/v
    q_dq = qq.astype(jnp.float32) * q_scale.T[..., None]
    k_dq = kq.astype(jnp.float32) * ks[..., None]
    fp = m.MojoPagedPrefillGQA.get_backend_impl("ref")(gqa_layout=layout)
    want = fp(q_dq, k_dq, vdq, case["cu_q_lens"], case["block_tables"],
              cu_total_seq_lens=case["cu_total_seq_lens"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.08, rtol=0.08)


@pytest.mark.parametrize("S", [1, 2, 4])
@pytest.mark.parametrize("glob,loc", [(None, 8), (4, 8), (None, None)])
def test_nstep_swa_grid_matches_sequential_decode(S, glob, loc):
    """N-step (speculative) SWA decode row s must equal a plain SWA decode
    at the shorter context total-S+1+s (reference attention.py:1154)."""
    case = make_paged_case(key=12, hq=8, hkv=2, head_dim=32, block_size=8,
                           seq_lens=(27, 12), max_blocks=4, n_blocks=12)
    B = 2
    q = randn(50 + S, (B, S, 8, 32))
    op = exp.MojoPagedDecodeNstepSWA.get_backend_impl("ref")(
        global_window_size=glob, local_window_size=loc
    )
    got = op(q, case["key_cache"], case["value_cache"], case["seq_lens"],
             case["block_tables"])
    assert got.shape == (B, S, 8, 32)

    dec = m.MojoPagedDecodeSWA.get_backend_impl("ref")(
        global_window_size=glob, local_window_size=loc
    )
    for s in range(S):
        lens_s = case["seq_lens"] - (S - 1 - s)
        want = dec(q[:, s], case["key_cache"], case["value_cache"],
                   lens_s.astype(jnp.int32), case["block_tables"])
        np.testing.assert_allclose(np.asarray(got[:, s]), np.asarray(want),
                                   atol=3e-6, rtol=3e-6)


def test_kv_dequant_rejects_quantized_query():
    with pytest.raises(NotImplementedError):
        exp.MojoPagedDecodeGQAWithKVDequant.get_backend_impl("ref")(query_dtype=jnp.int8)


def test_kv_dequant_rejects_fp_context():
    with pytest.raises(AssertionError):
        exp.MojoPagedDecodeGQAWithKVDequant.get_backend_impl("ref")(
            context_dtype=jnp.bfloat16
        )


def test_kv_dequant_rejects_bad_layout():
    with pytest.raises(ValueError):
        exp.MojoPagedDecodeGQAWithKVDequant.get_backend_impl("ref")(gqa_layout="ABBA")


def test_store_c8_then_dequant_attention_end_to_end():
    """Full int8-KV pipeline: StorePagedKVCacheC8 quantizes+stores new
    tokens with per-channel scales, the dequant-attention op consumes the
    quantized cache with the same scales; must track the fp pipeline
    within quant error (reference kv_cache.py:109 + attention.py:635)."""
    T, Hkv, BS, N, D, Hq = 12, 2, 4, 10, 32, 4
    k_new = randn(60, (T, Hkv, D))
    v_new = randn(61, (T, Hkv, D))
    k_sc = (jnp.max(jnp.abs(k_new), axis=(0,)) / 127.0 + 1e-8).astype(jnp.float32)
    v_sc = (jnp.max(jnp.abs(v_new), axis=(0,)) / 127.0 + 1e-8).astype(jnp.float32)
    kc = jnp.zeros((N, Hkv, BS, D), jnp.int8)
    vc = jnp.zeros((N, Hkv, BS, D), jnp.int8)
    bt = jnp.array([[0, 1, 2], [3, 4, -1]], jnp.int32)
    cu_q = jnp.array([0, 7, 12], jnp.int32)
    ctx = jnp.array([0, 0], jnp.int32)

    store = exp.MojoStorePagedKVCacheC8.get_backend_impl("ref")()
    kc, vc = store(k_new, v_new, kc, vc, k_sc, v_sc, bt, cu_q, ctx)

    q = randn(62, (2, Hq, D))
    lens = jnp.array([7, 5], jnp.int32)
    deq_attn = exp.MojoPagedDecodeGQAWithKVDequant.get_backend_impl("ref")()
    got = deq_attn(q, None, kc, k_sc, vc, v_sc, lens, bt)

    # fp oracle: store the raw tokens in an fp cache
    kc_fp = jnp.zeros((N, Hkv, BS, D))
    vc_fp = jnp.zeros((N, Hkv, BS, D))
    fp_store = m.MojoStorePagedKVCache.get_backend_impl("ref")()
    kc_fp, vc_fp = fp_store(k_new, v_new, kc_fp, vc_fp, bt, cu_q, ctx)
    fp_op = m.MojoPagedDecodeGQA.get_backend_impl("ref")()
    want = fp_op(q, kc_fp, vc_fp, lens, bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05, rtol=0.05)
