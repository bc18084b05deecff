"""Accuracy tests for the experimental op suite (MLA, NSA, KV-quant
attention, indexer, gates, experimental norms/rope/moe/gemm).

Reference analogue: tests/accuracy for experimental/operators/*.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mojo_opset_tpu.experimental as exp
import mojo_opset_tpu as m

from ..utils import make_paged_case, randn

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow

MLA_KW = dict(num_heads=4, qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8, kv_lora_rank=16)


def _mla(cls, **kw):
    return cls.get_backend_impl("ref")(**MLA_KW, key=jax.random.PRNGKey(1), **kw)


def test_mla_decode_vs_numpy():
    op = _mla(exp.MojoDecodeMLA)
    B, S = 2, 6
    q = randn(0, (B, 4, 12))
    ckv = randn(1, (B, S, 16))
    kpe = randn(2, (B, S, 1, 4))
    lens = jnp.array([6, 3], jnp.int32)
    out = op(q, ckv, kpe, lens)
    W = np.asarray(op.kv_b_proj)
    for b, sl in [(0, 6), (1, 3)]:
        kv = (np.asarray(ckv[b, :sl]) @ W.T).reshape(sl, 4, 16)
        kn, v = kv[..., :8], kv[..., 8:]
        k = np.concatenate([kn, np.broadcast_to(np.asarray(kpe[b, :sl]), (sl, 4, 4))], -1)
        s = np.einsum("hd,shd->hs", np.asarray(q[b]), k) / np.sqrt(12)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("hs,shd->hd", p, v)
        np.testing.assert_allclose(np.asarray(out[b]), want, atol=2e-5, rtol=2e-5)


def test_mla_paged_matches_dense():
    """Paged MLA over scattered blocks == dense MLA on the gathered seq."""
    dense = _mla(exp.MojoDecodeMLA)
    paged = _mla(exp.MojoPagedDecodeMLA)
    paged = paged.replace(kv_b_proj=dense.kv_b_proj)
    B, bs, NB, N = 2, 4, 3, 8
    ckv_cache = randn(1, (N, 1, bs, 16))
    kpe_cache = randn(2, (N, 1, bs, 4))
    lens = jnp.array([10, 5], jnp.int32)
    bt = jnp.array([[2, 4, 6], [1, 3, -1]], jnp.int32)
    q = randn(0, (B, 4, 12))
    got = paged(q, ckv_cache, kpe_cache, lens, bt)
    # dense reconstruction
    for b in range(B):
        sl = int(lens[b])
        nb = -(-sl // bs)
        ckv = jnp.concatenate([ckv_cache[int(bt[b, j]), 0] for j in range(nb)])[:sl]
        kpe = jnp.concatenate([kpe_cache[int(bt[b, j]), 0] for j in range(nb)])[:sl]
        want = dense(q[b : b + 1], ckv[None], kpe[None, :, None, :], jnp.array([sl], jnp.int32))
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want[0]), atol=2e-5, rtol=2e-5)


def test_mla_prefill_causal():
    op = _mla(exp.MojoPrefillMLA)
    T = 8
    q = randn(0, (T, 4, 12))
    ckv = randn(1, (T, 16))
    kpe = randn(2, (T, 1, 4))
    cu = jnp.array([0, 5, 8], jnp.int32)
    out = op(q, ckv, kpe, cu)
    assert out.shape == (T, 4, 8)
    # last token of batch0 attends to all 5; equals decode over the same kv
    dec = _mla(exp.MojoDecodeMLA)
    dec = dec.replace(kv_b_proj=op.kv_b_proj)
    want = dec(q[4:5], ckv[None, :5], kpe[None, :5], jnp.array([5], jnp.int32))
    np.testing.assert_allclose(np.asarray(out[4]), np.asarray(want[0]), atol=2e-5, rtol=2e-5)


def test_mla_store_then_paged_prefill_roundtrip():
    store = exp.MojoStorePagedMLAKVCache.get_backend_impl("ref")()
    T, r, dr, bs, N = 7, 16, 4, 4, 8
    ckv_cache = jnp.zeros((N, 1, bs, r))
    kpe_cache = jnp.zeros((N, 1, bs, dr))
    bt = jnp.array([[0, 1], [2, 3]], jnp.int32)
    cu = jnp.array([0, 4, 7], jnp.int32)
    ctx = jnp.array([0, 0], jnp.int32)
    ckv_new = randn(1, (T, r))
    kpe_new = randn(2, (T, dr))
    ckv_cache, kpe_cache = store(ckv_new, kpe_new, ckv_cache, kpe_cache, bt, cu, ctx)
    np.testing.assert_allclose(np.asarray(ckv_cache[0, 0]), np.asarray(ckv_new[:4]))
    np.testing.assert_allclose(np.asarray(kpe_cache[2, 0, :3]), np.asarray(kpe_new[4:]))


@pytest.mark.parametrize("compute_dtype", ["bfloat16", "int8"])
def test_kv_dequant_decode_approximates_fp(compute_dtype):
    """int8 KV attention ~ fp attention within quantization error."""
    case = make_paged_case(seq_lens=(9, 14), head_dim=32, hq=4, hkv=2)
    B = 2
    q = randn(5, (B, 4, 32))
    kscale = jnp.full((2, 32), 0.05)
    vscale = jnp.full((2, 32), 0.05)
    kc_q = jnp.clip(jnp.round(case["key_cache"] / 0.05), -128, 127).astype(jnp.int8)
    vc_q = jnp.clip(jnp.round(case["value_cache"] / 0.05), -128, 127).astype(jnp.int8)

    op = exp.MojoPagedDecodeGQAWithKVDequant.get_backend_impl("ref")(
        compute_dtype=jnp.dtype(compute_dtype)
    )
    got = op(q, None, kc_q, kscale, vc_q, vscale, case["seq_lens"], case["block_tables"])

    fp = m.MojoPagedDecodeGQA.get_backend_impl("ref")()
    want = fp(q, case["key_cache"], case["value_cache"], case["seq_lens"], case["block_tables"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.15, rtol=0.15)


def test_kv_dequant_prefill_and_swa_run():
    case = make_paged_case(seq_lens=(7, 13), q_lens=(5, 6), head_dim=32, hq=4, hkv=2)
    q = randn(4, (case["total_q"], 4, 32))
    kc_q = jnp.clip(jnp.round(case["key_cache"] / 0.05), -128, 127).astype(jnp.int8)
    vc_q = jnp.clip(jnp.round(case["value_cache"] / 0.05), -128, 127).astype(jnp.int8)
    kscale = jnp.full((2, 32), 0.05)
    vscale = jnp.full((2, 32), 0.05)

    pre = exp.MojoPagedPrefillGQAWithKVDequant.get_backend_impl("ref")()
    got = pre(q, None, kc_q, kscale, vc_q, vscale, case["cu_q_lens"], case["block_tables"],
              None, case["cu_total_seq_lens"])
    want = m.MojoPagedPrefillGQA.get_backend_impl("ref")()(
        q, case["key_cache"], case["value_cache"], case["cu_q_lens"], case["block_tables"],
        None, case["cu_total_seq_lens"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.15, rtol=0.15)

    swa = exp.MojoPagedPrefillSWAWithKVDequant.get_backend_impl("ref")(local_window_size=4)
    o = swa(q, None, kc_q, kscale, vc_q, vscale, case["cu_q_lens"], case["block_tables"],
            None, case["cu_total_seq_lens"])
    assert o.shape == q.shape
    swad = exp.MojoPagedDecodeSWAWithKVDequant.get_backend_impl("ref")(local_window_size=4)
    qd = randn(6, (2, 4, 32))
    od = swad(qd, None, kc_q, kscale, vc_q, vscale, case["seq_lens"], case["block_tables"])
    assert od.shape == qd.shape


def test_nstep_swa_matches_single_decode():
    """N-step decode with S=1 equals plain paged decode SWA."""
    case = make_paged_case(seq_lens=(9, 14), head_dim=32, hq=4, hkv=2)
    q = randn(5, (2, 1, 4, 32))
    op = exp.MojoPagedDecodeNstepSWA.get_backend_impl("ref")(local_window_size=6)
    got = op(q, case["key_cache"], case["value_cache"], case["seq_lens"], case["block_tables"])
    single = m.MojoPagedDecodeSWA.get_backend_impl("ref")(local_window_size=6)
    want = single(q[:, 0], case["key_cache"], case["value_cache"], case["seq_lens"], case["block_tables"])
    np.testing.assert_allclose(np.asarray(got[:, 0]), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_nsa_gate_blend_and_full_coverage_limit():
    """With window covering everything and all blocks selected, all three
    NSA branches see (nearly) the same context."""
    nsa = exp.MojoDecodeNSA.get_backend_impl("ref")(
        num_heads=2, head_dim=8, compress_ratio=1, num_selected_blocks=100,
        block_size=4, window_size=100, key=jax.random.PRNGKey(3),
    )
    q = randn(0, (1, 2, 8))
    k = randn(1, (1, 12, 2, 8))
    v = randn(2, (1, 12, 2, 8))
    out = nsa(q, k, v, jnp.array([12], jnp.int32))
    # compress_ratio=1 -> all branches = full attention; gate sums to <=3
    s = np.einsum("hd,shd->hs", np.asarray(q[0]), np.asarray(k[0])) / np.sqrt(8)
    p = np.exp(s - s.max(-1, keepdims=True)); p /= p.sum(-1, keepdims=True)
    full = np.einsum("hs,shd->hd", p, np.asarray(v[0]))
    g = 1 / (1 + np.exp(-np.einsum("hd,hdc->hc", np.asarray(q[0]), np.asarray(nsa.gate_proj))))
    want = full * g.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out[0]), want, atol=1e-4, rtol=1e-3)


def test_nsa_prefill_last_token_matches_decode():
    nsa_kw = dict(num_heads=2, head_dim=8, compress_ratio=2, num_selected_blocks=2,
                  block_size=4, window_size=4, key=jax.random.PRNGKey(3))
    pre = exp.MojoPrefillNSA.get_backend_impl("ref")(**nsa_kw)
    dec = exp.MojoDecodeNSA.get_backend_impl("ref")(**nsa_kw)
    T = 6
    q = randn(0, (T, 2, 8))
    k = randn(1, (T, 2, 8))
    v = randn(2, (T, 2, 8))
    cu = jnp.array([0, T], jnp.int32)
    out = pre(q, k, v, cu)
    want = dec(q[T - 1 : T], k[None], v[None], jnp.array([T], jnp.int32))
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(want[0]), atol=2e-5, rtol=2e-5)


def test_fused_attn_output_gate():
    op = exp.MojoFusedAttnOutputGate.get_backend_impl("ref")(
        hidden_size=16, num_heads_full=2, num_heads_swa=1, head_dim=8,
        key=jax.random.PRNGKey(2),
    )
    h = randn(0, (5, 16))
    full = randn(1, (5, 2, 8))
    swa = randn(2, (5, 8))  # 2D form
    out = op(h, full, swa)
    assert out.shape == (5, 24)
    gate = 1 / (1 + np.exp(-(np.asarray(h) @ np.concatenate(
        [np.asarray(op.full_gate_weight), np.asarray(op.swa_gate_weight)]).T)))
    cat = np.concatenate([np.asarray(full), np.asarray(swa).reshape(5, 1, 8)], axis=1)
    want = (cat * gate[..., None]).reshape(5, 24)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5, rtol=1e-5)


def test_c8_store_and_dequant_roundtrip():
    store = exp.MojoStorePagedKVCacheC8.get_backend_impl("ref")()
    T, Hkv, D, bs, N = 6, 2, 16, 4, 6
    kc = jnp.zeros((N, Hkv, bs, D), jnp.int8)
    vc = jnp.zeros((N, Hkv, bs, D), jnp.int8)
    kscale = jnp.full((Hkv, D), 0.05)
    vscale = jnp.full((Hkv, D), 0.05)
    k_new = randn(1, (T, Hkv, D))
    v_new = randn(2, (T, Hkv, D))
    bt = jnp.array([[0, 1], [2, 3]], jnp.int32)
    cu = jnp.array([0, 4, 6], jnp.int32)
    ctx = jnp.array([0, 0], jnp.int32)
    kc, vc = store(k_new, v_new, kc, vc, kscale, vscale, bt, cu, ctx)
    # dequant roundtrip within quant step
    np.testing.assert_allclose(
        np.asarray(kc[0, :, :4].transpose(1, 0, 2), np.float32) * 0.05,
        np.asarray(k_new[:4]), atol=0.03,
    )
    deq = exp.MojoDequantFromPagedKVCache.get_backend_impl("ref")()
    key_out = jnp.zeros((T, Hkv, D))
    val_out = jnp.zeros((T, Hkv, D))
    key_out, val_out = deq(
        key=key_out, value=val_out, key_cache=kc, key_cache_scale=kscale,
        value_cache=vc, value_cache_scale=vscale,
        context_lengths=jnp.array([4, 2], jnp.int32), max_context_len=4,
        block_tables=bt,
    )
    np.testing.assert_allclose(np.asarray(key_out[:4]), np.asarray(k_new[:4]), atol=0.03)


def test_store_lowrank():
    op = exp.MojoStoreLowrank.get_backend_impl("ref")()
    cache = jnp.zeros((4, 2, 8, 16))
    key_lr = randn(0, (5, 2, 16))
    blocks = jnp.array([0, 0, 1, 2, 3], jnp.int32)
    tokens = jnp.array([0, 1, 3, 2, 7], jnp.int32)
    out = op(cache, key_lr, blocks, tokens, 3)
    np.testing.assert_allclose(np.asarray(out[0, :, 0]), np.asarray(key_lr[0]))
    np.testing.assert_allclose(np.asarray(out[1, :, 3]), np.asarray(key_lr[2]))
    assert float(jnp.abs(out[2]).sum()) == 0.0  # token_num=3 cut


def test_rotate_activation_is_orthogonal():
    op = exp.MojoRotateActivation.get_backend_impl("ref")()
    x = randn(0, (4, 16))
    y = op(x)
    # Hadamard/sqrt(n) is orthogonal: norms preserved
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1), np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    # padding path (non power of two)
    x2 = randn(1, (4, 12))
    assert op(x2).shape == (4, 12)


def test_channel_rmsnorm():
    op = exp.MojoChannelRMSNorm.get_backend_impl("ref")(norm_size=8)
    x = randn(0, (2, 8, 4, 4))
    y = op(x)
    xn = np.asarray(x)
    want = xn / np.linalg.norm(xn, axis=1, keepdims=True) * np.sqrt(8)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5, rtol=1e-5)


def test_relative_embedding_buckets():
    op = exp.MojoRelativeEmbedding.get_backend_impl("ref")(
        num_buckets=32, num_heads=4, bidirectional=True
    )
    bias = op(6, 9)
    assert bias.shape == (1, 4, 6, 9)
    # same relative distance -> same bias
    b = np.asarray(bias)
    np.testing.assert_allclose(b[0, :, 0, 3], b[0, :, 1, 4])
    np.testing.assert_allclose(b[0, :, 2, 0], b[0, :, 3, 1])


def test_grid_rope_rotates_and_preserves_padding():
    op = exp.MojoGridRoPE.get_backend_impl("ref")()
    B, L, N, D = 1, 10, 2, 8
    x = randn(0, (B, L, N, D))
    grid = jnp.array([[2, 2, 2]], jnp.int32)  # seq_len 8
    freqs = [jnp.exp(1j * jax.random.uniform(jax.random.PRNGKey(1), (8, 1, D // 2)))]
    y = op(x, grid, freqs)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y[0, 8:]), np.asarray(x[0, 8:]))  # padding kept
    # unit-phase rotation preserves pair norms
    xp = np.asarray(x[0, :8]).reshape(8, N, D // 2, 2)
    yp = np.asarray(y[0, :8]).reshape(8, N, D // 2, 2)
    np.testing.assert_allclose(
        np.linalg.norm(yp, axis=-1), np.linalg.norm(xp, axis=-1), rtol=1e-4
    )


def test_moe_init_routing_dynamic_quant():
    op = exp.MojoMoEInitRoutingDynamicQuant.get_backend_impl("ref")(num_experts=4, top_k=2)
    T, H = 5, 16
    x = randn(0, (T, H))
    gates = jnp.abs(randn(1, (T, 2))).astype(jnp.float32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 4, (T, 2)), jnp.int32)
    q, sg, sti, tc, scale = op(x, gates, idx)
    assert q.shape == (T, 2, H) and q.dtype == jnp.int8
    assert int(tc.sum()) == T * 2
    assert sti.dtype == jnp.int32


def test_fused_swiglu_moe_scale_quant():
    op = exp.MojoFusedSwiGLUMoEScaleDynamicQuantize.get_backend_impl("ref")()
    T, K, H = 4, 2, 8
    x = randn(0, (T, K, 2 * H), scale=2.0)
    tc = jnp.array([3, 2, 2, 1], jnp.int32)
    q, scale = op(x, None, tc)
    assert q.shape == (T, K, H) and scale.shape == (T, K)
    left, right = np.split(np.asarray(x, np.float32), 2, axis=-1)
    want = left / (1 + np.exp(-left)) * right
    deq = np.asarray(q, np.float32) * np.asarray(scale)[..., None]
    np.testing.assert_allclose(deq, want, atol=np.abs(want).max() / 90)


def test_quant_batch_gemm_reduce_sum():
    rng = np.random.default_rng(0)
    B, M, K, N = 3, 4, 8, 6
    w = jnp.asarray(rng.integers(-10, 10, (B, K, N)), jnp.int8)
    x = jnp.asarray(rng.integers(-10, 10, (B, M, K)), jnp.int8)
    s1 = jnp.abs(randn(1, (B, M))) + 0.1
    s2 = jnp.abs(randn(2, (N,))) + 0.1
    op = exp.MojoQuantBatchGemmReduceSum.get_backend_impl("ref")(w)
    out = op(x, s1, s2)
    assert out.shape == (M, N) and out.dtype == jnp.bfloat16
    want = np.zeros((M, N), np.float64)
    for b in range(B):
        want += (np.asarray(x[b], np.float64) @ np.asarray(w[b], np.float64)) \
            * np.asarray(s2, np.float64)[None, :] * np.asarray(s1, np.float64)[b][:, None]
    np.testing.assert_allclose(np.asarray(out, np.float32), want, rtol=0.05, atol=0.5)


def test_lightning_indexer_and_full_indexer():
    li = exp.MojoLightningIndexer.get_backend_impl("ref")()
    q = randn(6, (2, 3, 4, 8))
    qs = jnp.abs(randn(7, (2, 3, 4)))
    k = randn(8, (2, 5, 8))
    score = li(q, qs, k)
    assert score.shape == (2, 3, 5)

    idx = exp.MojoIndexer.get_backend_impl("ref")(
        dim=16, n_heads=2, head_dim=8, qk_rope_head_dim=8, topk=4,
        q_lora_rank=8, max_batch_size=2, max_seq_len=32,
    )
    kc, ksc = idx.init_cache(2, 32)
    x = randn(0, (2, 6, 16))
    qr = randn(1, (2, 6, 8))
    freqs = jnp.exp(1j * jax.random.uniform(jax.random.PRNGKey(4), (6, 4)))
    topk, score, kc, ksc = idx(x, qr, 0, freqs, None, kc, ksc)
    assert topk.shape == (2, 6, 4)
    assert score.shape == (2, 6, 6)


def test_xla_mla_absorbed_matches_golden_paged():
    """Absorbed-MQA flash MLA tier vs the decompress-everything golden,
    decode + chunked prefill."""
    kw = dict(MLA_KW, use_attn_sink=True)
    ref_d = exp.MojoPagedDecodeMLA.get_backend_impl("ref")(**kw, key=jax.random.PRNGKey(5))
    xla_d = exp.MojoPagedDecodeMLA.get_backend_impl("xla")(**kw, key=jax.random.PRNGKey(5))
    xla_d = xla_d.replace(kv_b_proj=ref_d.kv_b_proj, attn_sink=ref_d.attn_sink)

    B, bs, N = 2, 4, 8
    ckv = randn(1, (N, 1, bs, 16))
    kpe = randn(2, (N, 1, bs, 4))
    lens = jnp.array([10, 5], jnp.int32)
    bt = jnp.array([[2, 4, 6], [1, 3, -1]], jnp.int32)
    q = randn(0, (B, 4, 12))
    want = ref_d(q, ckv, kpe, lens, bt)
    got = xla_d(q, ckv, kpe, lens, bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    ref_p = exp.MojoPagedPrefillMLA.get_backend_impl("ref")(**MLA_KW, key=jax.random.PRNGKey(6))
    xla_p = exp.MojoPagedPrefillMLA.get_backend_impl("xla")(**MLA_KW, key=jax.random.PRNGKey(6))
    xla_p = xla_p.replace(kv_b_proj=ref_p.kv_b_proj)
    cu = jnp.array([0, 3, 5], jnp.int32)
    cu_tot = jnp.array([0, 10, 15], jnp.int32)
    qp = randn(7, (5, 4, 12))
    want_p = ref_p(qp, ckv, kpe, cu, bt, None, cu_tot)
    got_p = xla_p(qp, ckv, kpe, cu, bt, None, cu_tot)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p), atol=2e-5, rtol=2e-5)


def test_nsa_compressed_branch_falls_back_for_short_context():
    """Context shorter than one compression block: the compressed-global
    branch must attend the RAW context (reference attention.py:1533), not
    an empty pooled KV. With window >= sl and full block selection, all
    three branches see the same tokens, so out == (g0+g1+g2) * attn."""
    import numpy as np

    from mojo_opset_tpu.experimental.operators import MojoDecodeNSA
    from mojo_opset_tpu.experimental.operators.nsa import _nsa_attend, _nsa_gate

    H, D = 4, 16
    op = MojoDecodeNSA.get_backend_impl("ref")(
        num_heads=H, head_dim=D, compress_ratio=4, num_selected_blocks=8,
        block_size=8, window_size=64, key=jax.random.PRNGKey(2),
    )
    q = jax.random.normal(jax.random.PRNGKey(0), (1, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, H, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (1, 2, H, D), jnp.float32)
    out = np.asarray(op(q, k, v, jnp.asarray([2], jnp.int32)))

    scale = 1.0 / np.sqrt(D)
    attn = np.asarray(_nsa_attend(q[0][None], k[0], v[0], scale)[0])
    g = np.asarray(_nsa_gate(q[0], op.gate_proj))
    want = (g.sum(-1)[..., None]) * attn
    np.testing.assert_allclose(out[0], want, atol=1e-5, rtol=1e-5)
