"""Accuracy tests for previously-untested ops.

Covers: OverEncoding family (NGram hash / NF4 embedding / full
over-encoding), ParallelEmbedding, LayerNormQuant, ResidualAddLayerNorm,
GroupLayerNorm, inplace norm variants, MRoPEInplace, paged MLA prefill,
paged NSA, Sage prefill, diffusion attention function, fused-linear-CE
function form, and the backend registry/function dispatch machinery.

Reference analogue: tests/accuracy/operators/ (reference pattern:
golden-vs-tier `forward_diff_with`; here each op's semantics are also
pinned against a brute-force numpy or compositional oracle).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m
import mojo_opset_tpu.experimental as exp

from ..utils import randn

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def _ref(cls, *args, **kwargs):
    return cls.get_backend_impl("ref")(*args, **kwargs)


# -- OverEncoding family -------------------------------------------------


def _brute_ngram(ids_row, hist_row, gram, mod, vocab):
    """Rolling modular hash oracle (reference over_encoding.py:20-59)."""
    complete = np.concatenate([hist_row, ids_row]).astype(object)
    S = len(ids_row)
    out = []
    for t in range(S):
        pos = len(hist_row) + t
        h = 0
        for j in range(gram):
            h = h * int(vocab) + int(complete[pos - j]) if False else h
        # explicit: id_t + sum_i prev_i * vocab^i  (mod m)
        h = int(ids_row[t])
        carry = int(vocab)
        for i in range(1, gram):
            h = (h + int(complete[pos - i]) * (carry % mod)) % mod
            carry = carry * int(vocab) % mod
        out.append(h % mod)
    return np.array(out)


def test_over_encoding_ngram_matches_bruteforce():
    vocab, sizes, grams = 1000, [64, 97], [2, 3]
    op = _ref(m.MojoOverEncodingNGram, vocab, sizes, grams)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 6), 0, vocab)
    hist = jax.random.randint(jax.random.PRNGKey(1), (2, 2), 0, vocab)
    got = np.asarray(op(ids, hist))
    assert got.shape == (2, 6, 2)
    offs = [0, sizes[0]]
    for b in range(2):
        for gi, (g, mod) in enumerate(zip(grams, sizes)):
            want = _brute_ngram(np.asarray(ids[b]), np.asarray(hist[b]), g, mod, vocab)
            np.testing.assert_array_equal(got[b, :, gi], want + offs[gi])


def test_over_encoding_ngram_varlen_matches_padded():
    vocab, sizes, grams = 500, [32], [3]
    op = _ref(m.MojoOverEncodingNGram, vocab, sizes, grams)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 5), 0, vocab)
    hist = jax.random.randint(jax.random.PRNGKey(3), (2, 2), 0, vocab)
    padded = np.asarray(op(ids, hist))
    flat = jnp.concatenate([ids[0], ids[1]])
    varlen = np.asarray(op(flat, hist, q_lens=jnp.array([5, 5], jnp.int32)))
    np.testing.assert_array_equal(varlen[:5], padded[0])
    np.testing.assert_array_equal(varlen[5:], padded[1])


def test_nf4_dequant_embedding_bruteforce_and_oov():
    from mojo_opset_tpu.core.operators.over_encoding import (
        NF4_CODEBOOK,
        dequantize_nf4_rows,
    )

    rows, groups, gs = 6, 2, 4
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 16, (rows, groups * gs))
    packed = (idx[:, 0::2] | (idx[:, 1::2] << 4)).astype(np.int8)
    scale = rng.random((rows, groups)).astype(np.float32) + 0.5
    mean = rng.standard_normal((rows, groups)).astype(np.float32) * 0.1

    op = _ref(
        m.MojoNF4DequantEmbedding,
        jnp.asarray(packed), jnp.asarray(scale), jnp.asarray(mean),
        group_size=gs, vocab_start_id=10, output_dtype=jnp.float32,
    )
    ids = jnp.array([[10, 15], [9, 16]], jnp.int32)  # 9 and 16 out of range
    out = np.asarray(op(ids))
    code = np.asarray(NF4_CODEBOOK, np.float32)
    # interleaved unpack: low nibble first
    vals = np.empty((rows, groups * gs), np.float32)
    vals[:, 0::2] = code[idx[:, 0::2]]
    vals[:, 1::2] = code[idx[:, 1::2]]
    want = (
        vals.reshape(rows, groups, gs) * scale[..., None] + mean[..., None]
    ).reshape(rows, -1)
    np.testing.assert_allclose(out[0, 0], want[0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out[0, 1], want[5], rtol=1e-3, atol=1e-3)
    assert (out[1, 0] == 0).all() and (out[1, 1] == 0).all()
    # helper and op agree
    helper = np.asarray(
        dequantize_nf4_rows(
            jnp.asarray(packed), jnp.asarray(scale), jnp.asarray(mean),
            group_size=gs, output_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(helper, want, rtol=1e-3, atol=1e-3)


def test_over_encoding_full_matches_composition():
    vocab, dim, oe_dim, sizes, grams = 200, 16, 8, [32, 41], [2, 3]
    op = _ref(
        m.MojoOverEncoding, vocab, dim, oe_dim, sizes, grams,
        key=jax.random.PRNGKey(5),
    )
    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 4), 0, vocab)
    hist = jax.random.randint(jax.random.PRNGKey(7), (2, 2), 0, vocab)
    out = op(ids, hist)
    assert out.shape == (2, 4, dim)
    # composition oracle
    ng = op.ngram(ids, hist).astype(jnp.int32)
    mega = op.oe_mega_embedding(ng).reshape(2, 4, -1)
    base = op.ori_embedding(ids)
    want = op.oe_up_proj(jnp.concatenate([base, mega], axis=-1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_parallel_embedding_sharded_matches_dense():
    """Vocab-sharded lookup inside shard_map == dense lookup
    (reference embedding.py:73-131)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("tp",))
    vocab, dim = 32, 8
    table = randn(0, (vocab, dim))
    op = _ref(
        m.MojoParallelEmbedding, vocab, dim, axis_name="tp", num_shards=n,
        key=jax.random.PRNGKey(0),
    )
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, vocab)

    def fn(shard_table, ids):
        return op.replace(weight=shard_table)(ids)

    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P("tp", None), P()), out_specs=P(),
    )(table, ids)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(table[ids]), rtol=1e-6, atol=1e-6
    )


# -- Norm variants -------------------------------------------------------


def test_layernorm_quant_matches_composition():
    D = 64
    op = _ref(m.MojoLayerNormQuant, D, eps=1e-5)
    ln = _ref(m.MojoLayerNorm, D, eps=1e-5)
    x = randn(0, (4, D), scale=3.0)
    q, scale = op(x)
    assert q.dtype == jnp.int8
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    np.testing.assert_allclose(deq, np.asarray(ln(x)), atol=np.asarray(scale).max())
    # smooth scale path
    ss = jnp.full((D,), 2.0, jnp.float32)
    q2, s2 = op(x, smooth_scale=ss)
    deq2 = np.asarray(q2, np.float32) * np.asarray(s2)
    np.testing.assert_allclose(deq2, np.asarray(ln(x)) * 2.0, atol=2 * np.asarray(s2).max())


def test_residual_add_layernorm_pre_and_post():
    D = 32
    x, res = randn(0, (3, D)), randn(1, (3, D))
    ln = _ref(m.MojoLayerNorm, D)
    pre = _ref(m.MojoResidualAddLayerNorm, D, norm_pos="pre")
    h, r = pre(x, res)
    np.testing.assert_allclose(np.asarray(r), np.asarray(x + res), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ln(x + res)), rtol=1e-5, atol=1e-6)
    post = _ref(m.MojoResidualAddLayerNorm, D, norm_pos="post")
    h2, r2 = post(x, res)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(ln(x + res)), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(h2))


def test_group_layernorm_matches_per_group_layernorm():
    G, D = 3, 16
    op = _ref(exp.MojoGroupLayerNorm, G, D, 1e-5)
    groups = [randn(i, (4, D)) for i in range(G)]
    outs = op(groups)
    ln = _ref(m.MojoLayerNorm, D, eps=1e-5)
    for g in range(G):
        np.testing.assert_allclose(
            np.asarray(outs[g]), np.asarray(ln(groups[g])), rtol=1e-5, atol=1e-6
        )


def test_inplace_norm_variants_match_functional():
    D = 24
    x = randn(0, (5, D))
    rms = _ref(m.MojoRMSNorm, D, eps=1e-6)
    rms_ip = _ref(exp.MojoRMSNormInplace, D, eps=1e-6, inplace=True)
    np.testing.assert_allclose(np.asarray(rms_ip(x)), np.asarray(rms(x)), rtol=1e-6)

    G = 2
    groups = [randn(i + 1, (3, D)) for i in range(G)]
    g_rms = _ref(m.MojoGroupRMSNorm, G, D, 1e-6)
    g_ip = _ref(exp.MojoGroupRMSNormInplace, G, D, 1e-6, inplace=True)
    for a, b in zip(g_ip(groups), g_rms(groups)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


# -- RoPE ----------------------------------------------------------------


def test_mrope_inplace_matches_mrope():
    T, H, D = 6, 2, 12
    section = [2, 2, 2]
    q = randn(0, (T, H * D))
    k = randn(1, (T, H * D))
    cos = randn(2, (3, T, D)).astype(jnp.float32)
    sin = randn(3, (3, T, D)).astype(jnp.float32)
    base = _ref(m.MojoMRoPE)
    ip = _ref(exp.MojoMRoPEInplace, inplace=True)
    q1, k1 = base(q, k, cos, sin, section, head_dim=D)
    q2, k2 = ip(q, k, cos, sin, section, head_dim=D)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k1), rtol=1e-6)


# -- Paged MLA / NSA / Sage ---------------------------------------------

MLA_KW = dict(num_heads=4, qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8,
              kv_lora_rank=16)


def test_paged_prefill_mla_matches_dense_prefill():
    dense = _ref(exp.MojoPrefillMLA, **MLA_KW, key=jax.random.PRNGKey(1))
    paged = _ref(exp.MojoPagedPrefillMLA, **MLA_KW, key=jax.random.PRNGKey(1))
    paged = paged.replace(kv_b_proj=dense.kv_b_proj)

    bs, NB, N = 4, 3, 8
    lens = [7, 4]
    T = sum(lens)
    cu = jnp.array([0, 7, 11], jnp.int32)
    q = randn(0, (T, 4, 12))
    ckv = randn(1, (T, 16))
    kpe = randn(2, (T, 1, 4))

    # scatter the flat ckv/kpe into paged caches per the block tables
    bt = np.array([[0, 1, -1], [4, -1, -1]], np.int32)
    ckv_cache = np.zeros((N, 1, bs, 16), np.float32)
    kpe_cache = np.zeros((N, 1, bs, 4), np.float32)
    off = 0
    for i, sl in enumerate(lens):
        for t in range(sl):
            blk, pos = bt[i, t // bs], t % bs
            ckv_cache[blk, 0, pos] = np.asarray(ckv[off + t])
            kpe_cache[blk, 0, pos] = np.asarray(kpe[off + t, 0])
        off += sl

    got = paged(q, jnp.asarray(ckv_cache), jnp.asarray(kpe_cache), cu, jnp.asarray(bt))
    want = dense(q, ckv, kpe, cu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


NSA_KW = dict(num_heads=2, head_dim=8, compress_ratio=2, num_selected_blocks=2,
              block_size=4, window_size=4)


def test_paged_decode_nsa_matches_dense():
    dense = _ref(exp.MojoDecodeNSA, **NSA_KW, key=jax.random.PRNGKey(3))
    paged = _ref(exp.MojoPagedDecodeNSA, **NSA_KW, key=jax.random.PRNGKey(3))
    paged = paged.replace(gate_proj=dense.gate_proj)

    B, bs, N = 2, 4, 8
    lens = jnp.array([10, 6], jnp.int32)
    bt = jnp.array([[1, 3, 5], [2, 6, -1]], jnp.int32)
    k_cache = randn(0, (N, 2, bs, 8))
    v_cache = randn(1, (N, 2, bs, 8))
    q = randn(2, (B, 2, 8))
    got = paged(q, k_cache, v_cache, lens, bt)
    for b in range(B):
        sl = int(lens[b])
        nb = -(-sl // bs)
        k = jnp.concatenate([jnp.swapaxes(k_cache[int(bt[b, j])], 0, 1) for j in range(nb)])[:sl]
        v = jnp.concatenate([jnp.swapaxes(v_cache[int(bt[b, j])], 0, 1) for j in range(nb)])[:sl]
        want = dense(q[b : b + 1], k[None], v[None], jnp.array([sl], jnp.int32))
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want[0]), atol=2e-5, rtol=2e-5)


def test_paged_prefill_nsa_matches_dense():
    dense = _ref(exp.MojoPrefillNSA, **NSA_KW, key=jax.random.PRNGKey(4))
    paged = _ref(exp.MojoPagedPrefillNSA, **NSA_KW, key=jax.random.PRNGKey(4))
    paged = paged.replace(gate_proj=dense.gate_proj)

    bs, N = 4, 6
    lens = [6, 3]
    T = sum(lens)
    cu = jnp.array([0, 6, 9], jnp.int32)
    q = randn(0, (T, 2, 8))
    k = randn(1, (T, 2, 8))
    v = randn(2, (T, 2, 8))

    bt = np.array([[0, 2], [4, -1]], np.int32)
    k_cache = np.zeros((N, 2, bs, 8), np.float32)
    v_cache = np.zeros((N, 2, bs, 8), np.float32)
    off = 0
    for i, sl in enumerate(lens):
        for t in range(sl):
            blk, pos = bt[i, t // bs], t % bs
            k_cache[blk, :, pos] = np.asarray(k[off + t])
            v_cache[blk, :, pos] = np.asarray(v[off + t])
        off += sl

    got = paged(q, jnp.asarray(k_cache), jnp.asarray(v_cache), cu, jnp.asarray(bt))
    want = dense(q, k, v, cu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_sage_paged_prefill_close_to_fp_attention():
    """int8 Q/K + requantized PV ≈ fp paged prefill within quant noise
    (reference experimental/operators/attention.py:1641-1840)."""
    from ..utils import make_paged_case

    case = make_paged_case(
        key=9, hq=4, hkv=2, head_dim=16, seq_lens=(7, 5, 3), q_lens=(7, 5, 3)
    )
    key_cache, value_cache = case["key_cache"], case["value_cache"]
    cu, bt = case["cu_q_lens"], case["block_tables"]
    q = randn(11, (case["total_q"], case["hq"], case["head_dim"]))
    T, Hq, D = q.shape
    N, Hkv, bs, _ = key_cache.shape

    # quantize q per (head, token), k per (block, head, pos), v per channel
    qf = q.astype(jnp.float32)
    q_scale = jnp.clip(jnp.max(jnp.abs(qf), axis=-1), 1e-6) / 127.0  # (T, Hq)
    q_i8 = jnp.clip(jnp.round(qf / q_scale[..., None]), -128, 127).astype(jnp.int8)
    kf = key_cache.astype(jnp.float32)
    k_scale = jnp.clip(jnp.max(jnp.abs(kf), axis=-1), 1e-6) / 127.0  # (N, Hkv, bs)
    k_i8 = jnp.clip(jnp.round(kf / k_scale[..., None]), -128, 127).astype(jnp.int8)
    vf = value_cache.astype(jnp.float32)
    v_scale = jnp.clip(jnp.max(jnp.abs(vf), axis=(0, 2)), 1e-6) / 127.0  # (Hkv, D)
    v_i8 = jnp.clip(
        jnp.round(vf / v_scale[None, :, None, :]), -128, 127
    ).astype(jnp.int8)

    sage = _ref(exp.MojoPagedPrefillSageGQA, gqa_layout="AABB")
    got = sage(q_i8, q_scale.T, k_i8, k_scale, v_i8, v_scale, cu, bt)

    fp = _ref(m.MojoPagedPrefillGQA, gqa_layout="AABB")
    want = fp(q, key_cache, value_cache, cu, bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.06, rtol=0.1)


# -- Functions & dispatch machinery --------------------------------------


def test_diffusion_attention_matches_sdpa_and_differentiates():
    from mojo_opset_tpu.experimental.functions.diffusion_attention import (
        block_diffusion_mask,
        mojo_diffusion_attention,
    )

    B, H, S, D = 2, 2, 8, 8
    q, k, v = randn(0, (B, H, S, D)), randn(1, (B, H, S, D)), randn(2, (B, H, S, D))
    mask = block_diffusion_mask(S, 4)
    scale = 1.0 / np.sqrt(D)
    out = mojo_diffusion_attention(q, k, v, mask, scale=scale)

    # numpy oracle
    s = np.einsum("bhsd,bhtd->bhst", np.asarray(q), np.asarray(k)) * scale
    s = np.where(np.asarray(mask)[None, None], s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhst,bhtd->bhsd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5, rtol=2e-5)

    from mojo_opset_tpu.experimental.functions.diffusion_attention import (
        MojoDiffusionAttentionFunction,
    )

    fn = MojoDiffusionAttentionFunction()
    val, grads = fn.value_and_grad(q, k, v, mask, scale, argnums=(0, 1, 2))
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_fused_linear_ce_function_form_matches_loss_form():
    V, Dm, T = 50, 16, 12
    x = randn(0, (T, Dm))
    w = randn(1, (V, Dm), scale=0.1)
    t = jax.random.randint(jax.random.PRNGKey(2), (T,), 0, V)
    fn = _ref(m.MojoFusedLinearCrossEntropyFunction)
    loss_mod = _ref(m.MojoFusedLinearCrossEntropyLoss)
    np.testing.assert_allclose(
        float(fn(x, w, t)), float(loss_mod(w, x, t)), rtol=1e-6
    )
    # oracle: plain logits + CE
    logits = np.asarray(x @ w.T, np.float64)
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1)
    nll = lse - logits[np.arange(T), np.asarray(t)]
    np.testing.assert_allclose(float(fn(x, w, t)), nll.mean(), rtol=1e-4)


def test_backend_registry_and_function_dispatch():
    """Defining a core op auto-creates a registry + ref tier; a named tier
    subclass auto-registers and MOJO_BACKEND selects it
    (reference core/operator.py:22-51, backend_registry.py:48-118)."""
    from mojo_opset_tpu.core.operator import MojoOperator

    class MojoCovGapDemo(MojoOperator):
        def __init__(self, k: float = 2.0):
            super().__init__()
            self.k = k

        def forward(self, x):
            return x * self.k

    class XlaCovGapDemo(MojoCovGapDemo):
        def forward(self, x):
            return x * self.k + 0.0

    reg = MojoCovGapDemo._registry
    assert reg.operator_name == "CovGapDemo"
    assert set(MojoCovGapDemo.get_registered_backends()) >= {"ref", "xla"}

    import os

    old = os.environ.get("MOJO_BACKEND")
    try:
        os.environ["MOJO_BACKEND"] = "xla"
        op = MojoCovGapDemo(3.0)
        assert type(op).__name__ == "XlaCovGapDemo"
    finally:
        if old is None:
            os.environ.pop("MOJO_BACKEND", None)
        else:
            os.environ["MOJO_BACKEND"] = old
    x = jnp.ones((2,))
    np.testing.assert_allclose(np.asarray(op(x)), 3.0)
    # parity helper runs
    ref = MojoCovGapDemo.get_backend_impl("ref")(3.0)
    op.forward_diff_with(ref, x)
