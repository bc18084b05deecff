"""Pallas-tier parity tests (interpret mode on CPU).

Mirrors the reference's per-backend accuracy sweeps
(MOJO_BACKEND=ttx pytest tests/accuracy, ascend_accuracy_ci.yml:60-120):
every pallas op must match the golden within bf16-ish tolerance.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mojo_opset_tpu as m

from ..utils import make_paged_case, randn

pytestmark = pytest.mark.usefixtures("_force_interpret")


@pytest.fixture()
def _force_interpret(monkeypatch):
    # On-chip lane (MOJO_TEST_TPU=1): run through the real Mosaic compiler
    # — interpret mode cannot catch lowering/tiling bugs.
    if os.environ.get("MOJO_TEST_TPU", "0") != "1":
        monkeypatch.setenv("MOJO_PALLAS_INTERPRET", "1")


def test_pallas_rmsnorm_matches_ref():
    op_p = m.MojoRMSNorm.get_backend_impl("pallas", strict=True)(64, eps=1e-6)
    op_r = m.MojoRMSNorm.get_backend_impl("ref")(64, eps=1e-6)
    w = randn(1, (64,)) + 1.0
    op_p = op_p.replace(weight=w)
    op_r = op_r.replace(weight=w)
    x = randn(0, (16, 64), jnp.bfloat16)
    op_p.forward_diff_with(op_r, x, atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.float32])
def test_pallas_rmsnorm_fp16_fp32(dtype):
    """Mosaic has no f16; the kernel tier must bounce f16 through fp32
    (backends/pallas/kernels/_compat.py) instead of hard-crashing — the
    reference benchmark table has fp16 rows (ref tests/perf/benchmark.md)."""
    op_p = m.MojoRMSNorm.get_backend_impl("pallas", strict=True)(64, eps=1e-6)
    op_r = m.MojoRMSNorm.get_backend_impl("ref")(64, eps=1e-6)
    w = (randn(1, (64,)) + 1.0).astype(dtype)
    op_p = op_p.replace(weight=w)
    op_r = op_r.replace(weight=w)
    x = randn(0, (16, 64), dtype)
    out = op_p(x)
    assert out.dtype == dtype
    op_p.forward_diff_with(op_r, x, atol=1e-2, rtol=1e-2)


def test_pallas_residual_add_rmsnorm_fp16():
    op_p = m.MojoResidualAddRMSNorm.get_backend_impl("pallas", strict=True)(64, 1e-6, "pre")
    op_r = m.MojoResidualAddRMSNorm.get_backend_impl("ref")(64, 1e-6, "pre")
    w = (randn(1, (64,)) + 1.0).astype(jnp.float16)
    op_p = op_p.replace(weight=w)
    op_r = op_r.replace(weight=w)
    h = randn(0, (16, 64), jnp.float16)
    r = randn(2, (16, 64), jnp.float16)
    out, res = op_p(h, r)
    assert out.dtype == jnp.float16 and res.dtype == jnp.float16
    op_p.forward_diff_with(op_r, h, r, atol=1e-2, rtol=1e-2)


def test_pallas_paged_decode_fp16():
    case = make_paged_case(seq_lens=(9, 2, 16), head_dim=128)
    kc = case["key_cache"].astype(jnp.float16)
    vc = case["value_cache"].astype(jnp.float16)
    q = randn(5, (3, case["hq"], 128), jnp.float16)
    args = (q, kc, vc, case["seq_lens"], case["block_tables"])
    op_p = m.MojoPagedDecodeGQA.get_backend_impl("pallas", strict=True)()
    op_r = m.MojoPagedDecodeGQA.get_backend_impl("ref")()
    out = op_p(*args)
    assert out.dtype == jnp.float16
    op_p.forward_diff_with(op_r, *args, atol=2e-2, rtol=2e-2)


def test_pallas_group_gemm_fp16():
    """fp16 grouped matmul (TTXGroupGemm float16 rows in the reference
    table) through the f16 bounce."""
    rng = np.random.default_rng(11)
    G, M, K, N = 4, 64, 128, 128
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float16))
    w = jnp.asarray(rng.standard_normal((G, K, N)).astype(np.float16) * 0.1)
    gl = jnp.asarray([24, 8, 24, 8], jnp.int32)
    op_p = m.MojoGroupGemm.get_backend_impl("pallas", strict=True)(weight=w)
    op_r = m.MojoGroupGemm.get_backend_impl("ref")(weight=w)
    out = op_p(x, gl)
    assert out.dtype == jnp.float16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(op_r(x, gl), np.float32),
                               atol=5e-2, rtol=5e-2)


def test_pallas_residual_add_rmsnorm_matches_ref():
    for pos in ("pre", "post"):
        op_p = m.MojoResidualAddRMSNorm.get_backend_impl("pallas", strict=True)(64, 1e-6, pos)
        op_r = m.MojoResidualAddRMSNorm.get_backend_impl("ref")(64, 1e-6, pos)
        w = randn(1, (64,)) + 1.0
        op_p = op_p.replace(weight=w)
        op_r = op_r.replace(weight=w)
        h, r = randn(0, (16, 64)), randn(2, (16, 64))
        op_p.forward_diff_with(op_r, h, r, atol=1e-4, rtol=1e-4)


def test_pallas_rmsnorm_quant_matches_ref():
    op_p = m.MojoRMSNormQuant.get_backend_impl("pallas", strict=True)(64, 1e-6)
    op_r = m.MojoRMSNormQuant.get_backend_impl("ref")(64, 1e-6)
    x = randn(0, (8, 64), scale=2.0)
    qp, sp = op_p(x)
    qr, sr = op_r(x)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sr), rtol=1e-5)
    # int8 rounding may differ by 1 ulp at ties
    assert np.abs(np.asarray(qp, np.int32) - np.asarray(qr, np.int32)).max() <= 1


@pytest.mark.parametrize("layout", ["AABB", "ABAB"])
def test_pallas_paged_decode_matches_ref(layout):
    case = make_paged_case(seq_lens=(9, 2, 16), head_dim=128)
    q = randn(5, (3, case["hq"], 128))
    args = (q, case["key_cache"], case["value_cache"], case["seq_lens"], case["block_tables"])
    op_p = m.MojoPagedDecodeGQA.get_backend_impl("pallas", strict=True)(gqa_layout=layout)
    op_r = m.MojoPagedDecodeGQA.get_backend_impl("ref")(gqa_layout=layout)
    op_p.forward_diff_with(op_r, *args, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_pallas_paged_prefill_matches_ref():
    case = make_paged_case(seq_lens=(23, 5, 37), q_lens=(23, 5, 20), head_dim=128,
                           block_size=16, max_blocks=4)
    q = randn(7, (case["total_q"], case["hq"], 128))
    args = (q, case["key_cache"], case["value_cache"], case["cu_q_lens"],
            case["block_tables"], None, case["cu_total_seq_lens"])
    op_p = m.MojoPagedPrefillGQA.get_backend_impl("pallas", strict=True)()
    op_r = m.MojoPagedPrefillGQA.get_backend_impl("ref")()
    op_p.forward_diff_with(op_r, *args, atol=1e-4, rtol=1e-4)


def test_pallas_quant_gemm_matches_ref():
    """Fused-dequant int8 matmul vs the golden XLA dot path, both weight
    layouts and a non-square geometry."""
    rng = np.random.default_rng(7)
    for tw, (M, K, N) in (
        (False, (16, 256, 384)),
        (True, (24, 384, 128)),
    ):
        op_p = m.MojoQuantGemm.get_backend_impl("pallas", strict=True)(
            K, N, trans_weight=tw)
        op_r = m.MojoQuantGemm.get_backend_impl("ref")(K, N, trans_weight=tw)
        w = jnp.asarray(rng.integers(-127, 128, (N, K) if tw else (K, N), np.int8))
        ws = jnp.asarray(rng.uniform(0.5, 2, (N,)).astype(np.float32), jnp.bfloat16)
        op_p = op_p.replace(weight=w, weight_scale=ws)
        op_r = op_r.replace(weight=w, weight_scale=ws)
        x = jnp.asarray(rng.integers(-127, 128, (M, K), np.int8))
        xs = jnp.asarray(rng.uniform(0.01, 0.1, (M,)).astype(np.float32))
        got = np.asarray(op_p(x, xs), np.float32)
        want = np.asarray(op_r(x, xs), np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_pallas_quant_gemm_odd_geometry_falls_back():
    """Non-tileable K keeps correctness through the XLA fallback."""
    rng = np.random.default_rng(3)
    op_p = m.MojoQuantGemm.get_backend_impl("pallas", strict=True)(96, 128)
    op_r = m.MojoQuantGemm.get_backend_impl("ref")(96, 128)
    w = jnp.asarray(rng.integers(-127, 128, (96, 128), np.int8))
    op_p = op_p.replace(weight=w)
    op_r = op_r.replace(weight=w)
    x = jnp.asarray(rng.integers(-127, 128, (5, 96), np.int8))
    xs = jnp.asarray(rng.uniform(0.01, 0.1, (5,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op_p(x, xs), np.float32), np.asarray(op_r(x, xs), np.float32),
        rtol=1e-2, atol=1e-2)


def _int8_paged_case(seq_lens, head_dim=128, q_lens=None, block_size=4, max_blocks=5):
    """make_paged_case with int8 caches + per-channel (Hkv, D) scales —
    the exact configuration the Qwen3 quant_kv serving mode drives."""
    rng = np.random.default_rng(3)
    case = make_paged_case(seq_lens=seq_lens, q_lens=q_lens, head_dim=head_dim,
                           block_size=block_size, max_blocks=max_blocks)
    hkv = case["key_cache"].shape[1]
    case["key_cache"] = jnp.asarray(
        rng.integers(-127, 128, case["key_cache"].shape, np.int8))
    case["value_cache"] = jnp.asarray(
        rng.integers(-127, 128, case["value_cache"].shape, np.int8))
    case["key_scale"] = jnp.asarray(
        rng.uniform(0.005, 0.02, (hkv, head_dim)).astype(np.float32))
    case["value_scale"] = jnp.asarray(
        rng.uniform(0.005, 0.02, (hkv, head_dim)).astype(np.float32))
    return case


@pytest.mark.slow
def test_pallas_paged_decode_kv_dequant_matches_ref():
    """Scale-folding int8-KV decode (serving path) vs the ref dequant."""
    from mojo_opset_tpu.experimental.operators import MojoPagedDecodeGQAWithKVDequant

    case = _int8_paged_case(seq_lens=(9, 2, 16))
    q = randn(5, (3, case["hq"], 128), jnp.bfloat16)
    args = (q, None, case["key_cache"], case["key_scale"], case["value_cache"],
            case["value_scale"], case["seq_lens"], case["block_tables"])
    op_p = MojoPagedDecodeGQAWithKVDequant.get_backend_impl("pallas", strict=True)(
        query_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    op_r = MojoPagedDecodeGQAWithKVDequant.get_backend_impl("ref")(
        query_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    op_p.forward_diff_with(op_r, *args, atol=2e-2, rtol=2e-2)


@pytest.mark.slow
def test_pallas_paged_prefill_kv_dequant_matches_ref():
    from mojo_opset_tpu.experimental.operators import MojoPagedPrefillGQAWithKVDequant

    case = _int8_paged_case(seq_lens=(23, 5, 37), q_lens=(23, 5, 20),
                            block_size=16, max_blocks=4)
    q = randn(7, (case["total_q"], case["hq"], 128), jnp.bfloat16)
    args = (q, None, case["key_cache"], case["key_scale"], case["value_cache"],
            case["value_scale"], case["cu_q_lens"], case["block_tables"], None,
            case["cu_total_seq_lens"])
    op_p = MojoPagedPrefillGQAWithKVDequant.get_backend_impl("pallas", strict=True)(
        gqa_layout="AABB", query_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    op_r = MojoPagedPrefillGQAWithKVDequant.get_backend_impl("ref")(
        gqa_layout="AABB", query_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    op_p.forward_diff_with(op_r, *args, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("mode", ["prefill", "decode"])
def test_accel_store_mixed_f16_states_bf16_cache(mode):
    """Regression: f16 states into a bf16 cache keep the cache dtype
    exactly through the accelerated store tier (the r4 Pallas store tier
    once squeezed the cache through a uint16 bitcast; the r5 tier is the
    XLA scatter/merge, which must cast states to the cache dtype and
    never touch the cache's own type)."""
    rng = np.random.default_rng(5)
    N, bs, Hkv, D = 8, 4, 2, 128
    kc = jnp.asarray(rng.standard_normal((N, bs, Hkv, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((N, bs, Hkv, D)), jnp.bfloat16)
    if mode == "prefill":
        q_lens = (5, 3)
        ctx = (0, 2)
        T = sum(q_lens)
        cu_q = jnp.asarray([0, 5, 8], jnp.int32)
        ctx_lens = jnp.asarray(ctx, jnp.int32)
    else:
        T = 2
        cu_q = None
        ctx_lens = jnp.asarray([1, 6], jnp.int32)
    bt = jnp.asarray([[0, 1, -1], [2, 3, -1]], jnp.int32)
    ks = jnp.asarray(rng.standard_normal((T, Hkv, D)), jnp.float16)
    vs = jnp.asarray(rng.standard_normal((T, Hkv, D)), jnp.float16)
    op_p = m.MojoStorePagedKVCache.get_backend_impl("xla", strict=True)(kv_layout="NHD")
    op_r = m.MojoStorePagedKVCache.get_backend_impl("ref")(kv_layout="NHD")
    got_k, got_v = op_p(ks, vs, kc, vc, bt, cu_q, ctx_lens)
    want_k, want_v = op_r(ks, vs, kc, vc, bt, cu_q, ctx_lens)
    for got, want in ((got_k, want_k), (got_v, want_v)):
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=1e-2, rtol=1e-2)


# -- ApplyRoPE kernel ---------------------------------------------------


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.float16],
                         ids=["f32", "bf16", "f16"])
@pytest.mark.parametrize("layout", ["head_first", "token_first"])
def test_pallas_apply_rope_matches_ref(layout, dtype):
    rng = np.random.default_rng(11)
    D = 128
    ref = m.MojoApplyRoPE.get_backend_impl("ref")()
    pal = m.MojoApplyRoPE.get_backend_impl("pallas", strict=True)()
    if layout == "head_first":
        B, Hq, Hk, S = 2, 4, 2, 64
        q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), dtype)
        k = jnp.asarray(rng.standard_normal((B, Hk, S, D)), dtype)
        cos = jnp.asarray(rng.standard_normal((1, S, D)), jnp.float32)
        sin = jnp.asarray(rng.standard_normal((1, S, D)), jnp.float32)
        hf = True
    else:
        T, Hq, Hk = 48, 4, 2
        q = jnp.asarray(rng.standard_normal((T, Hq, D)), dtype)
        k = jnp.asarray(rng.standard_normal((T, Hk, D)), dtype)
        cos = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
        sin = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
        hf = False
    want_q, want_k = ref(q, k, cos, sin, head_first=hf)
    got_q, got_k = pal(q, k, cos, sin, head_first=hf)
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    for got, want in ((got_q, want_q), (got_k, want_k)):
        assert got.dtype == want.dtype
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=tol, rtol=tol)


def test_pallas_apply_rope_partial_and_unaligned_fall_back():
    rng = np.random.default_rng(3)
    pal = m.MojoApplyRoPE.get_backend_impl("pallas", strict=True)()
    ref = m.MojoApplyRoPE.get_backend_impl("ref")()
    # partial rope (nope_dim > 0): cos narrower than head_dim
    T, H, D, R = 16, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    cos = jnp.asarray(rng.standard_normal((T, R)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((T, R)), jnp.float32)
    got = pal(q, k, cos, sin, head_first=False)
    want = ref(q, k, cos, sin, head_first=False)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-6)
    # unaligned head_dim (D=32) falls back too
    q = jnp.asarray(rng.standard_normal((8, 2, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((8, 2, 32)), jnp.float32)
    cos = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    got = pal(q, k, cos, sin, head_first=False)
    want = ref(q, k, cos, sin, head_first=False)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-6)


@pytest.mark.skipif(os.environ.get("MOJO_TEST_TPU", "0") != "1",
                    reason="in-tree flash Sdpa has no interpret path")
@pytest.mark.parametrize("L,mask_kind", [
    (1560, None),          # DiT (1,60,104) latent: tile-unaligned, maskless
    (1560, "key_pad"),     # key-padding mask rides segment ids
    (512, "key_pad"),
])
def test_pallas_sdpa_unaligned_and_key_padding(L, mask_kind):
    # On-chip only: the padded+segment-id flash path must match the golden
    # for the DiT geometry (modeling_wan.py self/cross attention)
    B, H, D = 1, 4, 128
    q = randn(0, (B, H, L, D), jnp.bfloat16)
    k = randn(1, (B, H, L, D), jnp.bfloat16)
    v = randn(2, (B, H, L, D), jnp.bfloat16)
    mask = None
    if mask_kind == "key_pad":
        valid = jnp.arange(L) < (L - 77)
        mask = valid[None, None, None, :]
    op_p = m.MojoSdpa.get_backend_impl("pallas", strict=True)()
    op_r = m.MojoSdpa.get_backend_impl("ref")()
    got = np.asarray(op_p(q, k, v, attn_mask=mask), np.float32)
    want = np.asarray(op_r(q, k, v, attn_mask=mask), np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)
