"""GEMM / quantization matrix vs float64 numpy oracles.

Reference analogue: tests/accuracy/operators/test_gemm.py (515 LoC —
shape/dtype/transpose matrices for Gemm, GroupGemm, QuantGemm) plus the
quantize.py family.  Every claim below is checked against a from-scratch
float64 oracle with randomized adversarial shapes (zero-sized groups,
saturating ranges, non-uniform scales).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m

from ..utils import randn, tiers_of


def _q64(x, scale, lo=-128, hi=127):
    return np.clip(np.round(np.asarray(x, np.float64) / np.asarray(scale, np.float64)),
                   lo, hi)


@pytest.mark.parametrize("bias", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gemm_linear_semantics(bias, dtype):
    op = m.MojoGemm(12, 7, bias=bias, key=jax.random.PRNGKey(3))
    x = randn(0, (5, 12), dtype)
    got = np.asarray(op(x), np.float64)
    want = np.asarray(x, np.float64) @ np.asarray(op.weight, np.float64).T
    if bias:
        want = want + np.asarray(op.bias, np.float64)
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else dict(rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got, want, **tol)
    assert op(x).dtype == dtype


def test_gemm_ctor_validation():
    with pytest.raises(ValueError):
        m.MojoGemm(4, 4, weight=jnp.zeros((4, 4)))
    with pytest.raises(ValueError):
        m.MojoGemm(weight=jnp.zeros((4,)))
    with pytest.raises(ValueError):
        m.MojoGemm(in_features=4)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("trans_weight", [False, True])
def test_group_gemm_random_ragged_splits(seed, trans_weight):
    """Random splits including ZERO-sized groups; every tier must match the
    per-group float64 oracle."""
    rng = np.random.default_rng(seed)
    G, K, N = 4, 16, 8
    counts = rng.multinomial(24, np.ones(G) / G)
    if seed % 2:
        counts[rng.integers(G)] = 0  # force an empty group
    T = int(counts.sum())
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((G, K, N)), jnp.float32)
    w_stored = jnp.swapaxes(w, 1, 2) if trans_weight else w
    gl = jnp.asarray(counts, jnp.int32)

    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    want = np.concatenate([
        np.asarray(x, np.float64)[starts[g]:starts[g] + counts[g]] @ np.asarray(w, np.float64)[g]
        for g in range(G)
    ]) if T else np.zeros((0, N))

    for tier in ["ref"] + tiers_of(m.MojoGroupGemm):
        op = m.MojoGroupGemm.get_backend_impl(tier)(weight=w_stored, trans_weight=trans_weight)
        try:
            got = np.asarray(op(x, gl), np.float64)
        except Exception as e:  # pallas tier needs a TPU unless interpreted
            if tier == "pallas":
                pytest.skip(f"pallas tier unavailable here: {type(e).__name__}")
            raise
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4, err_msg=tier)


def test_group_gemm_group_count_mismatch_rejected():
    op = m.MojoGroupGemm(weight=jnp.zeros((3, 4, 4)))
    with pytest.raises((AssertionError, TypeError)):
        op(jnp.zeros((6, 4)), jnp.asarray([3, 3], jnp.int32))


@pytest.mark.parametrize("trans_weight", [False, True])
@pytest.mark.parametrize("out_dtype", [jnp.bfloat16, jnp.float16, jnp.float32])
def test_quant_gemm_matrix(trans_weight, out_dtype):
    rng = np.random.default_rng(0)
    T, K, N = 6, 32, 16
    x_q = jnp.asarray(rng.integers(-127, 128, (T, K)), jnp.int8)
    w_q = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    x_scale = jnp.asarray(rng.uniform(0.01, 0.1, (T,)), jnp.float32)
    w_scale = jnp.asarray(rng.uniform(0.01, 0.1, (N,)), jnp.float32)

    op = m.MojoQuantGemm(K, N, output_dtype=out_dtype, trans_weight=trans_weight)
    op = op.replace(weight=(jnp.swapaxes(w_q, 0, 1) if trans_weight else w_q),
                    weight_scale=w_scale.astype(jnp.bfloat16))
    got = op(x_q, x_scale)
    assert got.dtype == out_dtype
    want = (np.asarray(x_q, np.float64) @ np.asarray(w_q, np.float64)) \
        * np.asarray(x_scale, np.float64)[:, None] \
        * np.asarray(op.weight_scale, np.float64)[None, :]
    tol = 2e-2 if out_dtype != jnp.float32 else 1e-4
    np.testing.assert_allclose(np.asarray(got, np.float64), want, rtol=tol, atol=tol)


def test_quant_gemm_int4_dense_matrix():
    """Dense packed-int4 weights (weight_dtype="int4", beyond the
    reference's experts-only int4 — moe.py:452-667): exact integer parity
    vs the unpacked int8 math, plus the pack/unpack row-block roundtrip."""
    from mojo_opset_tpu.core.operators.gemm import pack_int4_rows, unpack_int4_rows

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.integers(-8, 8, (256, 32)), jnp.int8)
    packed = pack_int4_rows(q)
    assert packed.shape == (128, 32)
    np.testing.assert_array_equal(np.asarray(unpack_int4_rows(packed)), np.asarray(q))

    T, K, N = 6, 32, 256
    x_q = jnp.asarray(rng.integers(-127, 128, (T, K)), jnp.int8)
    w_q = jnp.asarray(rng.integers(-8, 8, (N, K)), jnp.int8)
    x_scale = jnp.asarray(rng.uniform(0.01, 0.1, (T,)), jnp.float32)
    w_scale = jnp.asarray(rng.uniform(0.01, 0.1, (N,)), jnp.float32)
    op = m.MojoQuantGemm(K, N, output_dtype=jnp.float32, trans_weight=True,
                         weight_dtype="int4")
    op = op.replace(weight=pack_int4_rows(w_q), weight_scale=w_scale)
    got = op(x_q, x_scale)
    want = (np.asarray(x_q, np.float64) @ np.asarray(w_q, np.float64).T) \
        * np.asarray(x_scale, np.float64)[:, None] \
        * np.asarray(w_scale, np.float64)[None, :]
    np.testing.assert_allclose(np.asarray(got, np.float64), want, rtol=1e-5, atol=1e-5)


def test_quant_gemm_int4_pallas_kernel_parity():
    """int4_scaled_matmul (interpret mode) vs the ref-tier unpacked math."""
    from mojo_opset_tpu.backends.pallas.kernels.int4_matmul import int4_scaled_matmul
    from mojo_opset_tpu.core.operators.gemm import pack_int4_rows

    rng = np.random.default_rng(4)
    M, K, N = 16, 256, 384
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-8, 8, (N, K)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.5, 2.0, (M,)), jnp.float32)
    ws = jnp.asarray(rng.uniform(0.5, 2.0, (N,)), jnp.float32)
    got = int4_scaled_matmul(x, pack_int4_rows(w), xs, ws, out_dtype=jnp.float32,
                             bm=16, bk=128, interpret=True)
    want = (np.asarray(x, np.float64) @ np.asarray(w, np.float64).T) \
        * np.asarray(xs, np.float64)[:, None] * np.asarray(ws, np.float64)[None, :]
    np.testing.assert_allclose(np.asarray(got, np.float64), want, rtol=1e-5, atol=1e-5)


def test_quant_gemm_int4_ctor_validation():
    with pytest.raises(AssertionError):
        m.MojoQuantGemm(8, 256, weight_dtype="int4")  # needs trans_weight
    with pytest.raises(AssertionError):
        m.MojoQuantGemm(8, 200, weight_dtype="int4", trans_weight=True)  # N % 128
    op = m.MojoQuantGemm(8, 256, weight_dtype="int4", trans_weight=True)
    assert op.weight.shape == (128, 8)


def test_quant_gemm_rejects_bad_rank_and_dtype():
    op = m.MojoQuantGemm(8, 8)
    with pytest.raises(ValueError):
        op(jnp.zeros((2, 2, 8), jnp.int8), jnp.ones((2,)))
    with pytest.raises(AssertionError):
        m.MojoQuantGemm(8, 8, quant_dtype=jnp.int4)


@pytest.mark.parametrize("shape", [(5, 16), (2, 3, 16)])
def test_static_quant_dequant_roundtrip_matrix(shape):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    op = m.MojoStaticQuant(16).replace(scale=jnp.asarray(rng.uniform(0.02, 0.1, (16,)),
                                                         jnp.float32))
    q, scale = op(x)
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q, np.float64), _q64(x, scale))
    # dequant inverts up to half a quant step
    dq = m.MojoDequant(output_dtype=jnp.float32)(q, scale)
    err = np.abs(np.asarray(dq, np.float64) - np.asarray(x, np.float64))
    assert (err <= 0.5 * np.asarray(scale, np.float64) + 1e-6).all()


def test_static_quant_shape_mismatch_rejected():
    op = m.MojoStaticQuant(16)
    with pytest.raises(ValueError):
        op(jnp.zeros((4, 8)))


def test_static_quant_saturates_at_int8_range():
    op = m.MojoStaticQuant(4)  # scale = 1
    q, _ = op(jnp.asarray([[1000.0, -1000.0, 127.4, -128.4]]))
    np.testing.assert_array_equal(np.asarray(q)[0], [127, -128, 127, -128])


def test_dynamic_quant_tiny_rows_use_unit_scale():
    """Rows with max-abs below the 1e-6 threshold quantize with scale 1
    (the reference's degenerate-row guard)."""
    op = m.MojoDynamicQuant()
    x = jnp.asarray([[1e-8, -2e-8, 0.0, 1e-9], [1.0, -2.0, 0.5, 0.25]], jnp.float32)
    q, scale = op(x)
    np.testing.assert_allclose(np.asarray(scale)[0], 1.0)
    np.testing.assert_array_equal(np.asarray(q)[0], [0, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(scale)[1], 2.0 / 127.0, rtol=1e-6)
    assert np.asarray(q)[1, 1] == -127


def test_dynamic_quant_smooth_scale_folds_in():
    rng = np.random.default_rng(2)
    D = 8
    x = jnp.asarray(rng.standard_normal((4, D)), jnp.float32)
    inv = jnp.asarray(rng.uniform(0.5, 2.0, (D,)), jnp.float32)
    op = m.MojoDynamicQuant(D).replace(inv_smooth_scale=inv)
    q, scale = op(x)
    sm = np.asarray(x, np.float64) * np.asarray(inv, np.float64)
    want_scale = np.clip(np.abs(sm).max(-1, keepdims=True), 1e-12, None) / 127.0
    np.testing.assert_allclose(np.asarray(scale, np.float64), want_scale, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(q, np.float64), _q64(sm, want_scale))


@pytest.mark.parametrize("counts", [[3, 0, 5], [8, 0, 0]])
def test_moe_dynamic_quant_grouped_smooth_scales(counts):
    """Each token uses ITS expert's smooth scale, including empty experts."""
    rng = np.random.default_rng(3)
    E, D = 3, 8
    T = sum(counts)
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    smooth = jnp.asarray(rng.uniform(0.5, 2.0, (E, D)), jnp.float32)
    op = m.MojoMoEDynamicQuant(E, D).replace(inv_smooth_scale=smooth)
    q, scale = op(x, jnp.asarray(counts, jnp.int32))
    expert_of = np.repeat(np.arange(E), counts)
    sm = np.asarray(x, np.float64) * np.asarray(smooth, np.float64)[expert_of]
    want_scale = np.clip(np.abs(sm).max(-1, keepdims=True), 1e-12, None) / 127.0
    np.testing.assert_allclose(np.asarray(scale, np.float64), want_scale, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(q, np.float64), _q64(sm, want_scale))


@pytest.mark.parametrize("activate_left", [False, True])
def test_dequant_swiglu_quant_full_oracle(activate_left):
    rng = np.random.default_rng(4)
    E, H, T = 2, 8, 6
    counts = [2, 4]
    x = jnp.asarray(rng.integers(-100, 100, (T, 2 * H)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.01, 0.05, (E, 2 * H)), jnp.float32)
    qs = jnp.asarray(rng.uniform(0.5, 2.0, (E, H)), jnp.float32)
    act = jnp.asarray(rng.uniform(0.5, 1.5, (T,)), jnp.float32)
    op = m.MojoDequantSwiGLUQuant(E, H, activate_left=activate_left)
    op = op.replace(weight_scale=ws, quant_scale=qs)
    q, scale = op(x, activation_scale=act, token_count=jnp.asarray(counts, jnp.int32))

    expert_of = np.repeat(np.arange(E), counts)
    xf = np.asarray(x, np.float64) * np.asarray(ws, np.float64)[expert_of] \
        * np.asarray(act, np.float64)[:, None]
    left, right = xf[:, :H], xf[:, H:]

    def silu(v):
        return v / (1 + np.exp(-v))

    out = (silu(left) * right) if activate_left else (silu(right) * left)
    out = out * np.asarray(qs, np.float64)[expert_of]
    want_scale = np.clip(np.abs(out).max(-1, keepdims=True), 1e-12, None) / 127.0
    np.testing.assert_allclose(np.asarray(scale, np.float64), want_scale, rtol=1e-4)
    got_dq = np.asarray(q, np.float64) * np.asarray(scale, np.float64)
    assert (np.abs(got_dq - out) <= 0.55 * want_scale + 1e-6).all()


def test_dequant_swiglu_quant_validation():
    op = m.MojoDequantSwiGLUQuant(2, 8)
    with pytest.raises(ValueError):
        op(jnp.zeros((2, 3, 16), jnp.int8))
    with pytest.raises(ValueError):
        op(jnp.zeros((2, 15), jnp.int8))
    with pytest.raises(NotImplementedError):
        op(jnp.zeros((2, 16), jnp.int8), quant_offset=jnp.zeros((2,)))


def test_quant_gemm_int8_exactness_vs_int_math():
    """int8 x int8 with int32 accumulation must be EXACT (no fp fuzz) for
    unit scales — this is the MXU int-path correctness check."""
    rng = np.random.default_rng(5)
    T, K, N = 4, 64, 8
    x_q = jnp.asarray(rng.integers(-127, 128, (T, K)), jnp.int8)
    w_q = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    op = m.MojoQuantGemm(K, N, output_dtype=jnp.float32)
    op = op.replace(weight=w_q, weight_scale=jnp.ones((N,), jnp.bfloat16))
    got = np.asarray(op(x_q, jnp.ones((T,), jnp.float32)), np.int64)
    want = np.asarray(x_q, np.int64) @ np.asarray(w_q, np.int64)
    np.testing.assert_array_equal(got, want)


def test_quant_gemm_int4_pallas_tier_pads_decode_m():
    """The pallas tier must serve int4 at ANY M (decode M=1..7 pads up to
    the 8-row tile) instead of falling back to the XLA path, which would
    materialize the unpacked weight per call."""
    from mojo_opset_tpu.core.operators.gemm import pack_int4_rows

    rng = np.random.default_rng(5)
    K, N = 128, 256
    w_q = jnp.asarray(rng.integers(-8, 8, (N, K)), jnp.int8)
    w_scale = jnp.asarray(rng.uniform(0.01, 0.1, (N,)), jnp.float32)
    impl = m.MojoQuantGemm.get_backend_impl("pallas", strict=True)
    op = impl(K, N, output_dtype=jnp.float32, trans_weight=True,
              weight_dtype="int4")
    op = op.replace(weight=pack_int4_rows(w_q), weight_scale=w_scale)
    for M in (1, 3, 8):
        x_q = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        x_scale = jnp.asarray(rng.uniform(0.01, 0.1, (M,)), jnp.float32)
        got = op(x_q, x_scale)
        assert got.shape == (M, N)
        want = (np.asarray(x_q, np.float64) @ np.asarray(w_q, np.float64).T) \
            * np.asarray(x_scale, np.float64)[:, None] \
            * np.asarray(w_scale, np.float64)[None, :]
        np.testing.assert_allclose(np.asarray(got, np.float64), want,
                                   rtol=1e-5, atol=1e-5)
