"""Normalization family matrix vs a float64 numpy oracle.

Reference analogue: tests/accuracy/operators/test_normalization.py
(644 LoC — shape/dtype/norm-pos/smooth-scale matrices for all 10 core +
4 experimental norm ops).  Every op is checked against a from-scratch
float64 oracle with RANDOM weights/biases (catching ones-weight
identities), across dtypes, ranks, smooth scales, both norm positions,
and the residual-return contracts the models rely on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import mojo_opset_tpu as m
import mojo_opset_tpu.experimental as exp

from ..utils import randn


def _rms64(x, w, eps):
    x = np.asarray(x, np.float64)
    n = x / np.sqrt((x**2).mean(-1, keepdims=True) + eps)
    return n * np.asarray(w, np.float64) if w is not None else n


def _ln64(x, w, b, eps):
    x = np.asarray(x, np.float64)
    n = (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + eps)
    if w is not None:
        n = n * np.asarray(w, np.float64)
    if b is not None:
        n = n + np.asarray(b, np.float64)
    return n


def _quant64(n, smooth, q_max, q_min):
    if smooth is not None:
        n = n * np.asarray(smooth, np.float64)
    scale = np.clip(np.abs(n).max(-1, keepdims=True), 1e-12, None) / q_max
    return np.clip(np.round(n / scale), q_min, q_max), scale


def _tol(dtype):
    return dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else dict(rtol=2e-5, atol=2e-5)


SHAPES = [(6, 32), (2, 3, 16), (1, 1, 8), (5, 64)]
DTYPES = [jnp.float32, jnp.bfloat16]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", DTYPES)
def test_rms_norm_matrix(shape, dtype):
    D = shape[-1]
    x = randn(0, shape, dtype)
    op = m.MojoRMSNorm(D, eps=1e-6).replace(weight=randn(1, (D,)) + 1.0)
    got = np.asarray(op(x), np.float64)
    want = _rms64(np.asarray(x, np.float64), op.weight, 1e-6)
    np.testing.assert_allclose(got, want, **_tol(dtype))
    assert op(x).dtype == dtype  # output dtype preserved


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("affine", [True, False])
def test_layer_norm_matrix(shape, affine):
    D = shape[-1]
    x = randn(0, shape)
    op = m.MojoLayerNorm(D, eps=1e-5, elementwise_affine=affine)
    if affine:
        op = op.replace(weight=randn(1, (D,)) + 1.0, bias=randn(2, (D,)))
    got = np.asarray(op(x), np.float64)
    want = _ln64(x, op.weight if affine else None, op.bias if affine else None, 1e-5)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("num_groups", [1, 3])
@pytest.mark.parametrize("affine", [True, False])
def test_group_rms_norm_matrix(num_groups, affine):
    D = 16
    op = m.MojoGroupRMSNorm(num_groups, D, eps=1e-6, elementwise_affine=affine)
    if affine:
        op = op.replace(weight=randn(1, (num_groups, D)) + 1.0)
    groups = [randn(10 + g, (4, D)) for g in range(num_groups)]
    outs = op(groups)
    assert len(outs) == num_groups
    for g in range(num_groups):
        w = op.weight[g] if affine else None
        np.testing.assert_allclose(
            np.asarray(outs[g], np.float64), _rms64(groups[g], w, 1e-6),
            rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("cls,oracle", [
    (m.MojoRMSNormQuant, "rms"), (m.MojoLayerNormQuant, "ln")])
@pytest.mark.parametrize("smooth", [False, True])
@pytest.mark.parametrize("quant_dtype", [jnp.int8, jnp.dtype("float8_e4m3fn")])
def test_norm_quant_matrix(cls, oracle, smooth, quant_dtype):
    D = 32
    x = randn(0, (6, D))
    op = cls(D, quant_dtype=quant_dtype)
    op = op.replace(weight=randn(1, (D,)) + 1.0)
    ss = (jnp.abs(randn(5, (D,))) + 0.5) if smooth else None
    q, scale = op(x, ss)
    assert q.dtype == quant_dtype
    normed = (_rms64(x, op.weight, op.variance_epsilon) if oracle == "rms"
              else _ln64(x, op.weight, getattr(op, "bias", None), op.variance_epsilon))
    q_max = 127.0 if quant_dtype == jnp.int8 else 448.0
    q_min = -128.0 if quant_dtype == jnp.int8 else -448.0
    want_q, want_scale = _quant64(normed, ss, q_max, q_min)
    np.testing.assert_allclose(np.asarray(scale, np.float64), want_scale, rtol=1e-4)
    got_dq = np.asarray(q, np.float64) * np.asarray(scale, np.float64)
    ref_fp = normed * (np.asarray(ss, np.float64) if smooth else 1.0)
    step = np.asarray(want_scale)
    if quant_dtype == jnp.int8:
        # dequantized value must match the fp oracle within one quant step
        assert (np.abs(got_dq - ref_fp) <= 0.55 * step + 1e-6).all()
    else:
        # fp8 e4m3: the cast after rounding re-quantizes to 3 mantissa bits
        # (~1/16 relative step) on top of the integer-grid rounding
        assert (np.abs(got_dq - ref_fp) <= np.abs(ref_fp) / 8 + 0.55 * step + 1e-6).all()


@pytest.mark.parametrize("cls,kind", [
    (m.MojoResidualAddRMSNorm, "rms"), (m.MojoResidualAddLayerNorm, "ln")])
@pytest.mark.parametrize("norm_pos", ["pre", "post"])
@pytest.mark.parametrize("dtype", DTYPES)
def test_residual_add_norm_matrix(cls, kind, norm_pos, dtype):
    D = 32
    h = randn(0, (4, D), dtype)
    r = randn(1, (4, D), dtype)
    op = cls(D, norm_pos=norm_pos).replace(weight=randn(2, (D,)) + 1.0)
    out, res = op(h, r)
    s = np.asarray(h, np.float64) + np.asarray(r, np.float64)
    want = _rms64(s, op.weight, op.variance_epsilon) if kind == "rms" else _ln64(
        s, op.weight, getattr(op, "bias", None), op.variance_epsilon)
    np.testing.assert_allclose(np.asarray(out, np.float64), want, **_tol(dtype))
    if norm_pos == "pre":
        # pre: residual out = h + r (the running-residual contract)
        np.testing.assert_allclose(np.asarray(res, np.float64), s, **_tol(dtype))
    else:
        # post (non-quant): the normed value becomes the residual
        np.testing.assert_allclose(np.asarray(res, np.float64), want, **_tol(dtype))


@pytest.mark.parametrize("cls,kind", [
    (m.MojoResidualAddRMSNormQuant, "rms"), (m.MojoResidualAddLayerNormQuant, "ln")])
@pytest.mark.parametrize("norm_pos", ["pre", "post"])
@pytest.mark.parametrize("smooth", [False, True])
def test_residual_add_norm_quant_matrix(cls, kind, norm_pos, smooth):
    D = 32
    h = randn(0, (4, D))
    r = randn(1, (4, D))
    op = cls(D, norm_pos=norm_pos).replace(weight=randn(2, (D,)) + 1.0)
    ss = (jnp.abs(randn(5, (D,))) + 0.5) if smooth else None
    q, res, scale = op(h, r, ss)
    assert q.dtype == jnp.int8
    s = np.asarray(h, np.float64) + np.asarray(r, np.float64)
    normed = _rms64(s, op.weight, op.variance_epsilon) if kind == "rms" else _ln64(
        s, op.weight, getattr(op, "bias", None), op.variance_epsilon)
    want_q, want_scale = _quant64(normed, ss, 127.0, -128.0)
    np.testing.assert_allclose(np.asarray(scale, np.float64), want_scale, rtol=1e-4)
    got_dq = np.asarray(q, np.float64) * np.asarray(scale, np.float64)
    ref_fp = normed * (np.asarray(ss, np.float64) if smooth else 1.0)
    assert (np.abs(got_dq - ref_fp) <= 0.55 * np.asarray(want_scale) + 1e-6).all()
    if norm_pos == "pre":
        np.testing.assert_allclose(np.asarray(res, np.float64), s, rtol=2e-5, atol=2e-5)
    elif kind == "rms":
        np.testing.assert_allclose(np.asarray(res, np.float64), normed, rtol=2e-5, atol=2e-5)
    else:
        np.testing.assert_allclose(np.asarray(res, np.float64), s, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_channel_rms_norm_normalizes_channel_axis():
    # VAE norm: L2 over the channel axis (dim 1, NCHW) scaled by sqrt(C)
    C = 8
    x = randn(0, (2, C, 4, 5))
    op = exp.MojoChannelRMSNorm(C).replace(weight=randn(1, (C, 1, 1)) + 1.0)
    got = np.asarray(op(x), np.float64)
    x64 = np.asarray(x, np.float64)
    norm = np.maximum(np.sqrt((x64**2).sum(1, keepdims=True)), 1e-12)
    want = x64 / norm * np.sqrt(C) * np.asarray(op.weight, np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_inplace_variants_match_functional():
    D = 16
    x = randn(0, (4, D))
    w = randn(1, (D,)) + 1.0
    base = m.MojoRMSNorm(D).replace(weight=w)
    inp = exp.MojoRMSNormInplace(D).replace(weight=w)
    np.testing.assert_allclose(np.asarray(inp(x)), np.asarray(base(x)), rtol=1e-6)

    groups = [randn(2, (3, D)), randn(3, (5, D))]
    gbase = m.MojoGroupRMSNorm(2, D, eps=1e-6).replace(weight=randn(4, (2, D)) + 1.0)
    ginp = exp.MojoGroupRMSNormInplace(2, D, eps=1e-6).replace(weight=gbase.weight)
    for a, b in zip(ginp(groups), gbase(groups)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_group_layer_norm_matches_per_group_oracle():
    D = 16
    op = exp.MojoGroupLayerNorm(2, D, eps=1e-5)
    op = op.replace(weight=randn(1, (2, D)) + 1.0, bias=randn(2, (2, D)))
    groups = [randn(10, (4, D)), randn(11, (4, D))]
    outs = op(groups)
    for g in range(2):
        np.testing.assert_allclose(
            np.asarray(outs[g], np.float64),
            _ln64(groups[g], op.weight[g], op.bias[g], 1e-5), rtol=2e-5, atol=2e-5)


def test_norm_extreme_values_stay_finite():
    """Large/small magnitudes: fp32 statistics must not overflow in bf16
    inputs (the reason stats are computed in fp32)."""
    D = 64
    big = (randn(0, (4, D)) * 1e4).astype(jnp.bfloat16)
    small = (randn(1, (4, D)) * 1e-4).astype(jnp.bfloat16)
    for op in (m.MojoRMSNorm(D), m.MojoLayerNorm(D)):
        for x in (big, small):
            out = np.asarray(op(x), np.float32)
            assert np.isfinite(out).all()
            assert np.abs(out).max() < 50.0


def test_invalid_norm_pos_rejected():
    with pytest.raises(ValueError):
        m.MojoResidualAddRMSNorm(8, norm_pos="mid")
    with pytest.raises(ValueError):
        m.MojoResidualAddLayerNormQuant(8, norm_pos="mid")


def test_unsupported_quant_dtype_rejected():
    with pytest.raises(NotImplementedError):
        m.MojoRMSNormQuant(8, quant_dtype=jnp.float16)
