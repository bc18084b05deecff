"""Accuracy tests for the normalization family (vs numpy brute force and
cross-tier). Reference analogue: tests/accuracy/operators/test_norm*."""

import jax.numpy as jnp
import numpy as np
import pytest

import mojo_opset_tpu as m

from ..utils import check_tol_diff, diff_tiers, randn


def _np_rms(x, w, eps):
    xf = x.astype(np.float64)
    return (xf / np.sqrt((xf**2).mean(-1, keepdims=True) + eps)) * w


def _np_ln(x, w, b, eps):
    xf = x.astype(np.float64)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return (xf - mu) / np.sqrt(var + eps) * w + b


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_rmsnorm_matches_numpy(dtype):
    D = 64
    op = m.MojoRMSNorm.get_backend_impl("ref")(D, eps=1e-6)
    op = op.replace(weight=randn(1, (D,)) + 1.0)
    x = randn(0, (2, 5, D), dtype)
    got = op(x)
    want = _np_rms(np.asarray(x, np.float32), np.asarray(op.weight), 1e-6)
    tol = 1e-5 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(np.asarray(got, np.float32), want, atol=tol, rtol=tol)
    assert got.dtype == dtype


def test_layernorm_matches_numpy():
    D = 32
    op = m.MojoLayerNorm.get_backend_impl("ref")(D, eps=1e-5)
    op = op.replace(weight=randn(1, (D,)) + 1.0, bias=randn(2, (D,)))
    x = randn(0, (3, 7, D))
    got = op(x)
    want = _np_ln(np.asarray(x), np.asarray(op.weight), np.asarray(op.bias), 1e-5)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_group_rmsnorm():
    G, D = 3, 16
    op = m.MojoGroupRMSNorm.get_backend_impl("ref")(G, D, 1e-6)
    op = op.replace(weight=randn(1, (G, D)) + 1.0)
    groups = [randn(i, (4, D)) for i in range(G)]
    outs = op(groups)
    for g in range(G):
        want = _np_rms(np.asarray(groups[g]), np.asarray(op.weight[g]), 1e-6)
        np.testing.assert_allclose(np.asarray(outs[g]), want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("norm_pos", ["pre", "post"])
def test_residual_add_rmsnorm(norm_pos):
    D = 32
    op = m.MojoResidualAddRMSNorm.get_backend_impl("ref")(D, 1e-6, norm_pos)
    op = op.replace(weight=randn(1, (D,)) + 1.0)
    h, r = randn(0, (4, D)), randn(2, (4, D))
    out, res = op(h, r)
    if norm_pos == "pre":
        want_res = np.asarray(h) + np.asarray(r)
        want_out = _np_rms(want_res, np.asarray(op.weight), 1e-6)
    else:
        want_out = _np_rms(np.asarray(h) + np.asarray(r), np.asarray(op.weight), 1e-6)
        want_res = want_out
    np.testing.assert_allclose(np.asarray(res), want_res, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out), want_out, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("quant_dtype", ["int8", "float8_e4m3fn"])
def test_rmsnorm_quant(quant_dtype):
    D = 64
    op = m.MojoRMSNormQuant.get_backend_impl("ref")(D, 1e-6, jnp.dtype(quant_dtype))
    x = randn(0, (5, D), scale=3.0)
    q, scale = op(x)
    assert q.dtype == jnp.dtype(quant_dtype)
    assert scale.shape == (5, 1)
    # round-trip: dequantized output approximates the fp32 norm
    # (int8: ~1% of range; fp8 e4m3: 3 mantissa bits -> ~7% relative)
    normed = _np_rms(np.asarray(x), np.ones(D), 1e-6)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    if quant_dtype == "int8":
        np.testing.assert_allclose(deq, normed, atol=np.abs(normed).max() / 100)
    else:
        np.testing.assert_allclose(deq, normed, atol=np.abs(normed).max() / 100, rtol=0.07)


def test_rmsnorm_quant_smooth_scale():
    D = 32
    op = m.MojoRMSNormQuant.get_backend_impl("ref")(D, 1e-6)
    x = randn(0, (4, D))
    ss = jnp.abs(randn(5, (D,))) + 0.5
    q, scale = op(x, smooth_scale=ss)
    normed = _np_rms(np.asarray(x), np.ones(D), 1e-6) * np.asarray(ss)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    np.testing.assert_allclose(deq, normed, atol=np.abs(normed).max() / 100)


@pytest.mark.parametrize("norm_pos", ["pre", "post"])
def test_residual_add_rmsnorm_quant(norm_pos):
    D = 32
    op = m.MojoResidualAddRMSNormQuant.get_backend_impl("ref")(D, 1e-6, norm_pos)
    h, r = randn(0, (4, D)), randn(2, (4, D))
    q, res, scale = op(h, r)
    assert q.shape == (4, D) and scale.shape == (4, 1)
    if norm_pos == "pre":
        np.testing.assert_allclose(np.asarray(res), np.asarray(h) + np.asarray(r), atol=1e-6)


def test_residual_add_layernorm_quant():
    D = 32
    op = m.MojoResidualAddLayerNormQuant.get_backend_impl("ref")(D)
    h, r = randn(0, (4, D)), randn(2, (4, D))
    q, res, scale = op(h, r)
    assert q.dtype == jnp.int8
    want = _np_ln(np.asarray(h) + np.asarray(r), np.ones(D), np.zeros(D), 1e-5)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    np.testing.assert_allclose(deq, want, atol=np.abs(want).max() / 100)


def test_cross_tier_parity_norms():
    # exercises forward_diff_with across tiers whenever xla/pallas exist
    for cls, ctor in [
        (m.MojoRMSNorm, (64,)),
        (m.MojoLayerNorm, (64,)),
        (m.MojoResidualAddRMSNorm, (64,)),
    ]:
        others = [b for b in cls.get_registered_backends() if b != "ref"]
        if not others:
            continue
        x = randn(0, (4, 64), jnp.bfloat16)
        if cls is m.MojoResidualAddRMSNorm:
            diff_tiers(cls, ctor, call_args=(x, randn(1, (4, 64), jnp.bfloat16)))
        else:
            diff_tiers(cls, ctor, call_args=(x,))
