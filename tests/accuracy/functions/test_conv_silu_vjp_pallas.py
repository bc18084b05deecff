"""Pallas custom_vjp causal conv1d + SiLU vs autodiff-of-golden.

The conv kernel pair (backends/pallas/kernels/conv1d_vjp.py) must match
the golden's value, final state, and every gradient (dx, dw, db,
dresidual, dstate), mirroring the reference's TTX conv function pair
(backends/ttx/functions/convolution.py + kernels/npu/a2/convolution.py).
Same contract for the SiLU pair (silu_vjp.py vs TTXSiluFunction).
Interpret mode on CPU by default; MOJO_TEST_TPU=1 runs real Mosaic.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.functions.activation import MojoSiluFunction
from mojo_opset_tpu.core.functions.convolution import MojoCausalConv1dFunction

INTERPRET = os.environ.get("MOJO_TEST_TPU", "0") != "1"
if INTERPRET:
    os.environ.setdefault("MOJO_PALLAS_INTERPRET", "1")


def _tol(dtype):
    return dict(atol=2e-2, rtol=2e-2) if dtype != jnp.float32 else dict(
        atol=2e-5, rtol=2e-5)


CONV_CASES = [
    # (B, T, D, W, bias, residual, state, act, dtype)
    pytest.param(2, 64, 128, 4, True, False, False, "silu", jnp.float32,
                 id="basic-silu"),
    pytest.param(1, 200, 256, 4, True, True, False, None, jnp.float32,
                 id="odd-T-residual"),
    pytest.param(2, 48, 128, 3, False, False, True, "silu", jnp.float32,
                 id="state-nobias-w3"),
    pytest.param(2, 64, 128, 4, True, True, True, "swish", jnp.bfloat16,
                 id="bf16-everything"),
    pytest.param(1, 5, 128, 4, True, False, True, None, jnp.float32,
                 id="chunk-shorter-than-window"),
    pytest.param(2, 96, 128, 8, True, False, True, "silu", jnp.float32,
                 id="wide-window-w8"),
    pytest.param(2, 64, 128, 1, True, False, False, "silu", jnp.float32,
                 id="w1-pointwise"),
]


@pytest.mark.parametrize("B,T,D,W,bias,residual,state,act,dtype", CONV_CASES)
def test_conv1d_vjp_matches_golden(B, T, D, W, bias, residual, state, act, dtype):
    rng = np.random.default_rng(hash((B, T, D, W, act)) % 2**31)
    x = jnp.asarray(rng.standard_normal((B, T, D)), dtype)
    w = jnp.asarray(rng.standard_normal((D, W)) * 0.5, dtype)
    b = jnp.asarray(rng.standard_normal((D,)) * 0.1, dtype) if bias else None
    r = jnp.asarray(rng.standard_normal((B, T, D)), dtype) if residual else None
    s = (jnp.asarray(rng.standard_normal((B, D, W - 1)), dtype)
         if state and W > 1 else None)
    do = jnp.asarray(rng.standard_normal((B, T, D)), dtype)

    def run(backend):
        fn = MojoCausalConv1dFunction.get_backend_impl(
            backend, strict=(backend != "ref"))()
        diff = [a for a in (x, w, b, r, s) if a is not None]

        def f(*args):
            it = iter(args)
            xx = next(it)
            ww = next(it)
            bb = next(it) if b is not None else None
            rr = next(it) if r is not None else None
            ss = next(it) if s is not None else None
            out, fin = fn(xx, ww, bb, rr, ss, True, act, None)
            return out, fin

        (out, fin), pull = jax.vjp(f, *diff)
        grads = pull((do.astype(out.dtype), jnp.zeros_like(fin)))
        return out, fin, grads

    out_p, fin_p, g_p = run("pallas")
    out_r, fin_r, g_r = run("ref")
    tol = _tol(dtype)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_r, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(fin_p, np.float32),
                               np.asarray(fin_r, np.float32), **tol)
    names = [n for n, a in zip("x w b r s".split(), (x, w, b, r, s))
             if a is not None]
    for name, gp, gr in zip(names, g_p, g_r):
        np.testing.assert_allclose(
            np.asarray(gp, np.float32), np.asarray(gr, np.float32),
            err_msg=f"grad {name}", **tol)


def test_conv1d_pallas_tier_registered():
    fn = MojoCausalConv1dFunction.get_backend_impl("pallas", strict=True)()
    assert type(fn).__name__ == "PallasCausalConv1dFunction"


@pytest.mark.parametrize("shape,dtype", [
    ((2, 64, 128), jnp.float32),
    ((4, 8, 256), jnp.bfloat16),
    ((16, 384), jnp.float32),
])
def test_silu_vjp_matches_golden(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    do = jnp.asarray(rng.standard_normal(shape), dtype)

    def run(backend):
        fn = MojoSiluFunction.get_backend_impl(
            backend, strict=(backend != "ref"))()
        y, pull = jax.vjp(fn, x)
        return y, pull(do.astype(y.dtype))[0]

    y_p, dx_p = run("pallas")
    y_r, dx_r = run("ref")
    tol = _tol(dtype)
    np.testing.assert_allclose(np.asarray(y_p, np.float32),
                               np.asarray(y_r, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(dx_p, np.float32),
                               np.asarray(dx_r, np.float32), **tol)


def test_silu_fallback_unaligned():
    # lane-unaligned last dim must silently use the golden path
    fn = MojoSiluFunction()
    x = jnp.ones((4, 100), jnp.float32)
    y = fn(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(jax.nn.silu(x)),
                               atol=1e-6)
