"""Pallas custom_vjp RMSNorm vs autodiff-of-golden.

The hand-written fwd+bwd pair (backends/pallas/kernels/rmsnorm_vjp.py)
must match the golden's value AND both gradients (dx, dw), mirroring the
reference's TTX rmsnorm function pair (backends/ttx/functions/).
Interpret mode on CPU by default; MOJO_TEST_TPU=1 runs real Mosaic.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.rmsnorm_vjp import rmsnorm_vjp
from mojo_opset_tpu.core.functions.normalization import MojoRMSNormFunction

INTERPRET = os.environ.get("MOJO_TEST_TPU", "0") != "1"

EPS = 1e-6


def _case(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    w = jnp.asarray(rng.uniform(0.5, 1.5, shape[-1:]), dtype)
    dy = jnp.asarray(rng.standard_normal(shape), dtype)
    return x, w, dy


def _golden_vjp(x, w, dy):
    ref = MojoRMSNormFunction.get_backend_impl("ref")(eps=EPS)
    y, pull = jax.vjp(lambda x, w: ref(x, w), x, w)
    return y, pull(dy.astype(y.dtype))


TOL = {
    jnp.float32: dict(atol=2e-5, rtol=2e-5),
    jnp.bfloat16: dict(atol=2e-2, rtol=2e-2),
    jnp.float16: dict(atol=4e-3, rtol=4e-3),
}


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.float16],
                         ids=["f32", "bf16", "f16"])
@pytest.mark.parametrize("shape", [(32, 256), (4, 7, 128), (48, 1024)])
def test_rmsnorm_vjp_matches_golden(shape, dtype):
    x, w, dy = _case(shape, dtype)
    y, (dx_ref, dw_ref) = _golden_vjp(x, w, dy)

    y_k, pull = jax.vjp(lambda x, w: rmsnorm_vjp(x, w, EPS, INTERPRET), x, w)
    dx_k, dw_k = pull(dy.astype(y_k.dtype))

    tol = TOL[dtype]
    assert y_k.dtype == y.dtype and dx_k.dtype == x.dtype and dw_k.dtype == w.dtype
    np.testing.assert_allclose(np.asarray(y_k, np.float32),
                               np.asarray(y, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(dx_k, np.float32),
                               np.asarray(dx_ref, np.float32), **tol)
    # dw sums over all rows: scale tolerance with the row count
    rows = x.size // x.shape[-1]
    np.testing.assert_allclose(
        np.asarray(dw_k, np.float32), np.asarray(dw_ref, np.float32),
        atol=tol["atol"] * rows ** 0.5, rtol=tol["rtol"] * rows ** 0.5)


def test_dispatch_selects_pallas_function():
    # lane-aligned width dispatches the kernel tier on construction
    fn = MojoRMSNormFunction(eps=EPS)
    from mojo_opset_tpu.backends.pallas.functions.normalization import (
        PallasRMSNormFunction,
    )
    impl = MojoRMSNormFunction.get_backend_impl("pallas", strict=True)
    assert impl is PallasRMSNormFunction
    # unaligned width falls back to the golden inside forward (no crash)
    x, w, dy = _case((8, 96), jnp.float32)
    y = PallasRMSNormFunction(eps=EPS)(x, w)
    y_ref, _ = _golden_vjp(x, w, dy)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5,
                               rtol=2e-5)
    del fn
