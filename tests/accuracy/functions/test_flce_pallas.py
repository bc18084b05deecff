"""Pallas custom_vjp fused linear + CE vs autodiff-of-golden.

The hand-written fwd+bwd kernel pair (backends/pallas/kernels/flce.py)
must match the golden's value AND gradients across the option matrix the
reference's TTX kernel covers (fused_linear_cross_entropy.py: softcap,
label smoothing, z-loss, ignore_index, mean/sum).
Interpret mode on CPU by default; MOJO_TEST_TPU=1 runs real Mosaic.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.flce import flce
from mojo_opset_tpu.core.functions.loss import (
    MojoFusedLinearCrossEntropyFunction,
    fused_linear_cross_entropy,
)

INTERPRET = os.environ.get("MOJO_TEST_TPU", "0") != "1"

N, H, V = 32, 128, 320  # V deliberately not a multiple of the vocab block


def _case(seed=0, ignore_frac=0.25):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((V, H)).astype(np.float32) * 0.05)
    t = rng.integers(0, V, (N,))
    t[rng.random(N) < ignore_frac] = -100
    return x, w, jnp.asarray(t, jnp.int32)


CONFIGS = [
    dict(),
    dict(reduction="sum"),
    dict(label_smoothing=0.1),
    dict(lse_square_scale=1e-3),
    dict(softcap=5.0),
    dict(label_smoothing=0.05, lse_square_scale=1e-3, softcap=8.0,
         reduction="sum"),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[str(sorted(c)) for c in CONFIGS])
def test_flce_value_and_grad_matches_golden(cfg):
    x, w, t = _case()
    kw = dict(ignore_index=-100, lse_square_scale=0.0, label_smoothing=0.0,
              reduction="mean", softcap=None)
    kw.update(cfg)

    def golden(x, w):
        return fused_linear_cross_entropy(x, w, t, **kw)

    def kernel(x, w):
        loss, _ = flce(x, w, t, kw["ignore_index"], kw["lse_square_scale"],
                       kw["label_smoothing"], kw["reduction"], kw["softcap"],
                       INTERPRET)
        return loss

    v_g, (gx_g, gw_g) = jax.value_and_grad(golden, argnums=(0, 1))(x, w)
    v_k, (gx_k, gw_k) = jax.value_and_grad(kernel, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(float(v_k), float(v_g), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_g),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_g),
                               rtol=1e-4, atol=1e-5)


def test_flce_z_loss_output_matches_golden():
    x, w, t = _case(seed=3)
    loss_g, z_g = fused_linear_cross_entropy(
        x, w, t, lse_square_scale=1e-3, return_z_loss=True)
    loss_k, z_k = flce(x, w, t, -100, 1e-3, 0.0, "mean", None, INTERPRET)
    np.testing.assert_allclose(float(loss_k), float(loss_g), rtol=1e-5)
    np.testing.assert_allclose(float(z_k), float(z_g), rtol=1e-5)


def test_pallas_tier_dispatch_and_fallback():
    """The pallas tier class dispatches to the kernel for supported
    configs and falls back to the golden for bias/ce_weight."""
    if not INTERPRET:
        pytest.skip("dispatch shape check is CPU-only")
    os.environ["MOJO_PALLAS_INTERPRET"] = "1"
    try:
        x, w, t = _case(seed=5)
        op_p = MojoFusedLinearCrossEntropyFunction.get_backend_impl(
            "pallas", strict=True)()
        op_r = MojoFusedLinearCrossEntropyFunction.get_backend_impl("ref")()
        np.testing.assert_allclose(float(op_p(x, w, t)), float(op_r(x, w, t)),
                                   rtol=1e-5)
        ce_w = jnp.ones((V,), jnp.float32) * 0.5
        np.testing.assert_allclose(
            float(op_p(x, w, t, ce_weight=ce_w)),
            float(op_r(x, w, t, ce_weight=ce_w)), rtol=1e-5)
    finally:
        os.environ.pop("MOJO_PALLAS_INTERPRET", None)


def test_flce_bf16_inputs():
    x, w, t = _case(seed=7)
    xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)

    def kernel(x, w):
        loss, _ = flce(x, w, t, -100, 0.0, 0.0, "mean", None, INTERPRET)
        return loss

    v, (gx, gw) = jax.value_and_grad(kernel, argnums=(0, 1))(xb, wb)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    v_g = fused_linear_cross_entropy(xb, wb, t)
    np.testing.assert_allclose(float(v), float(v_g), rtol=2e-2, atol=2e-2)
