"""Pallas custom_vjp RoPE vs autodiff-of-golden.

The hand-written fwd+bwd pair (backends/pallas/kernels/rope.py
rope_train — backward is the forward kernel with negated sin) must match
the golden's value AND gradients, mirroring the reference's TTX rope
function pair (backends/ttx/functions/ +
backends/ttx/kernels/npu/a2/rope.py).  Interpret mode on CPU by default;
MOJO_TEST_TPU=1 runs real Mosaic.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.rope import rope_train
from mojo_opset_tpu.core.functions.position_embedding import MojoApplyRoPEFunction

INTERPRET = os.environ.get("MOJO_TEST_TPU", "0") != "1"


def _case(B, Hq, Hk, S, D, dtype, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, Hk, S, D)), dtype)
    inv = 1.0 / 10000 ** (np.arange(0, D, 2) / D)
    ang = np.arange(S)[:, None] * inv[None, :]
    cos = jnp.asarray(np.concatenate([np.cos(ang)] * 2, -1), jnp.float32)
    sin = jnp.asarray(np.concatenate([np.sin(ang)] * 2, -1), jnp.float32)
    gq = jnp.asarray(rng.standard_normal((B, Hq, S, D)), dtype)
    gk = jnp.asarray(rng.standard_normal((B, Hk, S, D)), dtype)
    return q, k, cos, sin, gq, gk


TOL = {
    jnp.float32: dict(atol=2e-5, rtol=2e-5),
    jnp.bfloat16: dict(atol=2e-2, rtol=2e-2),
    jnp.float16: dict(atol=4e-3, rtol=4e-3),
}


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.float16],
                         ids=["f32", "bf16", "f16"])
def test_rope_vjp_matches_golden(dtype):
    q, k, cos, sin, gq, gk = _case(2, 4, 2, 64, 128, dtype)
    ref = MojoApplyRoPEFunction.get_backend_impl("ref")()

    (yq, yk), pull = jax.vjp(lambda q, k: ref(q, k, cos, sin), q, k)
    dq_ref, dk_ref = pull((gq.astype(yq.dtype), gk.astype(yk.dtype)))

    (zq, zk), pull_k = jax.vjp(
        lambda q, k: rope_train(q, k, cos, sin, INTERPRET), q, k)
    dq, dk = pull_k((gq.astype(zq.dtype), gk.astype(zk.dtype)))

    tol = TOL[dtype]
    for got, want in ((zq, yq), (zk, yk), (dq, dq_ref), (dk, dk_ref)):
        assert got.dtype == want.dtype
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32), **tol)


def test_rope_function_pallas_tier_dispatch_and_fallback():
    from mojo_opset_tpu.backends.pallas.functions.position_embedding import (
        PallasApplyRoPEFunction,
    )
    impl = MojoApplyRoPEFunction.get_backend_impl("pallas", strict=True)
    assert impl is PallasApplyRoPEFunction

    # aligned geometry runs the kernel path; unaligned D falls back
    for D in (128, 96):
        q, k, cos, sin, gq, gk = _case(1, 2, 1, 16, D, jnp.float32, seed=3)
        ref = MojoApplyRoPEFunction.get_backend_impl("ref")()
        got = PallasApplyRoPEFunction()(q, k, cos, sin)
        want = ref(q, k, cos, sin)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=2e-5, rtol=2e-5)
