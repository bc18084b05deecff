"""Accuracy tests for training functions (fwd + autodiff bwd).

Reference analogue: tests/accuracy/functions/.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mojo_opset_tpu as m

from ..utils import randn


def test_silu_function_grad():
    fn = m.MojoSiluFunction.get_backend_impl("ref")()
    x = randn(0, (4, 8))
    out = fn(x)
    xn = np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(out), xn / (1 + np.exp(-xn)), atol=1e-6)
    g = jax.grad(lambda x: fn(x).sum())(x)
    sig = 1 / (1 + np.exp(-xn))
    want = sig * (1 + xn * (1 - sig))
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-5)


def test_rmsnorm_function_grad_matches_numerical():
    fn = m.MojoRMSNormFunction.get_backend_impl("ref")(eps=1e-6)
    x = randn(0, (3, 16))
    w = randn(1, (16,)) + 1.0
    loss = lambda x, w: (fn(x, w) ** 2).sum()
    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    # numerical check on a few coords
    eps = 1e-3
    for idx in [(0, 0), (1, 5), (2, 15)]:
        xp = x.at[idx].add(eps)
        xm = x.at[idx].add(-eps)
        num = (loss(xp, w) - loss(xm, w)) / (2 * eps)
        np.testing.assert_allclose(float(gx[idx]), float(num), rtol=2e-2, atol=1e-3)


def test_apply_rope_function_inverse():
    fn = m.MojoApplyRoPEFunction.get_backend_impl("ref")()
    rot = m.MojoRotaryEmbedding.get_backend_impl("ref")(10000.0, 16)
    T, H, D = 5, 2, 16
    q, k = randn(0, (T, H, D)), randn(1, (T, H, D))
    cos, sin = rot(randn(2, (T, 4)), position_ids=jnp.arange(T, dtype=jnp.int32))
    qr, kr = fn(q, k, cos, sin, head_first=False)
    # rotate by -theta reverses
    qb, kb = fn(qr, kr, cos, -sin, head_first=False)
    np.testing.assert_allclose(np.asarray(qb), np.asarray(q), atol=1e-5)
    # norms preserved
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(qr), axis=-1), np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5
    )


def test_swa_function_matches_op_and_grads():
    fn = m.MojoSWAFunction.get_backend_impl("ref")(local_window_size=3)
    T, H, D = 6, 2, 8
    q = randn(0, (T, H, D))
    k = randn(1, (T, H, D))
    v = randn(2, (T, H, D))
    cu = jnp.array([0, 6], jnp.int32)
    out = fn(q, k, v, cu, cu)
    op = m.MojoSWA.get_backend_impl("ref")(local_window_size=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(op(q, k, v, cu, cu)), atol=1e-6)
    g = jax.grad(lambda q: fn(q, k, v, cu, cu).sum())(q)
    assert np.isfinite(np.asarray(g)).all()


def test_causal_conv1d_function_varlen_matches_batched():
    fn = m.MojoCausalConv1dFunction.get_backend_impl("ref")()
    D, W = 4, 3
    w = randn(0, (D, W))
    b = randn(1, (D,))
    xa = randn(2, (1, 5, D))
    xb = randn(3, (1, 4, D))
    packed = jnp.concatenate([xa, xb], axis=1)
    cu = jnp.array([0, 5, 9], jnp.int32)
    out, _ = fn(packed, w, b, cu_seqlens=cu)
    oa, _ = fn(xa, w, b)
    ob, _ = fn(xb, w, b)
    np.testing.assert_allclose(np.asarray(out[:, :5]), np.asarray(oa), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 5:]), np.asarray(ob), atol=1e-5)


def test_causal_conv1d_update_state_streaming():
    """Streaming two chunks through UpdateState == one-shot conv."""
    op = m.MojoCausalConv1dUpdateState.get_backend_impl("ref")()
    from mojo_opset_tpu.core.operators import causal_conv1d

    D, W, T = 4, 4, 10
    w = randn(0, (D, W))
    x = randn(1, (2, T, D))
    full, _ = causal_conv1d(x, w)
    xt = jnp.swapaxes(x, 1, 2)  # (B, D, T)
    state = jnp.zeros((2, D, W - 1))
    o1, state = op(xt[:, :, :6], state, w)
    o2, state = op(xt[:, :, 6:], state, w)
    stream = jnp.concatenate([o1, o2], axis=-1)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(stream, 1, 2)), np.asarray(full), atol=1e-5
    )


def test_fused_linear_ce_full_vs_chunked_and_grad():
    N, H, V = 12, 16, 32
    x = randn(0, (N, H))
    w = randn(1, (V, H))
    t = jnp.asarray(np.random.default_rng(0).integers(0, V, (N,)), jnp.int32)
    t = t.at[3].set(-100)  # ignore_index

    from mojo_opset_tpu.core.functions import fused_linear_cross_entropy as flce

    full = flce(x, w, t)
    chunked = flce(x, w, t, chunk_size=4)
    np.testing.assert_allclose(float(full), float(chunked), rtol=1e-5)

    # numpy reference
    logits = np.asarray(x) @ np.asarray(w).T
    valid = np.asarray(t) != -100
    lse = np.log(np.exp(logits).sum(-1))
    nll = lse[valid] - logits[valid, np.asarray(t)[valid]]
    np.testing.assert_allclose(float(full), nll.mean(), rtol=1e-5)

    g_full = jax.grad(lambda x: flce(x, w, t))(x)
    g_chunk = jax.grad(lambda x: flce(x, w, t, chunk_size=4))(x)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_chunk), atol=1e-5)


def test_fused_linear_ce_label_smoothing_softcap_zloss():
    N, H, V = 8, 16, 32
    x = randn(0, (N, H))
    w = randn(1, (V, H))
    t = jnp.asarray(np.random.default_rng(0).integers(0, V, (N,)), jnp.int32)
    from mojo_opset_tpu.core.functions import fused_linear_cross_entropy as flce

    base = float(flce(x, w, t))
    smoothed = float(flce(x, w, t, label_smoothing=0.1))
    capped = float(flce(x, w, t, softcap=5.0))
    with_z, z = flce(x, w, t, lse_square_scale=1e-3, return_z_loss=True)
    assert smoothed != base and capped != base
    assert float(with_z) > base - 1e-6 and float(z) > 0

    op = m.MojoFusedLinearCrossEntropyLoss.get_backend_impl("ref")(label_smoothing=0.1)
    np.testing.assert_allclose(float(op(w, x, t)), smoothed, rtol=1e-6)
