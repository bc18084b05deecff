"""Training-function gradient matrix: finite differences + torch oracles.

Reference analogue: the reference validates every MojoFunction's
fwd+bwd pair per backend (tests/accuracy/functions/).  Here each
function's JAX gradient is checked two independent ways:
  1. central finite differences on random projections (catches wrong
     custom_vjp math without trusting autodiff);
  2. a torch (CPU) oracle where the semantics are intricate enough that
     an independent implementation is worth it (fused linear CE).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m
from mojo_opset_tpu.core.functions.loss import fused_linear_cross_entropy

from ..utils import randn


def _fd_grad(f, x, eps=1e-3):
    """Central-difference gradient of scalar f at x (numpy float64)."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        g[i] = (f(xp) - f(xm)) / (2 * eps)
        it.iternext()
    return g


def _check_grad(f_jax, x0, eps=1e-3, rtol=5e-3, atol=5e-3):
    got = np.asarray(jax.grad(lambda x: f_jax(x).sum())(jnp.asarray(x0, jnp.float32)),
                     np.float64)
    want = _fd_grad(lambda x: float(np.asarray(f_jax(jnp.asarray(x, jnp.float32)).sum())),
                    x0, eps)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


def test_silu_function_fd_grad():
    fn = m.MojoSiluFunction()
    x0 = np.random.default_rng(0).standard_normal((3, 5))
    _check_grad(lambda x: fn(x), x0)


def test_rmsnorm_function_fd_grad_wrt_input_and_weight():
    fn = m.MojoRMSNormFunction(eps=1e-6)
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((4, 8))
    w0 = rng.standard_normal(8) + 1.0
    _check_grad(lambda x: fn(x, jnp.asarray(w0, jnp.float32)), x0)
    _check_grad(lambda w: fn(jnp.asarray(x0, jnp.float32), w), w0)


def test_apply_rope_function_fd_grad():
    fn = m.MojoApplyRoPEFunction()
    rng = np.random.default_rng(2)
    T, N, D = 3, 2, 8
    pos = np.arange(T)
    inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    emb = np.concatenate([pos[:, None] * inv] * 2, -1)
    cos = jnp.asarray(np.cos(emb), jnp.float32)
    sin = jnp.asarray(np.sin(emb), jnp.float32)
    k0 = jnp.asarray(rng.standard_normal((T, N, D)), jnp.float32)
    x0 = rng.standard_normal((T, N, D))
    _check_grad(lambda q: fn(q, k0, cos, sin, head_first=False)[0], x0)


def test_swa_function_fd_grad():
    fn = m.MojoSWAFunction(global_window_size=2, local_window_size=3)
    rng = np.random.default_rng(3)
    T, H, D = 6, 2, 4
    cu = jnp.asarray([0, 6], jnp.int32)
    k = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    q0 = rng.standard_normal((T, H, D))
    _check_grad(lambda q: fn(q, k, v, cu, cu), q0, rtol=1e-2, atol=1e-2)
    # and wrt values (linear path — should be near-exact)
    v0 = rng.standard_normal((T, H, D))
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    _check_grad(lambda v_: fn(q, k, v_, cu, cu), v0)


def test_causal_conv1d_function_fd_grad():
    fn = m.MojoCausalConv1dFunction()
    rng = np.random.default_rng(4)
    D, W, T = 3, 4, 7
    w = jnp.asarray(rng.standard_normal((D, W)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    cu = jnp.asarray([0, 4, 7], jnp.int32)
    x0 = rng.standard_normal((1, T, D))

    def f(x):
        out, _ = fn(x, w, b, cu_seqlens=cu)
        return out

    _check_grad(f, x0, rtol=1e-2, atol=1e-2)
    # weight gradient too
    x = jnp.asarray(x0, jnp.float32)
    _check_grad(lambda wv: fn(x, wv, b, cu_seqlens=cu)[0], np.asarray(w), rtol=1e-2,
                atol=1e-2)


@pytest.mark.parametrize("label_smoothing", [0.0, 0.1])
@pytest.mark.parametrize("softcap", [None, 5.0])
def test_fused_linear_ce_matches_torch_oracle(label_smoothing, softcap):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    N, H, V = 6, 8, 12
    x = rng.standard_normal((N, H)).astype(np.float32)
    w = rng.standard_normal((V, H)).astype(np.float32)
    t = rng.integers(0, V, (N,))
    t[1] = -100  # ignore_index row

    loss = fused_linear_cross_entropy(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(t, jnp.int32),
        label_smoothing=label_smoothing, softcap=softcap,
    )

    xt = torch.tensor(x, requires_grad=True)
    wt = torch.tensor(w, requires_grad=True)
    logits = xt @ wt.T
    if softcap is not None:
        logits = torch.tanh(logits / softcap) * softcap
    want = torch.nn.functional.cross_entropy(
        logits, torch.tensor(t, dtype=torch.long), ignore_index=-100,
        label_smoothing=label_smoothing,
    )
    np.testing.assert_allclose(float(loss), float(want.detach()), rtol=1e-5, atol=1e-6)

    # gradients
    gx, gw = jax.grad(
        lambda a, b: fused_linear_cross_entropy(
            a, b, jnp.asarray(t, jnp.int32),
            label_smoothing=label_smoothing, softcap=softcap),
        argnums=(0, 1),
    )(jnp.asarray(x), jnp.asarray(w))
    want.backward()
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), wt.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_fused_linear_ce_ce_weight_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(6)
    N, H, V = 5, 6, 9
    x = rng.standard_normal((N, H)).astype(np.float32)
    w = rng.standard_normal((V, H)).astype(np.float32)
    t = rng.integers(0, V, (N,))
    cw = rng.uniform(0.5, 2.0, (V,)).astype(np.float32)
    loss = fused_linear_cross_entropy(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(t, jnp.int32),
        ce_weight=jnp.asarray(cw))
    want = torch.nn.functional.cross_entropy(
        torch.tensor(x) @ torch.tensor(w).T, torch.tensor(t, dtype=torch.long),
        weight=torch.tensor(cw))
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5, atol=1e-6)


def test_fused_linear_ce_chunked_grad_matches_unchunked():
    rng = np.random.default_rng(7)
    N, H, V = 10, 4, 16
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((V, H)), jnp.float32)
    t = jnp.asarray(rng.integers(0, V, (N,)), jnp.int32)
    g_full = jax.grad(lambda a: fused_linear_cross_entropy(a, w, t))(x)
    g_chunk = jax.grad(lambda a: fused_linear_cross_entropy(a, w, t, chunk_size=3))(x)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_full), rtol=1e-5, atol=1e-6)


def test_fused_linear_ce_zloss_grad_flows():
    rng = np.random.default_rng(8)
    N, H, V = 4, 4, 8
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((V, H)), jnp.float32)
    t = jnp.asarray(rng.integers(0, V, (N,)), jnp.int32)
    loss0, z0 = fused_linear_cross_entropy(x, w, t, lse_square_scale=0.0, return_z_loss=True)
    loss1, z1 = fused_linear_cross_entropy(x, w, t, lse_square_scale=0.1, return_z_loss=True)
    assert float(z0) == 0.0 and float(z1) > 0.0
    np.testing.assert_allclose(float(loss1), float(loss0) + float(z1), rtol=1e-5)
    # z-loss perturbs the gradient
    g0 = jax.grad(lambda a: fused_linear_cross_entropy(a, w, t))(x)
    g1 = jax.grad(lambda a: fused_linear_cross_entropy(a, w, t, lse_square_scale=0.1))(x)
    assert np.abs(np.asarray(g1) - np.asarray(g0)).max() > 1e-6


def test_fused_linear_ce_all_ignored_is_finite():
    x = randn(0, (3, 4))
    w = randn(1, (8, 4))
    t = jnp.full((3,), -100, jnp.int32)
    loss = fused_linear_cross_entropy(x, w, t)
    assert np.isfinite(float(loss)) and float(loss) == 0.0
    g = jax.grad(lambda a: fused_linear_cross_entropy(a, w, t))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_function_dispatch_tiers_share_grad_semantics():
    """Every registered tier of a MojoFunction must produce the same value
    AND gradient as the ref tier (the dual-build training contract)."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(8) + 1.0, jnp.float32)
    ref = m.MojoRMSNormFunction.get_backend_impl("ref")(eps=1e-6)
    for tier in m.MojoRMSNormFunction.get_registered_backends():
        fn = m.MojoRMSNormFunction.get_backend_impl(tier)(eps=1e-6)
        np.testing.assert_allclose(np.asarray(fn(x, w)), np.asarray(ref(x, w)),
                                   rtol=1e-5, atol=1e-5, err_msg=tier)
        g_ref = jax.grad(lambda a: ref(a, w).sum())(x)
        g = jax.grad(lambda a: fn(a, w).sum())(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5, err_msg=tier)
