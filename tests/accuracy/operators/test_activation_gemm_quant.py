"""Accuracy tests: activations, MLP, GEMM family, quantization family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mojo_opset_tpu as m

from ..utils import randn


def test_gelu_silu_swiglu():
    x = randn(0, (4, 32))
    g = m.MojoGelu.get_backend_impl("ref")()
    s = m.MojoSilu.get_backend_impl("ref")()
    xn = np.asarray(x, np.float64)
    np.testing.assert_allclose(
        np.asarray(s(x)), xn / (1 + np.exp(-xn)), atol=1e-6, rtol=1e-6
    )
    assert g(x).shape == x.shape

    sw = m.MojoSwiGLU.get_backend_impl("ref")(swiglu_limit=2.0)
    gate, up = randn(1, (4, 32), scale=3.0), randn(2, (4, 32), scale=3.0)
    out = sw(gate, up)
    gn = np.minimum(np.asarray(gate), 2.0)
    un = np.clip(np.asarray(up), -2.0, 2.0)
    np.testing.assert_allclose(np.asarray(out), gn / (1 + np.exp(-gn)) * un, atol=1e-5, rtol=1e-5)


def test_swiglu_mlp():
    mlp = m.MojoSwiGLUMLP.get_backend_impl("ref")(16, 16, 32, key=jax.random.PRNGKey(7))
    x = randn(0, (5, 16))
    out = mlp(x)
    a = np.asarray(x) @ np.asarray(mlp.fc1.weight).T
    a1, a2 = np.split(a, 2, axis=-1)
    b = a1 / (1 + np.exp(-a1)) * a2
    want = b @ np.asarray(mlp.fc2.weight).T
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4, rtol=1e-4)


def test_gemm_prebuilt_weight():
    w = randn(0, (8, 16))
    op = m.MojoGemm.get_backend_impl("ref")(weight=w)
    x = randn(1, (4, 16))
    np.testing.assert_allclose(
        np.asarray(op(x)), np.asarray(x) @ np.asarray(w).T, atol=1e-5, rtol=1e-5
    )
    with pytest.raises(ValueError):
        m.MojoGemm.get_backend_impl("ref")(in_features=4, weight=w)


def test_group_gemm_trans_weight():
    G, Din, Dout = 3, 8, 12
    w = randn(0, (G, Dout, Din))
    op = m.MojoGroupGemm.get_backend_impl("ref")(w, trans_weight=True)
    x = randn(1, (9, Din))
    gl = jnp.array([2, 3, 4], jnp.int32)
    out = op(x, gl)
    xs = np.split(np.asarray(x), [2, 5])
    want = np.concatenate([xs[g] @ np.asarray(w[g]).T for g in range(G)], axis=0)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5, rtol=1e-5)

    # xla ragged_dot tier
    xla = m.MojoGroupGemm.get_backend_impl("xla")(w, trans_weight=True)
    xla.forward_diff_with(op, x, gl, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "counts", [(256, 512, 256), (0, 640, 384), (1024, 0, 0), (100, 412, 512)]
)
def test_group_gemm_pallas_padded_gmm(counts):
    """Pallas padded-GMM kernel (interpret mode) vs the ref per-group loop,
    including empty groups and non-tile-aligned splits."""
    G, Din, Dout = 3, 128, 256
    M = sum(counts)
    w = randn(0, (G, Din, Dout)) * 0.1
    x = randn(1, (M, Din))
    gl = jnp.array(counts, jnp.int32)

    ref = m.MojoGroupGemm.get_backend_impl("ref")(w)
    pal = m.MojoGroupGemm.get_backend_impl("pallas")(w)
    out_ref = ref(x, gl)
    out_pal = pal(x, gl)
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_ref), atol=2e-4, rtol=2e-4
    )


def test_quant_gemm_int8():
    M, K, N = 6, 32, 16
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-128, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (K, N)), jnp.int8)
    a_scale = jnp.abs(randn(1, (M,))) + 0.01
    w_scale = (jnp.abs(randn(2, (N,))) + 0.01).astype(jnp.bfloat16)
    op = m.MojoQuantGemm.get_backend_impl("ref")(K, N, output_dtype=jnp.float32)
    op = op.replace(weight=w, weight_scale=w_scale)
    out = op(a, a_scale)
    want = (
        np.asarray(a, np.int64) @ np.asarray(w, np.int64)
    ).astype(np.float64) * np.asarray(a_scale, np.float64)[:, None] * np.asarray(
        w_scale, np.float64
    )[None, :]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3)

    # trans_weight layout
    op_t = m.MojoQuantGemm.get_backend_impl("ref")(K, N, output_dtype=jnp.float32, trans_weight=True)
    op_t = op_t.replace(weight=w.T, weight_scale=w_scale)
    np.testing.assert_allclose(np.asarray(op_t(a, a_scale)), want, rtol=1e-3)


def test_dynamic_quant_roundtrip():
    op = m.MojoDynamicQuant.get_backend_impl("ref")()
    x = randn(0, (5, 64), scale=4.0)
    q, scale = op(x)
    assert q.dtype == jnp.int8 and scale.shape == (5, 1)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    np.testing.assert_allclose(deq, np.asarray(x), atol=np.abs(np.asarray(x)).max() / 100)


def test_dynamic_quant_smooth():
    D = 32
    op = m.MojoDynamicQuant.get_backend_impl("ref")(input_size=D)
    ss = jnp.abs(randn(3, (D,))) + 0.5
    op = op.replace(inv_smooth_scale=ss)
    x = randn(0, (4, D))
    q, scale = op(x)
    want = np.asarray(x) * np.asarray(ss)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    np.testing.assert_allclose(deq, want, atol=np.abs(want).max() / 100)


def test_static_quant_and_dequant():
    D = 16
    sq = m.MojoStaticQuant.get_backend_impl("ref")(D)
    sq = sq.replace(scale=jnp.full((D,), 0.05))
    x = randn(0, (3, D))
    q, scale = sq(x)
    dq = m.MojoDequant.get_backend_impl("ref")(output_dtype=jnp.float32)
    back = dq(q, scale)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0.05)


def test_moe_dynamic_quant():
    E, D = 3, 16
    op = m.MojoMoEDynamicQuant.get_backend_impl("ref")(E, D)
    ss = jnp.abs(randn(1, (E, D))) + 0.5
    op = op.replace(inv_smooth_scale=ss)
    counts = jnp.array([2, 0, 3], jnp.int32)
    x = randn(0, (5, D))
    q, scale = op(x, counts)
    expanded = np.repeat(np.asarray(ss), np.asarray(counts), axis=0)
    want = np.asarray(x) * expanded
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    np.testing.assert_allclose(deq, want, atol=np.abs(want).max() / 100)


def test_dequant_swiglu_quant():
    E, H = 2, 16
    op = m.MojoDequantSwiGLUQuant.get_backend_impl("ref")(E, H)
    ws = jnp.abs(randn(1, (E, 2 * H))) + 0.5
    qs = jnp.abs(randn(2, (E, H))) + 0.5
    op = op.replace(weight_scale=ws, quant_scale=qs)
    counts = jnp.array([3, 2], jnp.int32)
    x = jnp.asarray(np.random.default_rng(0).integers(-100, 100, (5, 2 * H)), jnp.int8)
    q, scale = op(x.astype(jnp.float32), token_count=counts)
    assert q.shape == (5, H) and scale.shape == (5, 1)
    ws_e = np.repeat(np.asarray(ws), np.asarray(counts), axis=0)
    qs_e = np.repeat(np.asarray(qs), np.asarray(counts), axis=0)
    xf = np.asarray(x, np.float32) * ws_e
    left, right = np.split(xf, 2, axis=-1)
    sig = np.where(right >= 0, 1.0 / (1.0 + np.exp(-np.abs(right))), np.exp(-np.abs(right)) / (1.0 + np.exp(-np.abs(right))))
    act = right * sig * left * qs_e
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    np.testing.assert_allclose(deq, act, atol=np.abs(act).max() / 90)
