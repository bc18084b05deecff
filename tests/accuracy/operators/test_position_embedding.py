"""Accuracy tests for rotary embedding ops."""

import jax.numpy as jnp
import numpy as np
import pytest

import mojo_opset_tpu as m

from ..utils import randn


def np_rope_tables(positions, rope_dim, theta, scaling=1.0):
    inv = 1.0 / (theta ** (np.arange(0, rope_dim, 2) / rope_dim))
    freqs = np.asarray(positions)[..., None] * inv[None, :]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb) * scaling, np.sin(emb) * scaling


def test_rotary_embedding_decode_mode():
    op = m.MojoRotaryEmbedding.get_backend_impl("ref")(10000.0, 16)
    x = randn(0, (4, 64))  # decode: [B, H]
    pos = jnp.array([3, 0, 7, 100], jnp.int32)
    cos, sin = op(x, position_ids=pos)
    wc, ws = np_rope_tables(np.asarray(pos), 16, 10000.0)
    np.testing.assert_allclose(np.asarray(cos), wc, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sin), ws, atol=1e-4)


def test_rotary_embedding_varlen_mode():
    op = m.MojoRotaryEmbedding.get_backend_impl("ref")(10000.0, 8)
    cu = jnp.array([0, 3, 8], jnp.int32)
    total = jnp.array([5, 7], jnp.int32)  # context lens 2 and 2
    x = randn(0, (8, 32))
    cos, sin = op(x, cu_q_lens=cu, total_seq_lens=total)
    pos = np.array([2, 3, 4, 2, 3, 4, 5, 6])
    wc, ws = np_rope_tables(pos, 8, 10000.0)
    np.testing.assert_allclose(np.asarray(cos), wc, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sin), ws, atol=1e-4)


def test_rotary_embedding_padded_mode_and_table():
    op = m.MojoRotaryEmbedding.get_backend_impl("ref")(10000.0, 8, init_max_length=32)
    x = randn(0, (2, 10, 64))  # padded [B, S, H]
    cos, sin = op(x)
    wc, ws = np_rope_tables(np.arange(10), 8, 10000.0)
    np.testing.assert_allclose(np.asarray(cos), wc, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sin), ws, atol=1e-4)


@pytest.mark.parametrize("head_first", [True, False])
def test_apply_rope_matches_numpy(head_first):
    T, H, D = 6, 4, 16
    op = m.MojoApplyRoPE.get_backend_impl("ref")()
    rot = m.MojoRotaryEmbedding.get_backend_impl("ref")(10000.0, D)
    q = randn(0, (T, H, D) if not head_first else (H, T, D))
    k = randn(1, (T, H, D) if not head_first else (H, T, D))
    cos, sin = rot(randn(2, (T, 8)), position_ids=jnp.arange(T, dtype=jnp.int32))
    qr, kr = op(q, k, cos, sin, head_first=head_first)
    assert qr.shape == q.shape and kr.shape == k.shape

    def rotate_half(x):
        h = x.shape[-1] // 2
        return np.concatenate([-x[..., h:], x[..., :h]], axis=-1)

    c = np.asarray(cos)[None, :, :] if head_first else np.asarray(cos)[:, None, :]
    s = np.asarray(sin)[None, :, :] if head_first else np.asarray(sin)[:, None, :]
    want_q = np.asarray(q) * c + rotate_half(np.asarray(q)) * s
    np.testing.assert_allclose(np.asarray(qr), want_q, atol=1e-5, rtol=1e-5)


def test_apply_rope_partial_nope():
    T, H, D, rope_dim = 5, 2, 24, 16
    op = m.MojoApplyRoPE.get_backend_impl("ref")()
    rot = m.MojoRotaryEmbedding.get_backend_impl("ref")(10000.0, rope_dim)
    cos, sin = rot(randn(2, (T, 8)), position_ids=jnp.arange(T, dtype=jnp.int32))
    q, k = randn(0, (T, H, D)), randn(1, (T, H, D))
    qr, kr = op(q, k, cos, sin, head_first=False)
    # nope part passes through untouched
    np.testing.assert_allclose(np.asarray(qr[..., : D - rope_dim]), np.asarray(q[..., : D - rope_dim]))
    assert not np.allclose(np.asarray(qr[..., D - rope_dim :]), np.asarray(q[..., D - rope_dim :]))


def test_mrope_non_interleaved():
    T, sections = 4, [2, 3, 3]
    rope_dim = sum(sections) * 2
    head_dim = rope_dim
    n_heads = 2
    op = m.MojoMRoPE.get_backend_impl("ref")()
    q = randn(0, (T, n_heads * head_dim))
    k = randn(1, (T, 1 * head_dim))
    cos_t = randn(2, (3, T, sum(sections)))
    sin_t = randn(3, (3, T, sum(sections)))
    qr, kr = op(q, k, cos_t, sin_t, sections)
    assert qr.shape == q.shape and kr.shape == k.shape


def test_vision_rope_2d():
    emb = m.MojoVisionRotaryEmbedding2D.get_backend_impl("ref")(rope_dim=16)
    grid = jnp.array([[2, 4], [2, 2]], jnp.int32)
    cos, sin = emb(grid)
    assert cos.shape == (2 * 4 + 2 * 2, 16)
    app = m.MojoApplyVisionRoPE2D.get_backend_impl("ref")()
    q = randn(0, (12, 3, 16))
    k = randn(1, (12, 3, 16))
    qr, kr = app(q, k, cos, sin)
    assert qr.shape == q.shape
