"""Position-embedding matrix vs numpy oracles.

Reference analogue: tests/accuracy/operators/test_position_embedding.py
(531 LoC — mode/layout/section matrices for RotaryEmbedding, ApplyRoPE,
MRoPE, VisionRoPE2D).  Oracles are built from scratch in float64:
rotation tables from the theta formula, rotate-half by hand, MRoPE
section splicing per token, vision grids cell by cell.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import mojo_opset_tpu as m
import mojo_opset_tpu.experimental as exp

from ..utils import randn


def _table64(positions, dim, theta, scaling=1.0):
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    freqs = np.asarray(positions, np.float64)[..., None] * inv
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb) * scaling, np.sin(emb) * scaling


def _rot_half64(x):
    h = x.shape[-1] // 2
    return np.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _apply64(x, cos, sin):
    return x * cos + _rot_half64(x) * sin


@pytest.mark.parametrize("theta,dim,scaling", [(10000.0, 16, 1.0), (500000.0, 64, 0.7)])
def test_rotary_decode_mode_matches_formula(theta, dim, scaling):
    op = m.MojoRotaryEmbedding(theta, dim, attention_scaling=scaling)
    pos = jnp.asarray([0, 5, 131, 7], jnp.int32)
    cos, sin = op(randn(0, (4, dim)), position_ids=pos)
    want_cos, want_sin = _table64(np.asarray(pos), dim, theta, scaling)
    np.testing.assert_allclose(np.asarray(cos, np.float64), want_cos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin, np.float64), want_sin, rtol=1e-5, atol=1e-5)


def test_rotary_varlen_positions_restart_and_continue():
    """Varlen mode: positions restart per sequence; with total_seq_lens the
    positions continue from the cache prefix (chunked prefill)."""
    dim = 8
    op = m.MojoRotaryEmbedding(10000.0, dim)
    q_lens = [3, 1, 4]
    cu = jnp.asarray([0, 3, 4, 8], jnp.int32)
    x = randn(0, (8, dim))

    cos, _ = op(x, cu_q_lens=cu)
    want = np.concatenate([np.arange(q) for q in q_lens])
    wc, _ = _table64(want, dim, 10000.0)
    np.testing.assert_allclose(np.asarray(cos, np.float64), wc, rtol=1e-5, atol=1e-6)

    totals = jnp.asarray([10, 1, 6], jnp.int32)  # ctx = totals - q_lens
    cos2, _ = op(x, cu_q_lens=cu, total_seq_lens=totals)
    ctx = np.asarray(totals) - np.asarray(q_lens)
    want2 = np.concatenate([c + np.arange(q) for c, q in zip(ctx, q_lens)])
    wc2, _ = _table64(want2, dim, 10000.0)
    np.testing.assert_allclose(np.asarray(cos2, np.float64), wc2, rtol=1e-5, atol=1e-6)


def test_rotary_precomputed_table_equals_on_the_fly():
    dim = 16
    live = m.MojoRotaryEmbedding(10000.0, dim, attention_scaling=0.9)
    table = m.MojoRotaryEmbedding(10000.0, dim, attention_scaling=0.9, init_max_length=64)
    pos = jnp.asarray([0, 3, 63], jnp.int32)
    c1, s1 = live(randn(0, (3, dim)), position_ids=pos)
    c2, s2 = table(randn(0, (3, dim)), position_ids=pos)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6, atol=1e-6)


def test_rotary_padded_mode_uses_sequence_axis():
    dim = 8
    op = m.MojoRotaryEmbedding(10000.0, dim)
    cos, _ = op(randn(0, (2, 5, dim)))  # [B, S, H] -> positions arange(S)
    wc, _ = _table64(np.arange(5), dim, 10000.0)
    np.testing.assert_allclose(np.asarray(cos, np.float64), wc, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("head_first", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_apply_rope_padded_4d_layouts(head_first, dtype):
    B, N, S, D = 2, 3, 5, 8
    q = randn(0, (B, N, S, D) if head_first else (B, S, N, D), dtype)
    k = randn(1, (B, N, S, D) if head_first else (B, S, N, D), dtype)
    cos64, sin64 = _table64(np.arange(S), D, 10000.0)
    cos = jnp.asarray(cos64, jnp.float32)
    sin = jnp.asarray(sin64, jnp.float32)
    cb = jnp.broadcast_to(cos, (B, S, D))
    sb = jnp.broadcast_to(sin, (B, S, D))
    qo, ko = m.MojoApplyRoPE()(q, k, cb, sb, head_first=head_first)
    q64 = np.asarray(q, np.float64)
    expand = (lambda t: t[None, None, :, :]) if head_first else (lambda t: t[None, :, None, :])
    want_q = _apply64(q64, expand(cos64), expand(sin64))
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else dict(rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(qo, np.float64), want_q, **tol)
    assert qo.dtype == dtype and ko.dtype == dtype


def test_apply_rope_partial_nope_leaves_prefix_untouched():
    T, N, D, rope_dim = 6, 2, 16, 8
    q = randn(0, (T, N, D))
    k = randn(1, (T, N, D))
    cos64, sin64 = _table64(np.arange(T), rope_dim, 10000.0)
    qo, ko = m.MojoApplyRoPE()(q, k, jnp.asarray(cos64, jnp.float32),
                               jnp.asarray(sin64, jnp.float32), head_first=False)
    np.testing.assert_array_equal(np.asarray(qo[..., : D - rope_dim]),
                                  np.asarray(q[..., : D - rope_dim]))
    want_rot = _apply64(np.asarray(q, np.float64)[..., D - rope_dim:],
                        cos64[:, None, :], sin64[:, None, :])
    np.testing.assert_allclose(np.asarray(qo[..., D - rope_dim:], np.float64), want_rot,
                               rtol=2e-5, atol=2e-6)


def test_apply_rope_preserves_pairwise_norms():
    """Rotation property: each (i, i+D/2) pair's L2 norm is invariant."""
    T, N, D = 5, 2, 8
    q = randn(0, (T, N, D))
    cos64, sin64 = _table64(np.arange(T), D, 10000.0)
    qo, _ = m.MojoApplyRoPE()(q, q, jnp.asarray(cos64, jnp.float32),
                              jnp.asarray(sin64, jnp.float32), head_first=False)
    x = np.asarray(q, np.float64)
    y = np.asarray(qo, np.float64)
    h = D // 2
    np.testing.assert_allclose(x[..., :h] ** 2 + x[..., h:] ** 2,
                               y[..., :h] ** 2 + y[..., h:] ** 2, rtol=1e-4, atol=1e-5)


def _mrope_tables(rng, T, half):
    # 3-axis tables (t/h/w), values in [-1, 1] like real cos/sin
    cos = rng.uniform(-1, 1, (3, T, half))
    sin = rng.uniform(-1, 1, (3, T, half))
    return cos, sin


@pytest.mark.parametrize("interleaved", [False, True])
def test_mrope_section_splicing_matches_oracle(interleaved):
    rng = np.random.default_rng(0)
    sections = [2, 1, 1]  # t/h/w halves, rope half = 4, rope_dim = 8
    half = sum(sections)
    T, n_qh, n_kh, head_dim = 4, 2, 1, 12  # pass-through dims beyond rope
    cos3, sin3 = _mrope_tables(rng, T, half)
    q = rng.standard_normal((T, n_qh * head_dim))
    k = rng.standard_normal((T, n_kh * head_dim))

    qo, ko = m.MojoMRoPE()(
        jnp.asarray(q, jnp.float32), jnp.asarray(k, jnp.float32),
        jnp.asarray(cos3, jnp.float32), jnp.asarray(sin3, jnp.float32),
        sections, is_interleaved=interleaved, head_dim=head_dim,
    )

    # oracle: splice the 3 axis tables into one (T, half) table
    cos = cos3[0].copy()
    sin = sin3[0].copy()
    if interleaved:
        cos[:, 1: sections[1] * 3: 3] = cos3[1][:, 1: sections[1] * 3: 3]
        cos[:, 2: sections[2] * 3: 3] = cos3[2][:, 2: sections[2] * 3: 3]
        sin[:, 1: sections[1] * 3: 3] = sin3[1][:, 1: sections[1] * 3: 3]
        sin[:, 2: sections[2] * 3: 3] = sin3[2][:, 2: sections[2] * 3: 3]
    else:
        cos = np.concatenate([cos3[0][:, 0:2], cos3[1][:, 2:3], cos3[2][:, 3:4]], -1)
        sin = np.concatenate([sin3[0][:, 0:2], sin3[1][:, 2:3], sin3[2][:, 3:4]], -1)

    def oracle(x, n_heads):
        x = x.reshape(T, n_heads, head_dim).astype(np.float64)
        rot, keep = x[..., : 2 * half], x[..., 2 * half:]
        h1, h2 = rot[..., :half], rot[..., half:]
        c, s = cos[:, None, :], sin[:, None, :]
        out = np.concatenate([h1 * c - h2 * s, h2 * c + h1 * s, keep], -1)
        return out.reshape(T, n_heads * head_dim)

    np.testing.assert_allclose(np.asarray(qo, np.float64), oracle(q, n_qh),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ko, np.float64), oracle(k, n_kh),
                               rtol=2e-5, atol=2e-6)


def test_mrope_inplace_matches_core():
    rng = np.random.default_rng(1)
    sections = [2, 1, 1]
    T, head_dim = 3, 8
    cos3, sin3 = _mrope_tables(rng, T, sum(sections))
    q = jnp.asarray(rng.standard_normal((T, 2 * head_dim)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, head_dim)), jnp.float32)
    a = m.MojoMRoPE()(q, k, jnp.asarray(cos3, jnp.float32), jnp.asarray(sin3, jnp.float32),
                      sections, head_dim=head_dim)
    b = exp.MojoMRoPEInplace()(q, k, jnp.asarray(cos3, jnp.float32),
                               jnp.asarray(sin3, jnp.float32), sections, head_dim=head_dim)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-6)


def test_vision_rope2d_single_grid_matches_cellwise_oracle():
    theta, rope_dim = 10000.0, 8  # rotary_dim = 4, per-axis freqs = 2
    op = m.MojoVisionRotaryEmbedding2D(theta, rope_dim)
    gh, gw = 2, 3
    cos, sin = op(np.asarray([[gh, gw]]))
    assert cos.shape == (gh * gw, rope_dim)
    inv = 1.0 / (theta ** (np.arange(0, rope_dim // 2, 2, dtype=np.float64) / (rope_dim // 2)))
    t = 0
    for h in range(gh):
        for w in range(gw):
            freqs = np.concatenate([h * inv, w * inv])
            want = np.cos(np.concatenate([freqs, freqs]))
            np.testing.assert_allclose(np.asarray(cos[t], np.float64), want,
                                       rtol=1e-5, atol=1e-6)
            t += 1


def test_vision_rope2d_adapooling_groups_quads():
    """f=2: the 4 cells of each 2x2 patch become adjacent tokens."""
    op = m.MojoVisionRotaryEmbedding2D(10000.0, 8, adapooling_factor=2)
    pos = np.asarray(op._build_position_ids(np.asarray([[4, 4]])))
    assert pos.shape == (16, 2)
    # first quad = rows 0-1 x cols 0-1
    np.testing.assert_array_equal(pos[:4], [[0, 0], [0, 1], [1, 0], [1, 1]])
    # second quad = rows 0-1 x cols 2-3
    np.testing.assert_array_equal(pos[4:8], [[0, 2], [0, 3], [1, 2], [1, 3]])


def test_vision_rope2d_multi_image_concatenates():
    op = m.MojoVisionRotaryEmbedding2D(10000.0, 8)
    c1, _ = op(np.asarray([[2, 2]]))
    c2, _ = op(np.asarray([[1, 3]]))
    both, _ = op(np.asarray([[2, 2], [1, 3]]))
    np.testing.assert_allclose(np.asarray(both), np.concatenate([c1, c2]), rtol=1e-6)


def test_apply_vision_rope2d_matches_rotate_half():
    T, N, D = 6, 2, 8
    q = randn(0, (T, N, D))
    k = randn(1, (T, N, D))
    cos64, sin64 = _table64(np.arange(T), D, 10000.0)
    qo, ko = m.MojoApplyVisionRoPE2D()(q, k, jnp.asarray(cos64, jnp.float32),
                                       jnp.asarray(sin64, jnp.float32))
    want = _apply64(np.asarray(q, np.float64), cos64[:, None, :], sin64[:, None, :])
    np.testing.assert_allclose(np.asarray(qo, np.float64), want, rtol=2e-5, atol=2e-6)
    assert ko.shape == k.shape


def test_relative_embedding_translation_invariance_and_saturation():
    op = exp.MojoRelativeEmbedding(num_buckets=8, num_heads=2, bidirectional=True,
                                   max_dist=16)
    bias = np.asarray(op(10, 10))  # (1, H, lq, lk)
    assert bias.shape == (1, 2, 10, 10)
    # bias depends only on (j - i): constant along diagonals
    for d in (-3, 0, 2):
        diag = np.diagonal(bias, offset=d, axis1=2, axis2=3)
        np.testing.assert_allclose(diag, diag[..., :1] * np.ones_like(diag), rtol=1e-6)
    # far distances saturate into the same log bucket
    far = np.asarray(op(1, 400))
    np.testing.assert_allclose(far[..., 0, 399], far[..., 0, 398], rtol=1e-6)


def test_relative_embedding_causal_masks_future():
    op = exp.MojoRelativeEmbedding(num_buckets=8, num_heads=1, bidirectional=False,
                                   max_dist=16)
    bias = np.asarray(op(6, 6))
    # unidirectional buckets: all future offsets (j > i) share bucket 0
    fut = [bias[0, 0, i, j] for i in range(6) for j in range(i + 1, 6)]
    np.testing.assert_allclose(fut, fut[0] * np.ones(len(fut)), rtol=1e-6)
