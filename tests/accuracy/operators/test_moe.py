"""Accuracy tests for the MoE chain.

Reference analogue: tests/accuracy/operators/test_moe*.py + the
"bucket order is unordered" contract (reference moe.py:367-373) —
dispatch buckets compare as sets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mojo_opset_tpu as m

from ..utils import randn


def test_gating_semantics():
    T, H, E, K = 6, 16, 8, 2
    op = m.MojoMoEGating.get_backend_impl("ref")(H, E, K)
    x = randn(0, (T, H))
    idx, gates = op(x)
    assert idx.shape == (T, K) and idx.dtype == jnp.int32
    assert gates.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(gates.sum(-1)), 1.0, atol=1e-6)
    # indices are the true top-k of softmax(x @ W)
    logits = np.asarray(x, np.float32) @ np.asarray(op.gate_weight)
    want_topk = np.argsort(-logits, axis=-1)[:, :K]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), -1), np.sort(want_topk, -1))


def test_dispatch_bucket_sets_and_counts():
    T, H, E, K = 5, 8, 4, 2
    gating = m.MojoMoEGating.get_backend_impl("ref")(H, E, K)
    dispatch = m.MojoMoEDispatch.get_backend_impl("ref")(E)
    x = randn(0, (T, H))
    idx, gates = gating(x)
    sh, tpe, sg, ti = dispatch(x, gates, idx)
    assert int(tpe.sum()) == T * K
    # bucket membership as sets
    flat = np.asarray(idx).reshape(-1)
    tok_of_row = np.repeat(np.arange(T), K)
    starts = np.concatenate([[0], np.cumsum(np.asarray(tpe))[:-1]])
    for e in range(E):
        want = set(tok_of_row[flat == e].tolist())
        got = set(np.asarray(ti)[starts[e] : starts[e] + int(tpe[e])].tolist())
        assert got == want, f"expert {e} bucket mismatch"
    # sorted_hidden rows match the gathered tokens
    np.testing.assert_allclose(np.asarray(sh), np.asarray(x)[np.asarray(ti)])


def test_experts_ref_vs_xla():
    E, H, I = 4, 16, 32
    ref = m.MojoExperts.get_backend_impl("ref")(E, H, I)
    xla = m.MojoExperts.get_backend_impl("xla")(E, H, I)
    xla = xla.sync_weights_from(ref)
    tpe = jnp.array([3, 0, 5, 2], jnp.int32)
    x = randn(1, (10, H))
    o1 = ref(x, tpe)
    o2 = xla(x, tpe)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5, rtol=2e-5)


def test_experts_pallas_gmm_vs_ref():
    """Pallas experts (aligned-window GMM, interpret mode) vs golden,
    at a geometry the kernel accepts (H/I multiples of 128/256)."""
    E, H, I = 4, 128, 128
    ref = m.MojoExperts.get_backend_impl("ref")(E, H, I)
    pal = m.MojoExperts.get_backend_impl("pallas")(E, H, I)
    pal = pal.sync_weights_from(ref)
    tpe = jnp.array([100, 0, 412, 512], jnp.int32)
    x = randn(1, (1024, H)) * 0.1
    o1 = ref(x, tpe)
    o2 = pal(x, tpe)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=5e-4, rtol=5e-4)


def test_combine_scatter_add():
    T, H = 4, 8
    combine = m.MojoMoECombine.get_backend_impl("ref")()
    expert_out = randn(0, (6, H))
    gates = jnp.abs(randn(1, (6, 1)))
    ti = jnp.array([0, 1, 0, 2, 3, 1], jnp.int32)
    out = combine(jnp.zeros((T, H)), expert_out, gates, ti)
    want = np.zeros((T, H), np.float32)
    for r in range(6):
        want[int(ti[r])] += np.asarray(expert_out[r]) * float(gates[r, 0])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5, rtol=1e-5)


def test_moe_end_to_end_matches_manual():
    T, H, I, E, K = 7, 16, 32, 4, 2
    moe = m.MojoMoE.get_backend_impl("ref")(E, K, H, I)
    x = randn(0, (T, H))
    out = moe(x)
    assert out.shape == (T, H)
    # manual dense computation
    idx, gates = moe.gating(x)
    want = np.zeros((T, H), np.float32)
    for t in range(T):
        for k in range(K):
            e = int(idx[t, k])
            xe = np.asarray(x[t], np.float32)
            fc1 = xe @ np.asarray(moe.experts.up_proj_weight[e], np.float32).T
            g, u = np.split(fc1, 2)
            act = g / (1 + np.exp(-g)) * u
            y = act @ np.asarray(moe.experts.down_proj_weight[e], np.float32).T
            want[t] += float(gates[t, k]) * y
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4, rtol=1e-4)


def test_moe_xla_tier_matches_ref_and_jits():
    T, H, I, E, K = 9, 16, 32, 4, 2
    ref = m.MojoMoE.get_backend_impl("ref")(E, K, H, I)
    xla = m.MojoMoE.get_backend_impl("xla")(E, K, H, I)
    xla = xla.sync_weights_from(ref)
    x = randn(0, (T, H))
    o_ref = ref(x)
    o_xla = jax.jit(lambda moe, x: moe(x))(xla, x)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_xla), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_moe_ep_eager_matches_single_rank():
    """EP shards run independently and their psum equals the single-rank
    result (reference tests/distributed/test_expert_parallel.py)."""
    T, H, I, E, K = 6, 16, 32, 4, 2
    full = m.MojoMoE.get_backend_impl("ref")(E, K, H, I)
    x = randn(0, (T, H))
    want = full(x)

    partial_sum = np.zeros((T, H), np.float32)
    for rank in range(2):
        part = m.MojoMoE.get_backend_impl("ref")(E, K, H, I, ep_size=2, ep_rank=rank)
        # share gating weight; slice expert weights to the local range
        part = part.replace(
            gating=part.gating.replace(gate_weight=full.gating.gate_weight),
            experts=part.experts.replace(
                up_proj_weight=full.experts.up_proj_weight[part.ep_start : part.ep_end],
                down_proj_weight=full.experts.down_proj_weight[part.ep_start : part.ep_end],
            ),
        )
        partial_sum += np.asarray(part(x), np.float32)
    np.testing.assert_allclose(partial_sum, np.asarray(want), atol=1e-4, rtol=1e-4)


def test_quant_experts_w8_and_w4():
    E, H, I = 2, 16, 16
    rng = np.random.default_rng(0)
    tpe = jnp.array([3, 2], jnp.int32)
    x = randn(1, (5, H))

    for wdtype in [jnp.int8, "int4"]:
        op = m.MojoQuantExperts.get_backend_impl("ref")(
            E, H, I, up_weight_dtype=wdtype, down_weight_dtype=wdtype
        )
        if wdtype == "int4":
            up_w = jnp.asarray(rng.integers(-128, 128, (E, I, H)), jnp.int8)
            down_w = jnp.asarray(rng.integers(-128, 128, (E, H // 2, I)), jnp.int8)
        else:
            up_w = jnp.asarray(rng.integers(-16, 16, (E, 2 * I, H)), jnp.int8)
            down_w = jnp.asarray(rng.integers(-16, 16, (E, H, I)), jnp.int8)
        op = op.replace(
            up_proj_weight=up_w,
            down_proj_weight=down_w,
            up_proj_weight_scale=jnp.full((E, 2 * I), 0.01, jnp.bfloat16),
            down_proj_weight_scale=jnp.full((E, H), 0.01, jnp.bfloat16),
        )
        out = op(x, tpe)
        assert out.shape == (5, H)
        assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.slow
def test_quant_experts_xla_jittable_matches_ref():
    """XlaQuantExperts (int8 ragged_dot, jittable) vs the eager golden
    loop for w8a8 per-channel scales."""
    E, H, I = 4, 64, 64
    rng = np.random.default_rng(0)
    ref = m.MojoQuantExperts.get_backend_impl("ref")(E, H, I)
    xla = m.MojoQuantExperts.get_backend_impl("xla")(E, H, I)
    w_up = jnp.asarray(rng.integers(-127, 128, (E, 2 * I, H)), jnp.int8)
    w_down = jnp.asarray(rng.integers(-127, 128, (E, H, I)), jnp.int8)
    us = jnp.asarray(rng.uniform(0.001, 0.01, (E, 2 * I)), jnp.bfloat16)
    ds = jnp.asarray(rng.uniform(0.001, 0.01, (E, H)), jnp.bfloat16)
    for op in (ref, xla):
        op.up_proj_weight = w_up
        op.down_proj_weight = w_down
        op.up_proj_weight_scale = us
        op.down_proj_weight_scale = ds
    x = randn(1, (12, H))
    tpe = jnp.array([3, 0, 5, 4], jnp.int32)
    o_ref = ref(x, tpe)
    o_xla = jax.jit(lambda a, t: xla(a, t))(x, tpe)  # must be jittable
    np.testing.assert_allclose(
        np.asarray(o_xla), np.asarray(o_ref), atol=2e-2, rtol=2e-2
    )


def test_unpack_int4_roundtrip():
    rng = np.random.default_rng(1)
    vals = rng.integers(-8, 8, (6, 4)).astype(np.int8)
    packed = np.zeros((3, 4), np.int8)
    packed |= vals[::2] & 0x0F
    packed |= (vals[1::2] & 0x0F) << 4
    un = m.unpack_int4(jnp.asarray(packed))
    np.testing.assert_array_equal(np.asarray(un), vals)


def test_quant_moe_runs():
    T, H, I, E, K = 5, 16, 16, 4, 2
    moe = m.MojoQuantMoE.get_backend_impl("ref")(E, K, H, I)
    x = randn(0, (T, H))
    out = moe(x)
    assert out.shape == (T, H)
    assert np.isfinite(np.asarray(out, np.float32)).all()
