"""EP MoE against single-rank goldens — quantized experts and dp_input.

Parity: reference tests/distributed/test_moe_ep.py (quantized MoE EP on
real devices) and tests/distributed/test_expert_parallel.py:169 (EP vs
single-rank golden). Here the pod is 8 virtual CPU devices and EP rides
``shard_map`` (see dist_common.py).
"""

from tests.distributed.dist_common import run_distributed
import pytest

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def test_quant_moe_ep_matches_single_device():
    run_distributed("""
    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("ep",))
    T, H, I, E, K = 8, 16, 32, 8, 2
    kw = dict(num_experts=E, top_k=K, hidden_size=H, intermediate_size=I)
    full = m.MojoQuantMoE.get_backend_impl("xla")(**kw)

    rng = np.random.default_rng(0)
    up_w = jnp.asarray(rng.integers(-20, 20, (E, 2 * I, H)), jnp.int8)
    down_w = jnp.asarray(rng.integers(-20, 20, (E, H, I)), jnp.int8)
    up_s = jnp.asarray(rng.uniform(0.01, 0.02, (E, 2 * I)), jnp.bfloat16)
    down_s = jnp.asarray(rng.uniform(0.01, 0.02, (E, H)), jnp.bfloat16)
    up_sm = jnp.asarray(rng.uniform(0.8, 1.2, (E, H)), jnp.float32)
    down_sm = jnp.asarray(rng.uniform(0.8, 1.2, (E, I)), jnp.float32)

    def load(moe, up_w, down_w, up_s, down_s, up_sm, down_sm):
        return moe.replace(experts=moe.experts.replace(
            up_proj_weight=up_w, down_proj_weight=down_w,
            up_proj_weight_scale=up_s, down_proj_weight_scale=down_s,
            up_proj_quantize=moe.experts.up_proj_quantize.replace(inv_smooth_scale=up_sm),
            down_proj_quantize=moe.experts.down_proj_quantize.replace(inv_smooth_scale=down_sm),
        ))

    full = load(full, up_w, down_w, up_s, down_s, up_sm, down_sm)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, H))
    want = full(x)

    ep_moe = m.MojoQuantMoE.get_backend_impl("xla")(**kw, ep_size=n, ep_axis_name="ep")
    ep_moe = ep_moe.replace(gating=ep_moe.gating.replace(gate_weight=full.gating.gate_weight))

    def f(up_w, down_w, up_s, down_s, up_sm, down_sm, x_full):
        moe_local = load(ep_moe, up_w, down_w, up_s, down_s, up_sm, down_sm)
        return moe_local(x_full)

    got = shard_map(
        f, mesh=mesh,
        in_specs=(P("ep", None, None), P("ep", None, None), P("ep", None),
                  P("ep", None), P("ep", None), P("ep", None), P(None, None)),
        out_specs=P(None, None), check_vma=False,
    )(up_w, down_w, up_s, down_s, up_sm, down_sm, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2)
    print("OK")
    """)


def test_moe_ep_dp_input_matches_single_device():
    # dp_input mode: tokens enter sharded over the ep axis, are all-gathered
    # for routing, and outputs are reduce-scattered back to token shards
    # (reference core/operators/moe.py:79-129 dp_input branch).
    run_distributed("""
    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("ep",))
    T, H, I, E, K = 16, 16, 32, 8, 2
    full = m.MojoMoE.get_backend_impl("xla")(E, K, H, I)
    x = jax.random.normal(jax.random.PRNGKey(0), (T, H))
    want = full(x)

    ep_moe = m.MojoMoE.get_backend_impl("xla")(E, K, H, I, ep_size=n, ep_axis_name="ep",
                                               dp_input=True)
    ep_moe = ep_moe.replace(gating=ep_moe.gating.replace(gate_weight=full.gating.gate_weight))

    def f(up_w, down_w, x_shard):
        moe_local = ep_moe.replace(
            experts=ep_moe.experts.replace(up_proj_weight=up_w, down_proj_weight=down_w)
        )
        return moe_local(x_shard)

    got = shard_map(
        f, mesh=mesh,
        in_specs=(P("ep", None, None), P("ep", None, None), P("ep", None)),
        out_specs=P("ep", None), check_vma=False,
    )(full.experts.up_proj_weight, full.experts.down_proj_weight, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
    print("OK")
    """)


def test_moe_ep_jit_end_to_end():
    # EP MoE under jit with NamedSharding'd inputs — the GSPMD path a real
    # serving deployment uses (shard_map inside jit).
    run_distributed("""
    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("ep",))
    T, H, I, E, K = 8, 16, 32, 8, 2
    full = m.MojoMoE.get_backend_impl("xla")(E, K, H, I)
    x = jax.random.normal(jax.random.PRNGKey(0), (T, H))
    want = full(x)

    ep_moe = m.MojoMoE.get_backend_impl("xla")(E, K, H, I, ep_size=n, ep_axis_name="ep")
    ep_moe = ep_moe.replace(gating=ep_moe.gating.replace(gate_weight=full.gating.gate_weight))

    def f(up_w, down_w, x_full):
        moe_local = ep_moe.replace(
            experts=ep_moe.experts.replace(up_proj_weight=up_w, down_proj_weight=down_w)
        )
        return moe_local(x_full)

    sharded = shard_map(f, mesh=mesh,
        in_specs=(P("ep", None, None), P("ep", None, None), P(None, None)),
        out_specs=P(None, None), check_vma=False)
    jf = jax.jit(sharded)
    got = jf(full.experts.up_proj_weight, full.experts.down_proj_weight, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
    print("OK")
    """)



def test_ep_collectives_appear_in_lowered_hlo():
    """The EP pipeline's communication must be real collectives in the
    compiled program (reference test_expert_parallel.py:169 checks the FX
    graph captured the all-reduce; here we check the lowered HLO text)."""
    run_distributed("""
    import re
    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("ep",))
    T, H, I, E, K = 8, 16, 32, 8, 2
    moe = m.MojoMoE.get_backend_impl("xla")(E, K, H, I, ep_size=n, ep_axis_name="ep")

    def f(up_w, down_w, x_full):
        local = moe.replace(experts=moe.experts.replace(
            up_proj_weight=up_w, down_proj_weight=down_w))
        return local(x_full)

    up_w = jax.random.normal(jax.random.PRNGKey(0), (E, 2 * I, H))
    down_w = jax.random.normal(jax.random.PRNGKey(1), (E, H, I))
    x = jax.random.normal(jax.random.PRNGKey(2), (T, H))
    sharded = shard_map(f, mesh=mesh,
                        in_specs=(P("ep", None, None), P("ep", None, None), P(None, None)),
                        out_specs=P(None, None), check_vma=False)
    txt = jax.jit(sharded).lower(up_w, down_w, x).as_text()
    assert re.search(r"all-reduce|all_reduce|psum", txt), "no all-reduce in HLO"

    moe_dp = m.MojoMoE.get_backend_impl("xla")(E, K, H, I, ep_size=n, ep_axis_name="ep",
                                               dp_input=True)

    def f_dp(up_w, down_w, x_shard):
        local = moe_dp.replace(experts=moe_dp.experts.replace(
            up_proj_weight=up_w, down_proj_weight=down_w))
        return local(x_shard)

    sharded_dp = shard_map(f_dp, mesh=mesh,
                           in_specs=(P("ep", None, None), P("ep", None, None), P("ep", None)),
                           out_specs=P("ep", None), check_vma=False)
    txt_dp = jax.jit(sharded_dp).lower(up_w, down_w, x).as_text()
    assert re.search(r"all-gather|all_gather", txt_dp), "no all-gather in dp_input HLO"
    assert re.search(r"reduce-scatter|reduce_scatter|reduce_scatter_p", txt_dp), "no reduce-scatter in dp_input HLO"
    print("collectives present")
    """)
