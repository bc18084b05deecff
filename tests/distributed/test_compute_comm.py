"""ComputeComm ops under shard_map on an 8-device CPU mesh.

Reference analogue: tests/distributed/ comm-fused op coverage; each op's
sharded result must equal the single-device computation.
"""

from .dist_common import run_distributed
import pytest

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def test_gemm_allreduce_matches_dense():
    run_distributed("""
    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("tp",))
    K, N, T = 32, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (T, K))
    w = jax.random.normal(jax.random.PRNGKey(1), (N, K))
    b = jax.random.normal(jax.random.PRNGKey(2), (N,))
    want = x @ w.T + b

    def f(x_shard, w_shard):
        op = m.MojoGemmAllReduce(w_shard, bias=b, axis_name="tp")
        return op(x_shard)

    got = shard_map(
        f, mesh=mesh, in_specs=(P(None, "tp"), P(None, "tp")), out_specs=P(None, None),
        check_vma=False,
    )(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
    print("OK")
    """)


def test_allgather_gemm_ref_and_xla_overlapped():
    run_distributed("""
    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    T, K, N = 16, 8, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (T, K))
    w = jax.random.normal(jax.random.PRNGKey(1), (N, K))
    want = x @ w.T

    for impl in ("ref", "xla"):
        def f(x_shard):
            op = m.MojoAllGatherGemm.get_backend_impl(impl)(w, axis_name="sp")
            return op(x_shard)
        got = shard_map(f, mesh=mesh, in_specs=(P("sp", None),), out_specs=P(None, None),
                        check_vma=False)(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4,
                                   err_msg=impl)
    print("OK")
    """)


def test_gemm_reduce_scatter_ref_and_xla_overlapped():
    run_distributed("""
    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("tp",))
    T, K, N = 16, 32, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (T, K))
    w = jax.random.normal(jax.random.PRNGKey(1), (N, K))
    want = x @ w.T  # full result; each rank ends with rows shard

    for impl in ("ref", "xla"):
        def f(x_shard, w_shard):
            op = m.MojoGemmReduceScatter.get_backend_impl(impl)(w_shard, axis_name="tp")
            return op(x_shard)
        got = shard_map(f, mesh=mesh, in_specs=(P(None, "tp"), P(None, "tp")),
                        out_specs=P("tp", None), check_vma=False)(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4,
                                   err_msg=impl)
    print("OK")
    """)


def test_gemm_all2all_ulysses_roundtrip():
    run_distributed("""
    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    # Ulysses: seq-sharded input (T/n per rank), gemm to H heads, a2a to
    # head-sharded full-seq: global semantic = reshard of the full gemm out
    T, K = 16, 8
    H = 8  # head blocks along feature dim
    x = jax.random.normal(jax.random.PRNGKey(0), (T, K))
    w = jax.random.normal(jax.random.PRNGKey(1), (H * 4, K))
    full = x @ w.T  # (T, 32)

    def f(x_shard):
        op = m.MojoGemmAll2All(w, axis_name="sp", scatter_dim=1, gather_dim=0)
        return op(x_shard)

    got = shard_map(f, mesh=mesh, in_specs=(P("sp", None),), out_specs=P(None, "sp"),
                    check_vma=False)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=1e-4, rtol=1e-4)
    print("OK")
    """)


def test_quant_gemm_all2all_pair():
    run_distributed("""
    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("tp",))
    rng = np.random.default_rng(0)
    M, K, N = 8, 8, 64  # N_local = 16, divisible by n
    x = jnp.asarray(rng.integers(-100, 100, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-100, 100, (N, K)), jnp.int8)
    ws = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (N,))) + 0.1
    ts = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (M,))) + 0.1
    dense = (np.asarray(x, np.float64) @ np.asarray(w, np.float64).T) * np.asarray(ws)[None, :] * np.asarray(ts)[:, None]

    # each rank computes full rows x its column shard of W, then a2a
    def f(w_shard, ws_shard):
        op = m.MojoQuantGemmAll2All(w_shard, ws_shard, axis_name="tp", output_dtype=jnp.float32)
        return op(x, ts)

    got = np.asarray(shard_map(f, mesh=mesh, in_specs=(P("tp", None), P("tp",)),
                     out_specs=P("tp", None), check_vma=False)(w, ws))
    # rank r's block (n*M rows): peer p's column-sub-chunk r, stacked by p
    Nl, Nsub = N // n, N // n // n
    reassembled = np.zeros((M, N), np.float32)
    for r in range(n):
        for p in range(n):
            block = got[r*n*M + p*M : r*n*M + (p+1)*M]
            reassembled[:, p*Nl + r*Nsub : p*Nl + (r+1)*Nsub] = block
    np.testing.assert_allclose(reassembled, dense, rtol=1e-3)
    print("OK")
    """)


def test_all2all_quant_gemm():
    run_distributed("""
    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("tp",))
    rng = np.random.default_rng(0)
    M, Kl, N = 8, 8, 16  # global K = Kl*n
    Kg = Kl * n
    xg = jnp.asarray(rng.integers(-100, 100, (M, Kg)), jnp.int8)
    w = jnp.asarray(rng.integers(-100, 100, (N, Kg)), jnp.int8)
    ws = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (N,))) + 0.1
    ts = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (M,))) + 0.1
    dense = (np.asarray(xg, np.float64) @ np.asarray(w, np.float64).T) * np.asarray(ws)[None, :] * np.asarray(ts)[:, None]

    # input sharded by K columns; per-token scale full on every rank;
    # output comes back sharded by rows
    def f(x_shard):
        op = m.MojoAll2AllQuantGemm(w, ws, axis_name="tp", output_dtype=jnp.float32)
        return op(x_shard, ts)

    got = shard_map(f, mesh=mesh, in_specs=(P(None, "tp"),), out_specs=P("tp", None),
                    check_vma=False)(xg)
    np.testing.assert_allclose(np.asarray(got), dense, rtol=1e-3)
    print("OK")
    """)


def test_moe_ep_shard_map_matches_single_device():
    run_distributed("""
    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("ep",))
    T, H, I, E, K = 8, 16, 32, 8, 2
    full = m.MojoMoE.get_backend_impl("xla")(E, K, H, I)
    x = jax.random.normal(jax.random.PRNGKey(0), (T, H))
    want = full(x)

    ep_moe = m.MojoMoE.get_backend_impl("xla")(E, K, H, I, ep_size=n, ep_axis_name="ep")
    ep_moe = ep_moe.replace(gating=ep_moe.gating.replace(gate_weight=full.gating.gate_weight))

    # pass expert weights as explicit shard_map args (sharded over ep);
    # the small gating weight rides the closure (replicated constant)
    def f(up_w, down_w, x_full):
        moe_local = ep_moe.replace(
            experts=ep_moe.experts.replace(up_proj_weight=up_w, down_proj_weight=down_w)
        )
        return moe_local(x_full)

    got = shard_map(
        f, mesh=mesh,
        in_specs=(P("ep", None, None), P("ep", None, None), P(None, None)),
        out_specs=P(None, None), check_vma=False,
    )(full.experts.up_proj_weight, full.experts.down_proj_weight, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
    print("OK")
    """)
