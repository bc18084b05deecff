"""Graph-capture safety for paged attention under ``CompiledStepPool``.

Reference analogue: tests/accuracy/operators/test_attention_cudagraph.py
(996 LoC — every paged op is run under device-graph capture with cache
mutation, then REPLAYED with fresh inputs; trajectories must match eager
execution).  On TPU, capture = a jitted executable with donated cache
buffers; replay = re-invoking the cached executable.  The hazards differ
from CUDA graphs (no stale device pointers) but are just as real:

  - donation aliasing: a donated cache must carry the scatter from step N
    into step N+1 without corrupting unrelated blocks;
  - stale-constant capture: operands (block tables, lengths) must stay
    runtime arguments — never baked into the executable at first call;
  - pool signature collisions: two sessions of different geometry
    interleaved through one pool must not cross-talk;
  - bucket padding: padded token rows must not change real rows' results.

Each test drives several steps through one cached executable and compares
against an eagerly-executed, non-donated golden loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m
import mojo_opset_tpu.experimental as exp
from mojo_opset_tpu.runtime import CompiledStepPool, round_up_bucket

from ..utils import randn
# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def _paged_state(key, batch, hkv, head_dim, block_size, max_blocks, dtype=jnp.float32,
                 n_extra_blocks=2):
    """Empty caches + a block table with one sequence per row."""
    n_blocks = batch * max_blocks + n_extra_blocks
    k_cache = jnp.zeros((n_blocks, hkv, block_size, head_dim), dtype)
    v_cache = jnp.zeros((n_blocks, hkv, block_size, head_dim), dtype)
    tables = jnp.asarray(
        [[b * max_blocks + i for i in range(max_blocks)] for b in range(batch)], jnp.int32
    )
    return k_cache, v_cache, tables


def _decode_step_fn(store, attend):
    """store new K/V then attend over the updated cache; caches donated."""

    def step(k_cache, v_cache, q, k_new, v_new, seq_lens, tables):
        k_cache, v_cache = store(k_new, v_new, k_cache, v_cache, tables, None, seq_lens)
        out = attend(q, k_cache, v_cache, seq_lens + 1, tables)
        return k_cache, v_cache, out

    return step


@pytest.mark.parametrize("gqa_layout", ["AABB", "ABAB"])
@pytest.mark.parametrize("kv_layout", ["HND", "NHD"])
def test_decode_replay_matches_eager(gqa_layout, kv_layout):
    batch, hq, hkv, d, bs, mb = 3, 8, 2, 16, 4, 6
    store = m.MojoStorePagedKVCache(kv_layout=kv_layout)
    attend = m.MojoPagedDecodeGQA(gqa_layout=gqa_layout, kv_layout=kv_layout)
    step = _decode_step_fn(store, attend)

    def init():
        k_cache, v_cache, tables = _paged_state(0, batch, hkv, d, bs, mb)
        if kv_layout == "NHD":
            k_cache = jnp.swapaxes(k_cache, 1, 2)
            v_cache = jnp.swapaxes(v_cache, 1, 2)
        return k_cache, v_cache, tables

    steps = 5
    seq0 = np.array([0, 3, 9], np.int32)
    qs = [randn(10 + t, (batch, hq, d)) for t in range(steps)]
    ks = [randn(40 + t, (batch, hkv, d)) for t in range(steps)]
    vs = [randn(70 + t, (batch, hkv, d)) for t in range(steps)]

    # golden eager trajectory (no pool, no donation)
    k_cache, v_cache, tables = init()
    want = []
    for t in range(steps):
        lens = jnp.asarray(seq0 + t, jnp.int32)
        k_cache, v_cache, out = step(k_cache, v_cache, qs[t], ks[t], vs[t], lens, tables)
        want.append(np.asarray(out))

    # captured replay trajectory (one executable, donated caches)
    pool = CompiledStepPool(step, donate_argnums=(0, 1))
    k_cache, v_cache, tables = init()
    runner = pool.get_runner(k_cache, v_cache, qs[0], ks[0], vs[0],
                             jnp.asarray(seq0, jnp.int32), tables)
    for t in range(steps):
        lens = jnp.asarray(seq0 + t, jnp.int32)
        k_cache, v_cache, out = runner(k_cache, v_cache, qs[t], ks[t], vs[t], lens, tables)
        np.testing.assert_allclose(np.asarray(out), want[t], rtol=1e-5, atol=1e-5)
    assert len(pool._pool) == 1  # replayed, never re-captured


def test_prefill_capture_then_decode_replay():
    """Prefill through the pool, then decode steps through the pool; whole
    trajectory must match the eager ops."""
    batch, hq, hkv, d, bs, mb = 2, 4, 2, 8, 4, 8
    q_lens = [6, 9]
    cu_q = jnp.asarray([0, 6, 15], jnp.int32)
    T = sum(q_lens)

    store = m.MojoStorePagedKVCache()
    prefill = m.MojoPagedPrefillGQA()
    decode = m.MojoPagedDecodeGQA()

    def prefill_step(k_cache, v_cache, q, k_new, v_new, cu_q, ctx, tables):
        k_cache, v_cache = store(k_new, v_new, k_cache, v_cache, tables, cu_q, ctx)
        lens = ctx + jnp.diff(cu_q)
        out = prefill(q, k_cache, v_cache, cu_q, tables,
                      cu_total_seq_lens=jnp.concatenate(
                          [jnp.zeros(1, jnp.int32), jnp.cumsum(lens)]).astype(jnp.int32))
        return k_cache, v_cache, out

    decode_step = _decode_step_fn(store, decode)

    q_p = randn(1, (T, hq, d))
    k_p = randn(2, (T, hkv, d))
    v_p = randn(3, (T, hkv, d))
    ctx0 = jnp.zeros((batch,), jnp.int32)

    def run(pool_prefill, pool_decode):
        k_cache, v_cache, tables = _paged_state(0, batch, hkv, d, bs, mb)
        fn_p = (pool_prefill.get_runner(k_cache, v_cache, q_p, k_p, v_p, cu_q, ctx0, tables)
                if pool_prefill else prefill_step)
        k_cache, v_cache, out_p = fn_p(k_cache, v_cache, q_p, k_p, v_p, cu_q, ctx0, tables)
        outs = [np.asarray(out_p)]
        lens0 = np.asarray(q_lens, np.int32)
        for t in range(3):
            q = randn(20 + t, (batch, hq, d))
            kn = randn(30 + t, (batch, hkv, d))
            vn = randn(50 + t, (batch, hkv, d))
            lens = jnp.asarray(lens0 + t, jnp.int32)
            fn_d = (pool_decode.get_runner(k_cache, v_cache, q, kn, vn, lens, tables)
                    if pool_decode else decode_step)
            k_cache, v_cache, out = fn_d(k_cache, v_cache, q, kn, vn, lens, tables)
            outs.append(np.asarray(out))
        return outs

    want = run(None, None)
    got = run(CompiledStepPool(prefill_step, donate_argnums=(0, 1)),
              CompiledStepPool(decode_step, donate_argnums=(0, 1)))
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("windows", [(None, 5), (2, 5), (2, None)])
def test_swa_decode_replay_matches_eager(windows):
    g_win, l_win = windows
    batch, hq, hkv, d, bs, mb = 2, 4, 2, 8, 4, 8
    store = m.MojoStorePagedKVCache()
    attend = m.MojoPagedDecodeSWA(global_window_size=g_win, local_window_size=l_win)
    step = _decode_step_fn(store, attend)

    seq0 = np.array([5, 11], np.int32)
    pool = CompiledStepPool(step, donate_argnums=(0, 1))
    k_cache_e, v_cache_e, tables = _paged_state(0, batch, hkv, d, bs, mb)
    # pre-fill the eager cache with some history so windows have bite
    hist_k = randn(90, (int(seq0.sum()), hkv, d))
    hist_v = randn(91, (int(seq0.sum()), hkv, d))
    cu_hist = jnp.asarray([0, seq0[0], seq0.sum()], jnp.int32)
    k_cache_e, v_cache_e = store(hist_k, hist_v, k_cache_e, v_cache_e, tables, cu_hist,
                                 jnp.zeros((batch,), jnp.int32))
    k_cache_c, v_cache_c = k_cache_e, v_cache_e

    runner = None
    for t in range(4):
        q = randn(10 + t, (batch, hq, d))
        kn = randn(40 + t, (batch, hkv, d))
        vn = randn(60 + t, (batch, hkv, d))
        lens = jnp.asarray(seq0 + t, jnp.int32)
        k_cache_e, v_cache_e, want = step(k_cache_e, v_cache_e, q, kn, vn, lens, tables)
        if runner is None:
            runner = pool.get_runner(k_cache_c, v_cache_c, q, kn, vn, lens, tables)
        k_cache_c, v_cache_c, got = runner(k_cache_c, v_cache_c, q, kn, vn, lens, tables)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_mla_decode_replay_matches_eager():
    """MLA latent store + paged decode through one captured executable."""
    batch, h, r, dr, d_nope, d_v, bs, mb = 2, 4, 16, 8, 16, 16, 4, 6
    store = exp.MojoStorePagedMLAKVCache()
    attend = exp.MojoPagedDecodeMLA(
        num_heads=h, qk_nope_head_dim=d_nope, qk_rope_head_dim=dr,
        v_head_dim=d_v, kv_lora_rank=r, key=jax.random.PRNGKey(5),
    )

    def step(c_cache, pe_cache, q, c_new, pe_new, seq_lens, tables):
        c_cache, pe_cache = store(c_new, pe_new, c_cache, pe_cache, tables, None, seq_lens)
        out = attend(q, c_cache, pe_cache, seq_lens + 1, tables)
        return c_cache, pe_cache, out

    n_blocks = batch * mb + 1
    c_cache = jnp.zeros((n_blocks, 1, bs, r))
    pe_cache = jnp.zeros((n_blocks, 1, bs, dr))
    tables = jnp.asarray([[b * mb + i for i in range(mb)] for b in range(batch)], jnp.int32)

    seq0 = np.array([2, 7], np.int32)
    traj = []
    for donated in (False, True):
        cc, pc = c_cache, pe_cache
        runner = None
        outs = []
        pool = CompiledStepPool(step, donate_argnums=(0, 1))
        for t in range(4):
            q = randn(10 + t, (batch, h, d_nope + dr))
            cn = randn(30 + t, (batch, r))
            pn = randn(50 + t, (batch, dr))
            lens = jnp.asarray(seq0 + t, jnp.int32)
            if donated:
                if runner is None:
                    runner = pool.get_runner(cc, pc, q, cn, pn, lens, tables)
                cc, pc, out = runner(cc, pc, q, cn, pn, lens, tables)
            else:
                cc, pc, out = step(cc, pc, q, cn, pn, lens, tables)
            outs.append(np.asarray(out))
        traj.append(outs)
    for w, g in zip(*traj):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)


def test_int8_kv_decode_replay_matches_eager():
    """C8 store + KV-dequant decode under capture: quantized caches donate
    and replay identically to the eager path."""
    batch, hq, hkv, d, bs, mb = 2, 4, 2, 8, 4, 6
    k_scale = jnp.full((hkv, d), 0.05, jnp.float32)
    v_scale = jnp.full((hkv, d), 0.04, jnp.float32)
    store = exp.MojoStorePagedKVCacheC8()
    attend = exp.MojoPagedDecodeGQAWithKVDequant(
        query_dtype=jnp.float32, compute_dtype=jnp.float32
    )

    def step(k_cache, v_cache, q, k_new, v_new, seq_lens, tables):
        k_cache, v_cache = store(k_new, v_new, k_cache, v_cache, k_scale, v_scale,
                                 tables, None, seq_lens)
        out = attend(q, None, k_cache, k_scale, v_cache, v_scale, seq_lens + 1, tables)
        return k_cache, v_cache, out

    n_blocks = batch * mb + 1
    tables = jnp.asarray([[b * mb + i for i in range(mb)] for b in range(batch)], jnp.int32)

    seq0 = np.array([1, 6], np.int32)
    traj = []
    for donated in (False, True):
        kc = jnp.zeros((n_blocks, hkv, bs, d), jnp.int8)
        vc = jnp.zeros((n_blocks, hkv, bs, d), jnp.int8)
        runner = None
        pool = CompiledStepPool(step, donate_argnums=(0, 1))
        outs = []
        for t in range(4):
            q = randn(10 + t, (batch, hq, d), scale=0.3)
            kn = randn(40 + t, (batch, hkv, d), scale=0.3)
            vn = randn(60 + t, (batch, hkv, d), scale=0.3)
            lens = jnp.asarray(seq0 + t, jnp.int32)
            if donated:
                if runner is None:
                    runner = pool.get_runner(kc, vc, q, kn, vn, lens, tables)
                kc, vc, out = runner(kc, vc, q, kn, vn, lens, tables)
            else:
                kc, vc, out = step(kc, vc, q, kn, vn, lens, tables)
            outs.append(np.asarray(out))
        traj.append(outs)
    for w, g in zip(*traj):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)


def test_pool_isolates_interleaved_sessions():
    """Two sessions of different batch geometry share one pool; interleaved
    stepping must neither cross-talk nor re-capture."""
    store = m.MojoStorePagedKVCache()
    attend = m.MojoPagedDecodeGQA()
    step = _decode_step_fn(store, attend)
    pool = CompiledStepPool(step, donate_argnums=(0, 1))

    sessions = {}
    for name, batch, seq0 in (("a", 2, [0, 4]), ("b", 3, [1, 2, 3])):
        k_cache, v_cache, tables = _paged_state(0, batch, 2, 8, 4, 5)
        sessions[name] = dict(k=k_cache, v=v_cache, tables=tables,
                              seq0=np.asarray(seq0, np.int32), batch=batch, outs=[])

    def eager_traj(batch, seq0, steps=4):
        k_cache, v_cache, tables = _paged_state(0, batch, 2, 8, 4, 5)
        outs = []
        for t in range(steps):
            q = randn(100 * batch + t, (batch, 4, 8))
            kn = randn(200 * batch + t, (batch, 2, 8))
            vn = randn(300 * batch + t, (batch, 2, 8))
            lens = jnp.asarray(seq0 + t, jnp.int32)
            k_cache, v_cache, out = step(k_cache, v_cache, q, kn, vn, lens, tables)
            outs.append(np.asarray(out))
        return outs

    want = {n: eager_traj(s["batch"], s["seq0"]) for n, s in sessions.items()}

    for t in range(4):
        for name in ("a", "b") if t % 2 == 0 else ("b", "a"):
            s = sessions[name]
            q = randn(100 * s["batch"] + t, (s["batch"], 4, 8))
            kn = randn(200 * s["batch"] + t, (s["batch"], 2, 8))
            vn = randn(300 * s["batch"] + t, (s["batch"], 2, 8))
            lens = jnp.asarray(s["seq0"] + t, jnp.int32)
            runner = pool.get_runner(s["k"], s["v"], q, kn, vn, lens, s["tables"])
            s["k"], s["v"], out = runner(s["k"], s["v"], q, kn, vn, lens, s["tables"])
            s["outs"].append(np.asarray(out))

    assert len(pool._pool) == 2  # one executable per geometry
    for name, s in sessions.items():
        for w, g in zip(want[name], s["outs"]):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)


def test_replay_does_not_bake_operands():
    """Block tables and lengths must stay runtime arguments of the captured
    executable: permuting the table between replays must permute results."""
    batch, hq, hkv, d, bs, mb = 2, 4, 2, 8, 4, 4
    attend = m.MojoPagedDecodeGQA()
    pool = CompiledStepPool(lambda q, kc, vc, lens, bt: attend(q, kc, vc, lens, bt),
                            donate_argnums=())
    k_cache = randn(0, (batch * mb + 1, hkv, bs, d))
    v_cache = randn(1, (batch * mb + 1, hkv, bs, d))
    t_a = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    t_b = jnp.asarray([[4, 5, 6, 7], [0, 1, 2, 3]], jnp.int32)  # swapped rows
    # same query in both rows: swapping each sequence's pages then swaps
    # the per-sequence outputs
    q = jnp.broadcast_to(randn(2, (1, hq, d)), (batch, hq, d))
    lens = jnp.asarray([9, 9], jnp.int32)

    runner = pool.get_runner(q, k_cache, v_cache, lens, t_a)
    out_a = np.asarray(runner(q, k_cache, v_cache, lens, t_a))
    out_b = np.asarray(runner(q, k_cache, v_cache, lens, t_b))
    assert len(pool._pool) == 1
    np.testing.assert_allclose(out_b[0], out_a[1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_b[1], out_a[0], rtol=1e-5, atol=1e-5)
    # and changing lengths changes results through the same executable
    out_c = np.asarray(runner(q, k_cache, v_cache, jnp.asarray([3, 2], jnp.int32), t_a))
    assert np.abs(out_c - out_a).max() > 1e-4


def test_bucketed_prefill_padding_is_inert():
    """round_up_bucket-padded prefill: padded query rows must not change
    the real rows (the jit-bucketing contract the runtime relies on)."""
    hq, hkv, d, bs = 4, 2, 8, 4
    prefill = m.MojoPagedPrefillGQA()
    store = m.MojoStorePagedKVCache()
    q_lens = [5, 8]
    T = sum(q_lens)
    Tp = round_up_bucket(T)
    assert Tp > T

    k_cache, v_cache, tables = _paged_state(0, 2, hkv, d, bs, 8)
    cu_q = jnp.asarray([0, 5, 13], jnp.int32)
    ctx = jnp.zeros((2,), jnp.int32)
    q = randn(1, (T, hq, d))
    kn = randn(2, (T, hkv, d))
    vn = randn(3, (T, hkv, d))

    kc, vc = store(kn, vn, k_cache, v_cache, tables, cu_q, ctx)
    want = np.asarray(prefill(q, kc, vc, cu_q, tables))

    # pad tokens to the bucket; cu_q_lens unchanged => extra rows are dead
    pad = Tp - T
    q_pad = jnp.concatenate([q, jnp.zeros((pad, hq, d), q.dtype)])
    kn_pad = jnp.concatenate([kn, jnp.full((pad, hkv, d), 7.0, kn.dtype)])
    vn_pad = jnp.concatenate([vn, jnp.full((pad, hkv, d), -7.0, vn.dtype)])
    kc2, vc2 = store(kn_pad, vn_pad, k_cache, v_cache, tables, cu_q, ctx)
    got = np.asarray(prefill(q_pad, kc2, vc2, cu_q, tables))[:T]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_donated_buffers_are_consumed():
    """After a donated call, the old cache buffer must be dead (the
    use-after-donation hazard the reference's graph tests guard)."""
    store = m.MojoStorePagedKVCache()
    attend = m.MojoPagedDecodeGQA()
    step = _decode_step_fn(store, attend)
    pool = CompiledStepPool(step, donate_argnums=(0, 1))
    k_cache, v_cache, tables = _paged_state(0, 2, 2, 8, 4, 4)
    q = randn(1, (2, 4, 8))
    kn = randn(2, (2, 2, 8))
    vn = randn(3, (2, 2, 8))
    lens = jnp.asarray([0, 1], jnp.int32)
    runner = pool.get_runner(k_cache, v_cache, q, kn, vn, lens, tables)
    new_k, _new_v, _ = runner(k_cache, v_cache, q, kn, vn, lens, tables)
    if not k_cache.is_deleted():
        pytest.skip("backend did not donate (donation unsupported on this platform)")
    assert new_k is not k_cache
    with pytest.raises(RuntimeError):
        np.asarray(k_cache)
