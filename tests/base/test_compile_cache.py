"""CompiledStepPool tests — the device-graph capture/replay analogue.

Reference analogue: tests/test_ttx_graph/ (DeviceGraphRunner capture/replay
parity, pool keyed by batch size, session-change invalidation).
"""

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.runtime import CompiledStepPool, round_up_bucket


def test_pool_reuses_executable_for_same_signature():
    calls = {"n": 0}

    def step(state, x):
        calls["n"] += 1  # traced once per compile
        return state + x.sum(), x * 2

    pool = CompiledStepPool(step, donate_argnums=())
    r1 = pool.get_runner(jnp.zeros(()), jnp.ones((4, 8)))
    r2 = pool.get_runner(jnp.ones(()), jnp.zeros((4, 8)))
    assert r1 is r2
    r1(jnp.zeros(()), jnp.ones((4, 8)))
    r1(jnp.ones(()), jnp.ones((4, 8)))
    assert calls["n"] == 1  # compiled once, replayed


def test_pool_compiles_per_batch_size():
    def step(state, x):
        return state + x.sum(), x

    pool = CompiledStepPool(step, donate_argnums=())
    pool.get_runner(jnp.zeros(()), jnp.ones((2, 8)))
    pool.get_runner(jnp.zeros(()), jnp.ones((4, 8)))
    pool.get_runner(jnp.zeros(()), jnp.ones((2, 8)))
    assert len(pool._pool) == 2


def test_pool_keyed_on_dtype_and_structure():
    def step(state, x):
        return state, x

    pool = CompiledStepPool(step, donate_argnums=())
    pool.get_runner(jnp.zeros(()), jnp.ones((2, 8), jnp.float32))
    pool.get_runner(jnp.zeros(()), jnp.ones((2, 8), jnp.bfloat16))
    pool.get_runner(jnp.zeros(()), {"a": jnp.ones((2, 8), jnp.float32)})
    assert len(pool._pool) == 3
    pool.clear()
    assert not pool._pool


def test_donated_cache_updates_in_place_semantics():
    """Donated first arg: replay must produce the same trajectory as an
    undonated reference loop (graph-capture safety — reference
    test_attention_cudagraph.py's core property)."""

    def step(cache, tok):
        new_cache = cache.at[tok].add(1.0)
        return new_cache, new_cache.sum()

    pool = CompiledStepPool(step, donate_argnums=(0,))
    cache = jnp.zeros((8,))
    runner = pool.warmup(cache, jnp.int32(0))
    # fresh state after warmup (warmup consumed its donated buffer)
    cache = jnp.zeros((8,))
    sums = []
    for t in [1, 2, 1]:
        cache, s = runner(cache, jnp.int32(t))
        sums.append(float(s))
    assert sums == [1.0, 2.0, 3.0]
    want = np.zeros(8)
    for t in [1, 2, 1]:
        want[t] += 1
    np.testing.assert_array_equal(np.asarray(cache), want)


def test_round_up_bucket():
    assert round_up_bucket(1) >= 1
    assert round_up_bucket(5) >= 5
    assert round_up_bucket(round_up_bucket(5)) == round_up_bucket(5)  # idempotent
    # bucketing limits distinct signatures
    buckets = {round_up_bucket(n) for n in range(1, 129)}
    assert len(buckets) < 32
