"""Device-side op timing.

Host-side wall-clock through the axon tunnel has a ~30-40us dispatch
floor, so per-op latencies are measured by chaining invocations inside a
jitted ``lax.scan`` (a data dependency between iterations stops XLA from
overlapping or eliminating them).  Fixed costs (dispatch, scan setup) are
cancelled by timing two chain lengths and dividing the difference:

    per_call = (T(2n) - T(n)) / n        with min-of-k repeats per length

This replaces the reference's profiler-span / event timing
(reference benchmark/xpu_adapter.py:318-373) with an XLA-native scheme.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _chain(fn, args, length):
    # Inputs enter as REAL jit arguments, never closure constants: baked-in
    # constants (a) blow up the remote-compile payload for big operands and
    # (b) would let XLA constant-fold the op under test.
    @jax.jit
    def run(a0, *rest):
        def body(carry, _):
            out = fn(a0 + carry, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            # Data-dependent carry that is zero at runtime but NOT provably
            # zero to XLA (a scaled-constant carry underflows in bf16 and
            # the whole body gets hoisted out of the scan).
            flag = jnp.isnan(leaf.ravel()[0].astype(jnp.float32))
            next_carry = jnp.where(flag, 1.0, 0.0).astype(a0.dtype)
            return next_carry, ()

        carry, _ = jax.lax.scan(body, jnp.zeros((), a0.dtype), None, length=length)
        return carry

    return lambda: run(*args)


def device_time_us(
    fn: Callable, *args, iters: int = 20, repeats: int = 6, warmup: int = 2,
    max_iters: int = 512,
) -> float:
    """Average device time per call of fn(*args), in microseconds.

    The per-dispatch floor through the axon tunnel is ~3.5 ms with ~1 ms
    of jitter, so a fixed chain length drowns microsecond ops in floor
    noise. The chain length doubles until the doubled chain costs at
    least 1.8x the single one — i.e. the marginal per-call cost clearly
    dominates the floor — before trusting (T(2n)-T(n))/n.
    """

    def best(run):
        for _ in range(warmup):
            jax.block_until_ready(run())
        t_best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            t_best = min(t_best, time.perf_counter() - t0)
        return t_best

    n = max(1, iters)
    per_call = 0.0
    while True:
        t_n = best(_chain(fn, args, n))
        t_2n = best(_chain(fn, args, 2 * n))
        per_call = (t_2n - t_n) / n
        if per_call > 0 and t_2n >= 1.8 * t_n:
            break
        if 2 * n >= max_iters:
            break
        n *= 2
    return max(per_call * 1e6, 1e-3)
