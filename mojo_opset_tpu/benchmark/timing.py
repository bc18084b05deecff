"""Device-side op timing.

Host-side wall-clock through the axon tunnel has a ~30-40us dispatch
floor, so per-op latencies are measured by chaining ``iters`` invocations
inside ONE jitted ``lax.scan`` (a data dependency between iterations stops
XLA from overlapping or eliminating them) and dividing the total device
time.  This replaces the reference's profiler-span / event timing
(reference benchmark/xpu_adapter.py:318-373) with an XLA-native scheme.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_time_us(fn: Callable, *args, iters: int = 100, warmup: int = 2) -> float:
    """Median-free average device time per call of fn(*args), in µs.

    The first argument is perturbed by a zero-valued carry derived from
    the previous iteration's output, creating a serial dependency chain.
    """
    a0 = args[0]
    rest = args[1:]

    def body(carry, _):
        out = fn(a0 + carry, *rest)
        leaf = jax.tree_util.tree_leaves(out)[0]
        # tiny-but-nonfoldable perturbation keeps the serial chain alive
        # (a literal *0 lets XLA fold the carry and dead-code the body)
        next_carry = (leaf.ravel()[:1].sum() * 1e-30).astype(a0.dtype)
        return next_carry, ()

    @jax.jit
    def run():
        carry, _ = jax.lax.scan(body, jnp.zeros((), a0.dtype), None, length=iters)
        return carry

    for _ in range(warmup):
        jax.block_until_ready(run())
    t0 = time.perf_counter()
    jax.block_until_ready(run())
    total = time.perf_counter() - t0

    # subtract the dispatch/scan floor measured with a single iteration
    @jax.jit
    def run1():
        carry, _ = jax.lax.scan(body, jnp.zeros((), a0.dtype), None, length=1)
        return carry

    for _ in range(warmup):
        jax.block_until_ready(run1())
    t0 = time.perf_counter()
    jax.block_until_ready(run1())
    floor = time.perf_counter() - t0

    per_call = (total - floor) / max(iters - 1, 1)
    return max(per_call * 1e6, 1e-3)
