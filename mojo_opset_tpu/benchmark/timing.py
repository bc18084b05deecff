"""Device-side op timing.

Host-side wall-clock through the axon tunnel has a large, jittery
dispatch floor, so per-op latencies are measured by chaining invocations
inside a jitted ``lax.fori_loop`` (a data dependency between iterations
stops XLA from overlapping or eliminating them). The trip count is a
RUNTIME argument, so the whole search compiles exactly once per op.
Fixed costs (dispatch, loop setup, result-fetch RTT) are cancelled by
timing two chain lengths and dividing the difference:

    per_call = (T(2n) - T(n)) / n        with min-of-k repeats per length

This replaces the reference's profiler-span / event timing
(reference benchmark/xpu_adapter.py:318-373) with an XLA-native scheme.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def device_sync(tree):
    """Barrier that really waits for device execution.

    ``jax.block_until_ready`` is NOT a reliable barrier on the axon
    (tunneled TPU) platform: unless a host fetch has flushed the execution
    queue it returns immediately. Fetching one element per leaf forces the
    producing program to finish (TPU programs complete as a unit) while
    moving only a few bytes over the tunnel.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[0])
    return tree


def _make_runner(fn, args, thread_idx=()):
    """One jitted chain with a runtime trip count.

    Inputs enter as REAL jit arguments, never closure constants: baked-in
    constants (a) blow up the remote-compile payload for big operands and
    (b) would let XLA constant-fold the op under test.

    ``thread_idx``: sequence of (arg_position, output_position) pairs —
    those outputs are fed back as the named args on the next iteration,
    so state-mutating ops (cache stores) can alias buffers in the loop
    instead of materializing a full state copy per call.
    """
    if thread_idx:
        return _make_threaded_runner(fn, args, thread_idx)

    @jax.jit
    def run(n, a0, *rest):
        def body(_i, carry):
            out = fn(a0 + (carry * 1e-30).astype(a0.dtype), *rest)
            # Three XLA rewrites will silently elide the op under test if
            # the carry is not constructed carefully (all three observed on
            # XLA:TPU):
            #   1. carry keyed on out[0,0]  -> slice-of-dot shrinks a matmul
            #      to a single row-col dot;
            #   2. carry = sum(out)         -> sum(A@B) refactored to
            #      colsum(A)@rowsum(B), dot eliminated;
            #   3. carry = where(isnan(tot),1,0) -> compare(x,x,NE) folded
            #      to false under no-NaN fast math, carry becomes constant,
            #      loop body goes dead.
            # So: reduce EVERY output element through abs (non-factorable),
            # ACCUMULATE into an f32 carry (never provably constant), and
            # feed it back at 1e-30 scale (representable in bf16, perturbs
            # inputs by ~1e-30 — harmless for timing, opaque to the
            # simplifier).
            tot = sum(
                jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
                for leaf in jax.tree_util.tree_leaves(out)
                if hasattr(leaf, "astype")
            )
            return carry + tot * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    return lambda n: run(jnp.int32(n), *args)


def _make_threaded_runner(fn, args, thread_idx):
    arg_pos = [p for p, _ in thread_idx]
    out_pos = [o for _, o in thread_idx]

    @jax.jit
    def run(n, *flat):
        def body(_i, carry):
            threaded, acc = carry
            call = list(flat)
            for i, p in enumerate(arg_pos):
                call[p] = threaded[i]
            out = fn(*call)
            outs = out if isinstance(out, (tuple, list)) else (out,)
            new_threaded = tuple(outs[o] for o in out_pos)
            # cheap probe: one lane-width slice per threaded output keeps
            # the final carry data-dependent on the last iteration without
            # re-reading the whole state
            probe = sum(
                jnp.sum(jnp.abs(t.reshape(-1)[:128].astype(jnp.float32)))
                for t in new_threaded
            )
            return new_threaded, acc + probe * 1e-9

        init = tuple(flat[p] for p in arg_pos)
        _, acc = jax.lax.fori_loop(0, n, body, (init, jnp.zeros((), jnp.float32)))
        return acc

    return lambda n: run(jnp.int32(n), *args)


def device_time_us(
    fn: Callable, *args, iters: int = 20, repeats: int = 6, warmup: int = 2,
    max_iters: int = 8192, time_budget_s: float = 1.0, thread_idx=(),
) -> float:
    """Average device time per call of fn(*args), in microseconds.

    A fixed chain length drowns microsecond ops in the dispatch floor, so
    the chain length doubles until either (a) the doubled chain costs at
    least 1.8x the single one — the marginal per-call cost clearly
    dominates the floor — or (b) the chain itself exceeds ``time_budget_s``
    (at which point the floor is <3% of the measurement anyway).
    """
    runner = _make_runner(fn, args, thread_idx)

    def best(n):
        # Sync via a host fetch of the scalar carry (see device_sync on why
        # block_until_ready is not a barrier here). The fetch RTT is fixed
        # and cancels in the two-length difference.
        for _ in range(warmup):
            np.asarray(runner(n))
        t_best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(runner(n))
            t_best = min(t_best, time.perf_counter() - t0)
        return t_best

    n = max(1, iters)
    per_call = 0.0
    while True:
        t_n = best(n)
        t_2n = best(2 * n)
        per_call = (t_2n - t_n) / n
        if per_call > 0 and (t_2n >= 1.8 * t_n or t_n > time_budget_s):
            break
        if 2 * n >= max_iters:
            break
        n *= 2
    return max(per_call * 1e6, 1e-3)


def profiled_time_us(
    fn: Callable, *args, iters: int = 8, kernels=None, match: str = "any",
    reduction: str = "span",
) -> float:
    """Per-call time attributed to profiler kernel spans, in microseconds.

    Wires the perf API's ``profile(kernels=..., match=..., reduction=...)``
    spec (api.py ProfileSpec) the way the reference attributes op latency
    to named kernel spans (reference benchmark/xpu_adapter.py:339-373):
    run ``iters`` eager calls under ``jax.profiler.trace``, parse the
    exported Chrome-trace events, keep complete ('ph' == 'X') events whose
    name matches any/all of the ``kernels`` fnmatch patterns, and reduce:

      - ``reduction='sum'``: total matched kernel time / iters
      - ``reduction='span'``: (last matched end - first matched start) / iters
        (includes gaps between the matched kernels — the reference's
        span-of-spans semantics)

    Returns -1.0 when the platform produced no matching events (e.g. a
    remote-tunneled device with no local device trace) — callers fall
    back to ``device_time_us``.
    """
    import fnmatch
    import glob
    import gzip
    import json
    import shutil
    import tempfile

    # one jitted executable: an eager op call dispatches dozens of tiny
    # per-primitive executables whose spans are unattributable (measured:
    # the store op eager trace is all PjitFunction(less/add/...) host
    # spans); jitted, the trace shows the real fused kernel spans
    jfn = jax.jit(fn)
    out = jfn(*args)
    device_sync(out)
    tmp = tempfile.mkdtemp(prefix="mojo_prof_")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(iters):
                device_sync(jfn(*args))
        traces = glob.glob(tmp + "/**/*.trace.json.gz", recursive=True)
        if not traces:
            return -1.0
        events = []
        for path in traces:
            with gzip.open(path, "rt") as f:
                events.extend(json.load(f).get("traceEvents", []))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    pats = list(kernels) if kernels else ["*"]

    def matches(name: str) -> bool:
        if name.startswith("$"):  # python source spans, never kernels
            return False
        hits = [fnmatch.fnmatch(name, p) for p in pats]
        return all(hits) if match == "all" else any(hits)

    spans = [
        (e["ts"], e["ts"] + e["dur"], e["dur"])
        for e in events
        if e.get("ph") == "X" and "dur" in e and matches(e.get("name", ""))
    ]
    if not spans:
        return -1.0
    if reduction == "sum":
        total = sum(d for _, _, d in spans)
    else:  # span-of-spans
        total = max(e for _, e, _ in spans) - min(s for s, _, _ in spans)
    return max(float(total) / iters, 1e-3)
