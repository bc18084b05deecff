"""Compiled-step cache: the device-graph capture/replay analogue.

Parity: reference mojo_opset/compile/device_graph.py:8-105
(DeviceGraphRunner/DeviceGraphPool over xpu_graph).  On TPU, ``jax.jit``
already gives captured device graphs (XLA executables); the pool maps to a
cache of jitted step functions keyed by batch size / bucketed token count,
with KV caches donated so decode updates are in-place.  ``warmup`` mirrors
the reference's warmup-then-capture flow (device_graph.py:30-45): it runs
one step to trigger compilation before timed execution.
"""

from __future__ import annotations

from typing import Callable, Dict, Hashable

import jax

from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class CompiledStepPool:
    """Cache of jitted step executables keyed by shape signature.

    The reference invalidates runners when the session changes
    (device_graph.py:76-105); here the cache key includes the cache-pytree
    structure, so a new session with a different shape recompiles while an
    unchanged one replays the cached executable.
    """

    def __init__(self, step_fn: Callable, donate_argnums=(0,), static_argnums=()):
        self._step_fn = step_fn
        self._donate = donate_argnums
        self._static = tuple(static_argnums)
        self._pool: Dict[Hashable, Callable] = {}

    def signature(self, *args) -> Hashable:
        sig = []
        for i, a in enumerate(args):
            if i in self._static:
                sig.append(("static", a))
                continue
            leaves, treedef = jax.tree_util.tree_flatten(a)
            sig.append((
                str(treedef),  # session/pytree structure is part of the key
                tuple((tuple(l.shape), str(l.dtype)) for l in leaves if hasattr(l, "shape")),
            ))
        return tuple(sig)

    def get_runner(self, *args) -> Callable:
        key = self.signature(*args)
        if key not in self._pool:
            logger.debug("CompiledStepPool: compiling new executable for signature %s", key)
            self._pool[key] = jax.jit(
                self._step_fn, donate_argnums=self._donate, static_argnums=self._static
            )
        return self._pool[key]

    def warmup(self, *args, **kwargs):
        runner = self.get_runner(*args)
        out = runner(*args, **kwargs)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        return runner

    def clear(self):
        self._pool.clear()


def round_up_bucket(n: int, buckets=(16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)) -> int:
    """Pad a dynamic token count to a fixed bucket so jit recompiles only
    once per bucket (paged attention under jit — SURVEY hard-part #1)."""
    for b in buckets:
        if n <= b:
            return b
    return -(-n // buckets[-1]) * buckets[-1]
