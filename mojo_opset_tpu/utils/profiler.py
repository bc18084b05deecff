"""Device profiler hooks.

Parity: reference mojo_opset/utils/profiler.py:11-93
(create_npu_profiler / NPUProfilerHook with step scheduling, trace +
memory export, wired into the generator loop).  TPU-native backend is
``jax.profiler`` (TensorBoard/Perfetto traces).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from mojo_opset_tpu.runtime.generation import GeneratorHook
from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def create_tpu_profiler(log_dir: str = "mojo_profile"):
    """Start/stop wrapper over jax.profiler; returns the hook class to
    attach to a generator."""
    return TPUProfilerHook(log_dir)


class TPUProfilerHook(GeneratorHook):
    """Profile a window of decode steps: trace starts after ``wait``
    steps and captures ``active`` steps (reference step scheduling,
    profiler.py:24-52)."""

    def __init__(self, log_dir: str = "mojo_profile", wait: int = 2, active: int = 3):
        self.log_dir = log_dir
        self.wait = wait
        self.active = active
        self._step = 0
        self._running = False

    def before_prefill(self, **kwargs):
        self._step = 0

    def after_decode_step(self, *, step, logits, next_token_id):
        self._step += 1
        if self._step == self.wait and not self._running:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._running = True
            logger.info("TPU profiler trace started -> %s", self.log_dir)
        elif self._running and self._step >= self.wait + self.active:
            # block_until_ready is NOT a reliable barrier on the tunneled
            # TPU platform (see benchmark/timing.py device_sync) — a host
            # fetch forces the profiled steps to actually finish
            from mojo_opset_tpu.benchmark.timing import device_sync

            device_sync(logits)
            jax.profiler.stop_trace()
            self._running = False
            logger.info("TPU profiler trace saved -> %s", self.log_dir)

    def after_decode(self, **kwargs):
        if self._running:
            jax.profiler.stop_trace()
            self._running = False


def trace_annotation(name: str):
    """Named span visible in device traces (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
