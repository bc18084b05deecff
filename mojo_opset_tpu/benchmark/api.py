"""Per-op benchmark spec API.

Parity: reference mojo_opset/benchmark/api.py:44-465 (docs/bench_guide.md):
``perf_case`` (smoke/full tags), ``@mojo_perf(name, target, cases,
providers, profiling)`` decorator, ``PerfWorkload`` (input/output
TensorSpecs, op_kwargs, state binding, flops, forward_args for bwd),
``perf_provider`` with a ``supports`` predicate, ``profile`` kernel
selection, and ``discover_perf_specs``.

TPU notes: timing uses the scan-chained on-device timer
(benchmark/timing.py); providers are the backend tiers (ref/xla/pallas).
"""

from __future__ import annotations

import importlib
import pkgutil
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class PerfCase:
    id: str
    params: Mapping[str, Any]
    tags: Tuple[str, ...] = ()


def perf_case(case_id: str, *, tags: Sequence[str] = (), **params: Any) -> PerfCase:
    return PerfCase(id=case_id, params=dict(params), tags=tuple(tags))


@dataclass(frozen=True)
class TensorSpec:
    shape: Tuple[int, ...]
    dtype: Any
    creator: Optional[Callable] = None

    def __post_init__(self):
        object.__setattr__(self, "shape", tuple(int(d) for d in self.shape))
        if any(d < 0 for d in self.shape):
            raise ValueError(f"tensor shape must be non-negative, got {self.shape}")

    def build(self, key, index: int):
        if self.creator is not None:
            return self.creator(self)
        dt = jnp.dtype(self.dtype)
        if dt == jnp.int32 or dt == jnp.int8:
            rng = np.random.default_rng(index)
            hi = 127 if dt == jnp.int8 else 1000
            return jnp.asarray(rng.integers(0, hi, self.shape), dt)
        return jax.random.normal(jax.random.PRNGKey(index), self.shape).astype(dt)


def tensor(shape: Sequence[int], dtype, *, creator: Optional[Callable] = None) -> TensorSpec:
    return TensorSpec(shape=tuple(shape), dtype=dtype, creator=creator)


@dataclass(frozen=True)
class LiteralArg:
    value: Any


def literal(value: Any) -> LiteralArg:
    return LiteralArg(value)


@dataclass(frozen=True)
class PerfWorkload:
    """Provider-independent op construction + invocation description.

    String values in ``args``/``kwargs`` reference input tensors by name;
    ``state`` binds tensors onto op attributes (weights); ``flops`` feeds
    the throughput column.
    """

    inputs: Mapping[str, TensorSpec]
    outputs: Mapping[str, TensorSpec] = field(default_factory=dict)
    op_kwargs: Mapping[str, Any] = field(default_factory=dict)
    state: Mapping[str, str] = field(default_factory=dict)
    forward_args: Optional[Tuple[Any, ...]] = None
    args: Optional[Tuple[Any, ...]] = None
    kwargs: Mapping[str, Any] = field(default_factory=dict)
    flops: int = 0
    read_bytes: Optional[float] = None
    write_bytes: Optional[float] = None
    run: Optional[Callable] = None
    # {arg_name: output_position}: thread these outputs back into the
    # named args across timing-chain iterations, so state-mutating ops
    # (KV-cache stores) alias their buffers in the compiled loop instead
    # of full-copying the state every call.
    thread: Mapping[str, int] = field(default_factory=dict)

    def __post_init__(self):
        if self.args is None:
            omitted = set(self.state.values()) | {
                v for v in self.kwargs.values() if isinstance(v, str)
            }
            object.__setattr__(
                self, "args", tuple(n for n in self.inputs if n not in omitted)
            )
        refs = {v for v in (*self.args, *self.kwargs.values()) if isinstance(v, str)}
        refs |= set(self.state.values())
        missing = refs - set(self.inputs)
        if missing:
            raise ValueError(f"workload references undefined input tensors: {sorted(missing)}")


@dataclass(frozen=True)
class ProfileSpec:
    timing: str = "device"
    kernels: Optional[Tuple[str, ...]] = None
    match: str = "any"
    reduction: str = "span"


def profile(timing: str = "device", kernels=None, match="any", reduction="span") -> ProfileSpec:
    return ProfileSpec(timing, tuple(kernels) if kernels else None, match, reduction)


@dataclass(frozen=True)
class PerfProvider:
    name: str
    supports: Optional[Callable[[PerfCase], bool]] = None


def perf_provider(name: str, supports: Optional[Callable] = None) -> PerfProvider:
    return PerfProvider(name, supports)


@dataclass
class PerfSpec:
    name: str
    target: Any  # Mojo core op class
    cases: Tuple[PerfCase, ...]
    providers: Tuple[PerfProvider, ...]
    workload_fn: Callable[[PerfCase], PerfWorkload]
    profiling: ProfileSpec = field(default_factory=ProfileSpec)


PERF_REGISTRY: Dict[str, PerfSpec] = {}

DEFAULT_PROVIDERS = (perf_provider("ref"), perf_provider("xla"), perf_provider("pallas"))


def mojo_perf(
    name: str,
    target,
    cases: Sequence[PerfCase],
    providers: Sequence[PerfProvider] = DEFAULT_PROVIDERS,
    profiling: ProfileSpec = ProfileSpec(),
):
    """Register a perf spec; the decorated fn maps a case -> PerfWorkload."""

    def deco(fn):
        PERF_REGISTRY[name] = PerfSpec(
            name=name, target=target, cases=tuple(cases),
            providers=tuple(providers), workload_fn=fn, profiling=profiling,
        )
        return fn

    return deco


def discover_perf_specs(package: str = "tests.perf_new") -> Dict[str, PerfSpec]:
    """Import every module under the descriptor package so @mojo_perf
    registration side effects run (reference api.py:434)."""
    pkg = importlib.import_module(package)
    for mod in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        importlib.import_module(mod.name)
    return PERF_REGISTRY
