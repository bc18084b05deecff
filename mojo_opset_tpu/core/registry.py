"""Per-op backend-tier registry.

Capability parity with reference mojo_opset/core/backend_registry.py:36-129:
name-prefix parsing, platform gating via ``supported_platforms_list``,
priority sort per platform, fallback to the highest-priority registered
implementation.  Re-designed for the TPU tiers ``ref`` / ``xla`` / ``pallas``
(see mojo_opset_tpu/utils/platform.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Type

from mojo_opset_tpu.utils.logging import get_logger
from mojo_opset_tpu.utils.platform import ALL_TIERS, get_backend_priority, get_platform

logger = get_logger(__name__)


class BackendNotAvailable(NotImplementedError):
    """Raised when a specific backend tier is requested but not registered.

    Accuracy tests catch this to auto-skip, mirroring the reference's
    ``BackendNotImplementedForTest`` pattern (tests/accuracy/conftest.py:104).
    """


def _normalize_backend_name(backend_name: Optional[str]) -> Optional[str]:
    if backend_name is None:
        return None
    return backend_name.strip().lower()


class MojoBackendRegistry:
    def __init__(self, core_op_cls: type):
        assert core_op_cls.__name__.startswith("Mojo"), (
            f"Core op {core_op_cls.__name__} must be named Mojo<OpName>."
        )
        self._core_op_cls = core_op_cls
        self._operator_name = core_op_cls.__name__[4:]
        self._registry: Dict[str, type] = {}

    def get_core_op_cls(self) -> type:
        return self._core_op_cls

    @property
    def operator_name(self) -> str:
        return self._operator_name

    def register(self, cls: type) -> None:
        idx = cls.__name__.find(self._operator_name)
        assert idx != -1, (
            f"Implementation {cls.__name__} of {self._core_op_cls.__name__} must "
            f"contain {self._operator_name} in its class name."
        )
        tier = _normalize_backend_name(cls.__name__[:idx])
        assert tier != "mojo", "should not register the core class itself"

        if tier not in ALL_TIERS:
            raise NameError(
                f"Implementation {cls.__name__} tier [{tier}] is unknown; "
                f"expected one of {ALL_TIERS} as the class-name prefix."
            )

        platform = get_platform()
        supported = getattr(cls, "supported_platforms_list", ("tpu", "gpu", "cpu"))
        if platform not in supported:
            logger.debug("%s is not supported on platform %s; skipping.", cls.__name__, platform)
            return

        if tier in self._registry:
            raise ValueError(
                f"{self._core_op_cls.__name__} tier [{tier}] has already been registered "
                f"({self._registry[tier].__name__})."
            )
        self._registry[tier] = cls
        cls._backend = tier
        self._sort()

    def get(self, backend_name: Optional[str] = None, *, strict: bool = False) -> type:
        backend_name = _normalize_backend_name(backend_name)
        if backend_name is None or backend_name not in self._registry:
            if strict and backend_name is not None:
                raise BackendNotAvailable(
                    f"{self._operator_name} backend {backend_name!r} is not registered; "
                    f"available: {list(self._registry)}"
                )
            assert self._registry, f"{self._operator_name} has no registered backend."
            # resolve priority at CALL time: the platform can change after
            # import (e.g. a TPU process re-pointing at a virtual CPU mesh)
            priority = get_backend_priority()
            # an impl may opt out of default dispatch (dispatch_default =
            # False) while staying reachable by explicit tier name — used
            # by training-function kernels that measured SLOWER than XLA
            # autodiff on chip (r5; see docs/kernels.md "Training tier")
            candidates = {
                t: c for t, c in self._registry.items()
                if getattr(c, "dispatch_default", True)
            } or self._registry
            fallback = min(
                candidates.items(),
                key=lambda it: priority.index(it[0]) if it[0] in priority else len(priority),
            )[1]
            if backend_name is not None:
                logger.debug(
                    "Backend %r not registered for %s; falling back to %s.",
                    backend_name,
                    self._operator_name,
                    fallback.__name__,
                )
            return fallback
        return self._registry[backend_name]

    def registered_backends(self) -> tuple[str, ...]:
        return tuple(self._registry)

    def _sort(self) -> None:
        priority = get_backend_priority()

        def _prio_key(item):
            name = item[0]
            return priority.index(name) if name in priority else len(priority)

        self._registry = dict(sorted(self._registry.items(), key=_prio_key))
