"""MojoOperator: dispatching pytree op base.

Capability parity with reference mojo_opset/core/operator.py:18-134:
  * ``__init_subclass__`` attaches a per-core-op registry and auto-creates
    the golden fallback class (here ``Ref<Name>``, the jax.numpy golden —
    the analogue of the auto-generated ``Torch<Name>`` at operator.py:34);
  * ``__new__`` dispatches construction of the core class to the
    implementation tier selected by ``MOJO_BACKEND`` (operator.py:38-51);
  * ``forward_diff_with`` built-in golden comparison (operator.py:81-129).

Re-designed for JAX: ops are pytree modules (see core/module.py) whose
``__call__`` is pure — params live on the instance as pytree leaves, so an
op can cross ``jax.jit`` boundaries; inputs that the reference mutates
in-place (KV caches) are returned functionally instead and become true
in-place updates under jit via buffer donation.

``dispatch_root=True`` marks an abstract root (``MojoOperator`` itself and
``MojoFunction``): direct subclasses of a root are *core ops* that get a
registry; deeper subclasses are tier implementations that auto-register.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from mojo_opset_tpu.core.module import Module
from mojo_opset_tpu.core.registry import MojoBackendRegistry
from mojo_opset_tpu.utils.acc import check_tol_diff
from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_DEBUG_HOOKS: list = []  # populated by utils/debugger.py when enabled


class MojoOperator(Module):
    supported_platforms_list = ("tpu", "gpu", "cpu")
    _backend: Optional[str] = None
    _registry: Optional[MojoBackendRegistry] = None
    _dispatch_root: type = None  # set below, after class creation

    def __init_subclass__(cls, dispatch_root: bool = False, **kwargs):
        kwargs.pop("default_priority", None)
        super().__init_subclass__(**kwargs)

        if dispatch_root:
            cls._dispatch_root = cls
            return

        is_core_op_cls = cls._dispatch_root in cls.__bases__
        if is_core_op_cls:
            cls._registry = MojoBackendRegistry(cls)
            # Auto-generate the golden 'ref' tier from the core class's own
            # forward (the torch-fallback trick, reference operator.py:34).
            type("Ref" + cls._registry.operator_name, (cls,), {"__module__": cls.__module__})
        else:
            if cls._registry is None:
                raise TypeError(
                    f"{cls.__name__} subclasses a non-core op; implementation tiers must "
                    f"directly subclass the Mojo core op class."
                )
            cls._registry.register(cls)

    def __new__(cls, *args, **kwargs):
        is_core_op_cls = cls._dispatch_root in cls.__bases__
        if is_core_op_cls:
            if cls._registry is None:
                raise NotImplementedError(
                    f"No {cls.__name__} implementation found, please register at least one."
                )
            target_backend = os.environ.get("MOJO_BACKEND")
            target_class = cls._registry.get(target_backend)
            return target_class.__new__(target_class, *args, **kwargs)
        return super().__new__(cls)

    # -- registry access (reference operator.py:53-70) ----------------
    @classmethod
    def get_registry(cls) -> MojoBackendRegistry:
        if cls._registry is None:
            raise NotImplementedError(f"No {cls.__name__} implementation found.")
        return cls._registry

    @classmethod
    def get_backend_impl(cls, backend_name: Optional[str] = None, *, strict: bool = False):
        return cls.get_registry().get(backend_name, strict=strict)

    @classmethod
    def get_registered_backends(cls) -> tuple[str, ...]:
        return cls.get_registry().registered_backends()

    # ------------------------------------------------------------------
    def __init__(self, **kwargs):
        # dtype for parameter/buffer creation, analogous to the reference's
        # tensor factory kwargs (core/operator.py:75).
        self.param_dtype = kwargs.pop("dtype", None)
        if kwargs:
            raise TypeError(f"Unexpected kwargs for {type(self).__name__}: {list(kwargs)}")

    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        if _DEBUG_HOOKS:
            for hook in tuple(_DEBUG_HOOKS):
                out = hook(self, args, kwargs)
                if out is not NotImplemented:
                    return out
        return self.forward(*args, **kwargs)

    def forward_diff_with(
        self,
        other_op: "MojoOperator",
        *args,
        atol: float = 1e-2,
        rtol: float = 1e-2,
        ptol: float = 1.0,
        random_seed: int = 42,
        mixed_tol: bool = False,
        **kwargs,
    ):
        """Run this op and ``other_op`` on the same inputs and compare.

        Mirrors reference core/operator.py:81-129.  JAX arrays are
        immutable, so no defensive clone is needed; ops that consume PRNG
        randomness take an explicit ``key`` argument, which both sides
        receive identically (derived from ``random_seed`` when the caller
        does not pass one).
        """
        if type(self) is type(other_op):
            raise NotImplementedError(
                f"No dedicated backend for {type(self).__name__}; both operands resolve "
                f"to the same implementation, skipping comparison."
            )

        if self._takes_key() and "key" not in kwargs:
            kwargs = dict(kwargs, key=jax.random.PRNGKey(random_seed))

        norm_result = self(*args, **kwargs)
        refs_result = other_op(*args, **kwargs)

        assert norm_result is not None, "forward should return a non-None value."
        assert refs_result is not None, "comparison operator should return a non-None value."

        check_tol_diff(norm_result, refs_result, atol, rtol, ptol, mixed_tol)
        return norm_result

    def _takes_key(self) -> bool:
        import inspect

        try:
            return "key" in inspect.signature(type(self).forward).parameters
        except (TypeError, ValueError):
            return False

    def sync_weights_from(self, other: "MojoOperator") -> "MojoOperator":
        """Return a copy of self with array leaves taken from ``other``.

        The analogue of the debugger's shadow-instance ``load_state_dict``
        weight sync (reference utils/debugger.py:752+).
        """
        leaves = jax.tree_util.tree_leaves(other)
        treedef = jax.tree_util.tree_structure(self)
        return jax.tree_util.tree_unflatten(treedef, leaves)


MojoOperator._dispatch_root = MojoOperator
