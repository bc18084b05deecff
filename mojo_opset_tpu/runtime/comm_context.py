"""Communication context: comm-fused op cache + symmetric-memory analogue.

Parity: reference mojo_opset/runtime/comm_context.py:16-233
(MojoSymmetricMemoryManager :16-194 — aclshmem/xops peer buffers for
Triton comm-compute fusion; MojoComputeCommContext :197-233 — per-op cache
of comm-fused op instances + workspace tensors).

TPU-native: ICI collectives inside shard_map need no user-level symmetric
memory — XLA owns the transport buffers — so the manager here only tracks
logical "teams" (mesh axes) and satisfies the ``estimate_shmem_size_mb``
contract; the compute-comm context caches constructed fused ops keyed by
(op class, weight id, axis) exactly like the reference.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax

from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class MojoSymmetricMemoryManager:
    """Axis-scoped singleton registry (the aclshmem-team analogue).

    On TPU the ICI fabric is managed by XLA: `alloc` returns a plain
    device buffer and `team_split` returns the mesh-axis name — kept so
    code written against the reference API ports over unchanged.
    """

    _instances: Dict[str, "MojoSymmetricMemoryManager"] = {}

    def __init__(self, axis_name: Optional[str] = None, size_mb: int = 20):
        self.axis_name = axis_name
        self.size_mb = size_mb

    @classmethod
    def get(cls, axis_name: Optional[str] = None, size_mb: int = 20):
        key = axis_name or "<world>"
        if key not in cls._instances:
            cls._instances[key] = cls(axis_name, size_mb)
        return cls._instances[key]

    def create_tensor(self, shape, dtype):
        import jax.numpy as jnp

        return jnp.zeros(shape, dtype)

    def team_split_strided(self, stride: int):
        logger.debug("team_split_strided(%d): ICI sub-axes come from the Mesh shape", stride)
        return self.axis_name


class MojoComputeCommContext:
    """Cache of comm-fused op instances + workspaces per (op, weight, axis)."""

    def __init__(self, axis_name: Optional[str] = None):
        self.axis_name = axis_name
        self._ops: Dict[Tuple, object] = {}
        self._workspaces: Dict[Tuple, jax.Array] = {}
        self.shmem = MojoSymmetricMemoryManager.get(axis_name)

    def get_op(self, op_cls, weight, **kwargs):
        # arrays (weight scales, biases) are unhashable: key them by identity
        def _k(v):
            return ("id", id(v)) if hasattr(v, "shape") else v

        key = (op_cls.__name__, id(weight),
               tuple(sorted((name, _k(v)) for name, v in kwargs.items())))
        if key not in self._ops:
            self._ops[key] = op_cls(weight, axis_name=self.axis_name, **kwargs)
        return self._ops[key]

    def get_workspace(self, name: str, shape, dtype):
        import jax.numpy as jnp

        key = (name, tuple(shape), str(dtype))
        if key not in self._workspaces:
            self._workspaces[key] = jnp.zeros(shape, dtype)
        return self._workspaces[key]
