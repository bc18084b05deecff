"""Parallel styles: module-level TP/EP/DP plans.

Parity: reference mojo_opset/distributed/parallel/
(tensor_parallel.py:17-104 MojoTensorParallel/Colwise/Rowwise,
partitions.py:26-177 weight partitioning incl. GQA-aware QKV split and
SwiGLU gate/up interleaved split, expert_parallel.py:20-149
MojoExpertParallel, data_parallel.py:15-109 MojoDataParallel,
mojo_parallel.py:147-272 MojoDistributedModule + mojo_parallelize_module).

TPU-native re-design: a style resolves to PartitionSpecs applied as
``NamedSharding`` on the matched module's array leaves (GSPMD inserts the
collectives that DTensor ``redistribute`` performed explicitly); the
wrapped module is returned functionally (pytree update), not mutated.
``MojoQKVColwiseParallel`` reproduces the reference's KV-head replication
when the TP degree exceeds ``num_kv_heads`` by leaving the KV projections
replicated (GSPMD handles partial head sharding poorly — replication is
the safe contract) and ``MojoSwiGLUParallel`` keeps the fused fc1
gate/up halves aligned per shard by sharding each half independently.
"""

from __future__ import annotations

import fnmatch
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _put(leaf, mesh, spec):
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        size = mesh.shape[axis]
        if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
            logger.warning(
                "parallel style: leaf shape %s not divisible by %d on axis %r; replicating",
                leaf.shape, size, axis,
            )
            return jax.device_put(leaf, NamedSharding(mesh, P()))
    return jax.device_put(leaf, NamedSharding(mesh, spec))


class MojoParallelStyle:
    """Base: subclass provides spec_for(attr_name, leaf)."""

    axis: str = "tp"

    def __init__(self, axis: Optional[str] = None):
        if axis is not None:
            self.axis = axis

    def spec_for(self, name: str, leaf, mesh: Mesh) -> P:
        raise NotImplementedError

    def apply(self, module, mesh: Mesh):
        flat, treedef = jax.tree_util.tree_flatten_with_path(module)
        new_leaves = []
        for path, leaf in flat:
            name = jax.tree_util.keystr(path)
            new_leaves.append(_put(leaf, mesh, self.spec_for(name, leaf, mesh)))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)


class MojoColwiseParallel(MojoParallelStyle):
    """Column-parallel linear: weight (out, in) shards on out; bias shards."""

    def spec_for(self, name, leaf, mesh):
        if name.endswith(".weight") and leaf.ndim == 2:
            return P(self.axis, None)
        if name.endswith(".bias") and leaf.ndim == 1:
            return P(self.axis)
        return P()


class MojoRowwiseParallel(MojoParallelStyle):
    """Row-parallel linear: weight (out, in) shards on in; bias replicated."""

    def spec_for(self, name, leaf, mesh):
        if name.endswith(".weight") and leaf.ndim == 2:
            return P(None, self.axis)
        return P()


class MojoQKVColwiseParallel(MojoParallelStyle):
    """Fused/separate QKV projections, GQA-aware.

    Q shards by heads; K/V shard by kv-heads when ``tp <= num_kv_heads``,
    otherwise stay replicated (the reference replicates KV heads when
    ``size > num_kv_heads``, partitions.py:123-177)."""

    def __init__(self, num_heads: int, num_kv_heads: int, axis: Optional[str] = None):
        super().__init__(axis)
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads

    def spec_for(self, name, leaf, mesh):
        tp = mesh.shape[self.axis]
        shard_kv = tp <= self.num_kv_heads and self.num_kv_heads % tp == 0
        if "q_proj" in name and name.endswith(".weight"):
            return P(self.axis, None)
        if "q_proj" in name and name.endswith(".bias"):
            return P(self.axis)
        if any(k in name for k in ("k_proj", "v_proj")) and shard_kv:
            if name.endswith(".weight"):
                return P(self.axis, None)
            if name.endswith(".bias"):
                return P(self.axis)
        return P()

class MojoSwiGLUParallel(MojoParallelStyle):
    """Fused SwiGLU fc1 (2*I, H) colwise + fc2 rowwise.

    The reference physically interleaves gate/up rows so each shard's
    LOCAL chunk() stays aligned (partitions.py:92-120) — a DTensor
    local-view trick. Under GSPMD that permutation would CHANGE the
    logical array (device_put shards the permuted value) and corrupt the
    model's split(); plain specs are both correct and sufficient — XLA
    reshards the logical halves as needed."""

    def spec_for(self, name, leaf, mesh):
        if "fc1" in name and name.endswith(".weight") and leaf.ndim == 2:
            return P(self.axis, None)
        if "fc2" in name and name.endswith(".weight") and leaf.ndim == 2:
            return P(None, self.axis)
        return P()


class MojoTensorParallel(MojoParallelStyle):
    """Generic Megatron pairing inside an attention/MLP block:
    colwise for q/k/v/gate/up, rowwise for o/down."""

    COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "fc1")
    ROW = ("o_proj", "down_proj", "fc2")

    def spec_for(self, name, leaf, mesh):
        if leaf.ndim == 2 and name.endswith(".weight"):
            if any(k in name for k in self.COL):
                return P(self.axis, None)
            if any(k in name for k in self.ROW):
                return P(None, self.axis)
        if leaf.ndim == 1 and name.endswith(".bias") and any(k in name for k in self.COL):
            return P(self.axis)
        return P()


class MojoDataParallel(MojoParallelStyle):
    """Pure input/output resharding — no weight partitioning (reference
    data_parallel.py:15-109); weights replicate."""

    axis = "dp"

    def spec_for(self, name, leaf, mesh):
        return P()


class MojoExpertParallel(MojoParallelStyle):
    """Expert-major tensors shard on dim 0 — weights, quant scales and
    smooth scales included (reference expert_parallel.py:66-126)."""

    axis = "ep"

    EXPERT_MAJOR = (
        "up_proj_weight", "down_proj_weight", "up_proj_weight_scale",
        "down_proj_weight_scale", "inv_smooth_scale",
    )

    def spec_for(self, name, leaf, mesh):
        if any(k in name for k in self.EXPERT_MAJOR) and leaf.ndim >= 2:
            return P(*([self.axis] + [None] * (leaf.ndim - 1)))
        return P()


class MojoRegisterableParallelStyle(MojoParallelStyle):
    """ParallelStyle with a per-module-class dist-info registry.

    Parity: reference mojo_parallel.py:33-144 — ``register_dist_info``
    associates a module class with (partition_fn, prepare_input_fn,
    prepare_output_fn, desired input/output layouts).  TPU re-design: the
    partition_fn returns a resharded module pytree; prepare_* fns wrap the
    call with ``jax.lax.with_sharding_constraint`` using the desired
    layouts (GSPMD inserts the collectives DTensor ``redistribute`` ran
    explicitly).  Each subclass gets its own independent registry, exactly
    as the reference's ``__init_subclass__`` reset does.
    """

    dist_info_map: Dict[type, tuple] = {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        cls.dist_info_map = {}

    @classmethod
    def register_dist_info(
        cls,
        module_clses,
        partition_fn=None,
        prepare_input_fn=None,
        prepare_output_fn=None,
        desired_input_layouts=None,
        desired_output_layouts=None,
    ):
        if not isinstance(module_clses, tuple):
            module_clses = (module_clses,)
        for module_cls in module_clses:
            cls.dist_info_map[module_cls] = (
                partition_fn,
                prepare_input_fn,
                prepare_output_fn,
                desired_input_layouts,
                desired_output_layouts,
            )

    @classmethod
    def get_dist_info(cls, module_cls):
        for klass in module_cls.__mro__:
            if klass in cls.dist_info_map:
                return cls.dist_info_map[klass]
        return None

    def apply(self, module, mesh: Mesh):
        info = self.get_dist_info(type(module))
        if info is None:
            return super().apply(module, mesh)
        partition_fn = info[0]
        sharded = partition_fn(module, mesh) if partition_fn is not None else module
        return _DistInfoWrapped(sharded, mesh, info)


class _DistInfoWrapped:
    """Callable wrapper applying registered prepare_input/output fns
    around a module's forward (reference MojoDistributedModule.forward,
    mojo_parallel.py:179-206)."""

    def __init__(self, module, mesh, info):
        self._mod = module
        self._mesh = mesh
        (_, self._prep_in, self._prep_out,
         self._in_layouts, self._out_layouts) = info

    def _constrain(self, value, layouts):
        if layouts is None:
            return value
        return jax.lax.with_sharding_constraint(
            value, NamedSharding(self._mesh, layouts))

    def __call__(self, *args, **kwargs):
        if self._prep_in is not None:
            args, kwargs = self._prep_in(self._mesh, args, kwargs)
        elif self._in_layouts is not None and args:
            args = (self._constrain(args[0], self._in_layouts),) + args[1:]
        out = self._mod(*args, **kwargs)
        if self._prep_out is not None:
            return self._prep_out(self._mesh, out)
        if self._out_layouts is not None:
            return self._constrain(out, self._out_layouts)
        return out


class MojoDistributedModule:
    """Thin marker wrapper tracking managed params (reference
    mojo_parallel.py:147-206).  With GSPMD the forward needs no hooks —
    the module itself is returned sharded; this wrapper only records
    which leaves a style manages, for checkpoint tooling."""

    def __init__(self, module, style: MojoParallelStyle):
        self._mod = module
        self._style = style
        self._managed_params = [
            jax.tree_util.keystr(p)
            for p, leaf in jax.tree_util.tree_flatten_with_path(module)[0]
        ]

    def __call__(self, *args, **kwargs):
        return self._mod(*args, **kwargs)

    def get_unmanaged_params(self, model) -> list:
        # managed paths are SUBMODULE-relative; model paths are full —
        # suffix-match instead of exact set membership
        managed = tuple(self._managed_params)
        return [
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(model)[0]
            if not any(jax.tree_util.keystr(p).endswith(m) for m in managed)
        ]


def mojo_parallelize_module(model, mesh: Mesh, plan: Dict[str, MojoParallelStyle]):
    """Apply a {fnmatch-path: style} plan over a model pytree.

    Returns a new model whose matched sub-modules carry the style's
    NamedShardings; unmatched leaves are replicated on the mesh.
    Reference mojo_parallel.py:209-272 (set_submodule replacement becomes
    a functional pytree rebuild).
    """
    from mojo_opset_tpu.parallel.plans import _path_str

    flat, treedef = jax.tree_util.tree_flatten_with_path(model)
    new_leaves = []
    for path, leaf in flat:
        # _path_str handles list indices correctly ("layers.0.self_attn…");
        # the previous hand-rolled replace chain left "[0" fragments that
        # made numeric-index patterns never match
        norm = _path_str(path)
        spec = P()
        for pattern, style in plan.items():
            # match the pattern against any prefix of the path
            if fnmatch.fnmatch(norm, f"*{pattern}*"):
                try:
                    spec = style.spec_for(norm, leaf, mesh)
                except NotImplementedError:
                    # apply()-based styles (registerable dist-info wrappers)
                    # carry no leaf-wise spec; replicate and warn
                    logger.warning(
                        "mojo_parallelize_module: style %s has no spec_for; "
                        "replicating %s (use style.apply on the submodule)",
                        type(style).__name__, norm,
                    )
                    spec = P()
                break
        new_leaves.append(_put(leaf, mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
