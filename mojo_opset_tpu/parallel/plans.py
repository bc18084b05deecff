"""Sharding plans: path-pattern -> PartitionSpec rules over model pytrees.

Capability parity with the reference's ParallelStyle plan API
(``mojo_parallelize_module(model, mesh, {fnmatch_path: style})``,
reference distributed/parallel/mojo_parallel.py:209-272) re-designed for
GSPMD: a plan is a list of ``(path_pattern, PartitionSpec)`` rules applied
to the model's array leaves with ``NamedSharding``; XLA then inserts the
collectives that DTensor redistribute performed explicitly.  The explicit
collective path (shard_map ParallelStyles) lives in parallel/styles.py.
"""

from __future__ import annotations

import fnmatch
from typing import List, NamedTuple, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class ShardRule(NamedTuple):
    pattern: str  # fnmatch over the pytree key path, e.g. "*self_attn.q_proj.weight"
    spec: Tuple  # PartitionSpec entries


def _path_str(path) -> str:
    return jax.tree_util.keystr(path).replace("'", "").replace("]", "").replace("[", ".")


def shard_model(model, mesh: Mesh, rules: List[ShardRule], donate: bool = False):
    """Apply NamedShardings to all array leaves of a model pytree.

    Leaves matching a rule get its PartitionSpec; everything else is
    replicated.  Specs whose sharded axis does not divide the dimension
    fall back to replication (with a warning) so tiny test configs work.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(model)
    new_leaves = []
    for path, leaf in flat:
        pstr = _path_str(path)
        spec = P()
        for rule in rules:
            if fnmatch.fnmatch(pstr, rule.pattern):
                spec = P(*rule.spec)
                break
        if spec != P():
            ok = True
            if len(spec) > leaf.ndim:
                # an overlong spec with trailing Nones would slip past the
                # per-axis loop and crash device_put on low-rank leaves
                logger.warning(
                    "shard_model: %s rank %d < spec %s; replicating",
                    pstr, leaf.ndim, spec,
                )
                ok = False
            for dim, axis in enumerate(spec):
                if not ok:
                    break
                if axis is None:
                    continue
                axis_size = mesh.shape[axis] if not isinstance(axis, tuple) else int(
                    jax.numpy.prod(jax.numpy.asarray([mesh.shape[a] for a in axis]))
                )
                if dim >= leaf.ndim or leaf.shape[dim] % axis_size != 0:
                    logger.warning(
                        "shard_model: %s shape %s not divisible by %s on axis %r; replicating",
                        pstr, leaf.shape, axis_size, axis,
                    )
                    ok = False
                    break
            if not ok:
                spec = P()
        new_leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def qwen3_tp_rules(tp_axis: str = "tp") -> List[ShardRule]:
    """Megatron-style TP plan for Qwen3 (weights stored (out, in)):

    column-parallel (shard out dim): q/k/v_proj, gate/up_proj, embed/lm_head
    row-parallel (shard in dim): o_proj, down_proj
    Mirrors the reference's Colwise/Rowwise/QKV parallel styles
    (distributed/parallel/partitions.py:26-177).
    """
    return [
        ShardRule("*q_proj.weight", (tp_axis, None)),
        ShardRule("*k_proj.weight", (tp_axis, None)),
        ShardRule("*v_proj.weight", (tp_axis, None)),
        ShardRule("*q_proj.bias", (tp_axis,)),
        ShardRule("*k_proj.bias", (tp_axis,)),
        ShardRule("*v_proj.bias", (tp_axis,)),
        ShardRule("*o_proj.weight", (None, tp_axis)),
        ShardRule("*gate_proj.weight", (tp_axis, None)),
        ShardRule("*up_proj.weight", (tp_axis, None)),
        ShardRule("*down_proj.weight", (None, tp_axis)),
        ShardRule("*embed_tokens.weight", (tp_axis, None)),
        ShardRule("*lm_head.weight", (tp_axis, None)),
        # w8a8 serving models: per-output-channel QuantGemm scales follow
        # the column-parallel weight split; row-parallel scales (o_proj,
        # down_proj — full output dim) stay replicated. Seed-OSS keeps the
        # qkv biases as model-level fp leaves next to the bias-free
        # QuantGemm — same colwise split.
        ShardRule("*q_proj.weight_scale", (tp_axis,)),
        ShardRule("*k_proj.weight_scale", (tp_axis,)),
        ShardRule("*v_proj.weight_scale", (tp_axis,)),
        ShardRule("*gate_proj.weight_scale", (tp_axis,)),
        ShardRule("*up_proj.weight_scale", (tp_axis,)),
        ShardRule("*lm_head.weight_scale", (tp_axis,)),
        ShardRule("*self_attn.q_bias", (tp_axis,)),
        ShardRule("*self_attn.k_bias", (tp_axis,)),
        ShardRule("*self_attn.v_bias", (tp_axis,)),
    ]


def moe_ep_rules(ep_axis: str = "ep") -> List[ShardRule]:
    """Expert-parallel plan: expert-major weights shard on dim 0
    (reference distributed/parallel/expert_parallel.py:66-126, incl. quant
    scale / smooth-scale tensors)."""
    # scale rules are scoped under *experts*/moe paths: a bare
    # "*weight_scale" would also match non-expert 1-D QuantGemm scales
    # (e.g. attention projections) with a rank-2 spec
    return [
        ShardRule("*experts*weight", (ep_axis, None, None)),
        ShardRule("*experts*scale", (ep_axis, None)),
    ]
