"""Distributed save/load of sharded model state.

Parity: reference mojo_opset/distributed/parallel/utils.py:44-97
(``mojo_parallel_save_state_dict_naive`` rank-0 gather + save, load with
mesh-coordinate key renaming via ``stat_dict_rename_hook``).

TPU-native: arrays carry their own NamedShardings, so "gather to rank 0"
is ``jax.device_get`` of the addressable value (process 0 sees the full
logical array in single-controller JAX); keys are the pytree paths, and
per-shard files append the mesh-coordinate string exactly like the
reference's ``stat_dict_rename_hook``.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Optional

import jax
import numpy as np

from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def state_dict(model) -> dict:
    """Flat {path: np.ndarray} view of a model pytree."""
    flat, _ = jax.tree_util.tree_flatten_with_path(model)
    return {jax.tree_util.keystr(p): np.asarray(jax.device_get(l)) for p, l in flat}


def stat_dict_rename_hook(mesh_coords: dict) -> Callable[[str], str]:
    """Key renamer appending mesh-coordinate strings (reference
    parallel/utils.py:44-57): ``weight`` -> ``weight@tp0,ep1``."""
    suffix = ",".join(f"{k}{v}" for k, v in sorted(mesh_coords.items()))

    def rename(key: str) -> str:
        return f"{key}@{suffix}" if suffix else key

    return rename


def mojo_parallel_save_state_dict_naive(
    model,
    path: str,
    mesh_coords: Optional[dict] = None,
    rename_hook: Optional[Callable[[str], str]] = None,
) -> None:
    """Save the full (gathered) state dict; only process 0 writes."""
    sd = state_dict(model)
    if rename_hook is None and mesh_coords:
        rename_hook = stat_dict_rename_hook(mesh_coords)
    if rename_hook is not None:
        sd = {rename_hook(k): v for k, v in sd.items()}
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(sd, f)
        logger.info("saved %d tensors to %s", len(sd), path)


def mojo_parallel_load_state_dict_naive(
    model,
    path: str,
    rename_hook: Optional[Callable[[str], str]] = None,
    strict: bool = True,
):
    """Load a saved state dict back into a model pytree (functional)."""
    with open(path, "rb") as f:
        sd = pickle.load(f)
    flat, treedef = jax.tree_util.tree_flatten_with_path(model)
    new_leaves = []
    missing = []
    for p, leaf in flat:
        key = jax.tree_util.keystr(p)
        if rename_hook is not None:
            key = rename_hook(key)
        if key in sd:
            val = jax.numpy.asarray(sd[key], dtype=leaf.dtype)
            if hasattr(leaf, "shape") and tuple(val.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"checkpoint shape mismatch for {key}: "
                    f"{tuple(val.shape)} vs model {tuple(leaf.shape)}"
                )
            if hasattr(leaf, "sharding"):
                val = jax.device_put(val, leaf.sharding)
            new_leaves.append(val)
        else:
            missing.append(key)
            new_leaves.append(leaf)
    if missing and strict:
        raise KeyError(f"missing keys in checkpoint: {missing[:10]} (+{max(0, len(missing)-10)} more)")
    if missing:
        logger.warning("checkpoint missing %d keys; kept existing values", len(missing))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
