"""Device-mesh construction helpers.

TPU-native replacement for the reference's process-group plumbing
(reference utils/platform.py:59-75 dist-backend mapping and
runtime/config.py:114-194 MojoParallelConfig world-size split): axes of a
``jax.sharding.Mesh`` take the place of process groups.  TP/SP/EP axes
should ride ICI; DP typically maps to the DCN axis in multi-host runs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

from mojo_opset_tpu.runtime.config import AFDRole, MojoParallelConfig


def build_mesh(axis_sizes: Sequence[int], axis_names: Sequence[str], devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    total = int(np.prod(axis_sizes))
    if total > len(devices):
        raise ValueError(f"mesh needs {total} devices, have {len(devices)}")
    arr = np.array(devices[:total]).reshape(tuple(axis_sizes))
    return Mesh(arr, axis_names=tuple(axis_names))


def mesh_from_parallel_config(
    config: MojoParallelConfig, devices=None
) -> Tuple[Mesh, Optional[Mesh]]:
    """Build mesh(es) from a MojoParallelConfig.

    Non-AFD: one mesh with axes (pp, dp, sp, tp).
    AFD: the device set splits into an attention mesh (pp, dp, sp, tp) and
    an FFN mesh (pp, ep, tp) (reference runtime/config.py:104-194);
    returns (attn_mesh, ffn_mesh).
    """
    devices = list(devices if devices is not None else jax.devices())
    if not config.AFD_ENABLED:
        mesh = build_mesh(
            (config.PP_SIZE, config.ATTN_DP_SIZE, config.ATTN_SP_SIZE, config.ATTN_TP_SIZE),
            ("pp", "dp", "sp", "tp"),
            devices,
        )
        return mesh, None

    attn_n = config.attn_world_size
    attn_mesh = build_mesh(
        (config.ATTN_PP_SIZE, config.ATTN_DP_SIZE, config.ATTN_SP_SIZE, config.ATTN_TP_SIZE),
        ("pp", "dp", "sp", "tp"),
        devices[:attn_n],
    )
    ffn_mesh = build_mesh(
        (config.FFN_PP_SIZE, config.FFN_EP_SIZE, config.FFN_TP_SIZE),
        ("pp", "ep", "tp"),
        devices[attn_n : attn_n + config.ffn_world_size],
    )
    return attn_mesh, ffn_mesh


def local_mesh_for_role(config: MojoParallelConfig, role: AFDRole, devices=None) -> Mesh:
    attn_mesh, ffn_mesh = mesh_from_parallel_config(config, devices)
    if not config.AFD_ENABLED:
        return attn_mesh
    return attn_mesh if role == AFDRole.ATTN else ffn_mesh
