"""mojo_opset_tpu — a TPU-native (JAX/XLA/Pallas) operator-set framework.

Built from scratch with the capability set of XPU-Forces/mojo_opset
(reference mojo_opset/__init__.py:3-45): a core op suite with golden
references, env-selected backend tiers (``MOJO_BACKEND`` in
{ref, xla, pallas}), a paged-KV inference runtime, parallel styles over
``jax.sharding``/shard_map, reference models, and a precision debugger.

Import order matters for dispatch: core classes create per-op registries;
importing the backend packages afterwards registers the xla/pallas tiers.
"""

from __future__ import annotations

import os

__version__ = "0.1.0"

# Core ops (registries + golden 'ref' tier auto-registration).
from mojo_opset_tpu.core import (  # noqa: F401
    BackendNotAvailable,
    Module,
    MojoBackendRegistry,
    MojoFunction,
    MojoOperator,
)
from mojo_opset_tpu.core.operators import *  # noqa: F401,F403
from mojo_opset_tpu.core.functions import *  # noqa: F401,F403

# Backend tiers (registration side effects).
import mojo_opset_tpu.backends  # noqa: F401,E402

# Debugger auto-enable, mirroring reference __init__.py:3-10.
if os.environ.get("MOJO_DEBUG", "0") == "1":
    from mojo_opset_tpu.utils.debugger import MojoDebugger

    MojoDebugger.enable()


def _autoload_plugins() -> None:
    """Load third-party backends from ``mojo_opset_tpu.plugins`` entry
    points (reference __init__.py:27-45, gated by
    MOJO_OPSET_PLUGIN_AUTOLOAD)."""
    if os.environ.get("MOJO_OPSET_PLUGIN_AUTOLOAD", "1") != "1":
        return
    try:
        from importlib.metadata import entry_points

        eps = entry_points()
        group = eps.select(group="mojo_opset_tpu.plugins") if hasattr(eps, "select") else eps.get(
            "mojo_opset_tpu.plugins", []
        )
        for ep in group:
            try:
                ep.load()
            except Exception as exc:  # pragma: no cover
                from mojo_opset_tpu.utils.logging import get_logger

                get_logger(__name__).warning("Failed to load plugin %s: %s", ep.name, exc)
    except Exception:  # pragma: no cover
        pass


_autoload_plugins()
