"""Platform probing and backend-tier priority.

Capability parity with reference mojo_opset/utils/platform.py:17-122
(platform probe -> backend priority -> dist backend), re-designed for TPU:
the "platforms" are JAX backends (tpu/gpu/cpu) and the "backends" are
implementation *tiers*:

  * ``ref``    — plain jax.numpy golden reference (runs anywhere, eager-friendly)
  * ``xla``    — fused jnp/lax implementation, jittable, default on all platforms
  * ``pallas`` — hand-written Pallas/Mosaic kernels (TPU; interpretable on CPU)

``MOJO_BACKEND`` selects a tier explicitly; otherwise the per-platform
priority list picks the best registered tier for each op.
"""

from __future__ import annotations

import functools
import os

# Priority per platform (highest first). Mirrors PLATFORM_BACKEND_PRIORITY
# (reference core/backend_registry.py:13-18).
PLATFORM_BACKEND_PRIORITY: dict[str, list[str]] = {
    "tpu": ["pallas", "xla", "ref"],
    "gpu": ["xla", "ref"],
    "cpu": ["xla", "ref"],
}

ALL_TIERS = ("ref", "xla", "pallas")


@functools.cache
def get_platform() -> str:
    """Return the active JAX platform family: 'tpu', 'gpu' or 'cpu'."""
    override = os.environ.get("MOJO_PLATFORM")
    if override:
        return override
    try:
        import jax

        # When the platform is pinned (JAX_PLATFORMS / jax_platforms), trust
        # the pin instead of instantiating the backend: jax.devices() on a
        # tunneled single-chip backend (axon) blocks on the remote end and
        # HANGS outright if the tunnel is down — import must never do that.
        pinned = str(getattr(jax.config, "jax_platforms", "") or "")
        platform = pinned.split(",")[0].strip() if pinned else jax.devices()[0].platform
    except Exception:
        return "cpu"
    if platform in ("tpu", "axon"):
        return "tpu"
    if platform in ("gpu", "cuda", "rocm"):
        return "gpu"
    return "cpu"


def get_backend_priority(platform: str | None = None) -> list[str]:
    return PLATFORM_BACKEND_PRIORITY.get(platform or get_platform(), ["xla", "ref"])


def pallas_interpret_mode() -> bool:
    """Whether Pallas kernels should run in interpreter mode (CPU testing)."""
    env = os.environ.get("MOJO_PALLAS_INTERPRET")
    if env is not None:
        return env == "1"
    return get_platform() != "tpu"


def is_deterministic() -> bool:
    return os.environ.get("MOJO_DETERMINISTIC", "0") == "1"
