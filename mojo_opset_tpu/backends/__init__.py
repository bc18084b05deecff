"""Backend tiers: importing a sub-package registers its implementations.

Reference analogue: mojo_opset/backends/ (ttx/torch_npu/ixformer); here the
tiers are ``xla`` (fused jnp/lax, jittable) and ``pallas`` (hand-written
Mosaic kernels for TPU).

``MOJO_DETERMINISTIC=1`` (reference backends/__init__.py:8-17, which sets
torch deterministic algorithms + the NPU ``CLOSE_MATMUL_K_SHIFT`` switch)
maps here to :func:`enable_deterministic`: XLA:TPU kernels are already
run-to-run deterministic, so the TPU-native levers are (a) pinning matmul
precision so recompiles can't silently change the accumulation path and
(b) the partitionable threefry PRNG so sharded sampling is independent of
the mesh layout.  Individual ops additionally honor
``utils.platform.is_deterministic()`` (e.g. seeded, order-fixed sampling).
"""

import os


def enable_deterministic() -> None:
    """Put JAX in a bit-reproducible configuration (MOJO_DETERMINISTIC=1)."""
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_threefry_partitionable", True)


if os.environ.get("MOJO_DETERMINISTIC", "0") == "1":
    enable_deterministic()

import mojo_opset_tpu.backends.xla  # noqa: F401, E402
import mojo_opset_tpu.backends.pallas  # noqa: F401, E402
