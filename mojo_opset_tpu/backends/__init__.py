"""Backend tiers: importing a sub-package registers its implementations.

Reference analogue: mojo_opset/backends/ (ttx/torch_npu/ixformer); here the
tiers are ``xla`` (fused jnp/lax, jittable) and ``pallas`` (hand-written
Mosaic kernels for TPU).

``MOJO_DETERMINISTIC=1`` (reference backends/__init__.py:8-17) is honored
by individual ops (e.g. seeded, order-fixed sampling); XLA:TPU itself is
deterministic for the op set used here.
"""

import mojo_opset_tpu.backends.xla  # noqa: F401
import mojo_opset_tpu.backends.pallas  # noqa: F401
