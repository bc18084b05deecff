"""MojoFunction: dispatching base for training (fwd+bwd) ops.

Capability parity with reference mojo_opset/core/function.py:12-71, which
wraps ``torch.autograd.Function`` pairs.  In JAX the backward pass is
derived automatically from the golden forward via autodiff; tier
implementations (Pallas) attach ``jax.custom_vjp`` kernels inside their
``forward`` when a hand-written backward is profitable.

A ``MojoFunction`` is therefore just a ``MojoOperator`` under a separate
dispatch root — the distinction preserved from the reference is semantic:
functions are differentiable end-to-end and are exercised by training
paths, while operators are inference-oriented.
"""

from __future__ import annotations

import jax

from mojo_opset_tpu.core.operator import MojoOperator


class MojoFunction(MojoOperator, dispatch_root=True):
    def value_and_grad(self, *args, argnums=0, **kwargs):
        """Convenience: forward value plus gradients w.r.t. ``argnums``."""

        def _scalarized(*a, **k):
            out = self(*a, **k)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(leaf.sum() for leaf in leaves)

        return jax.value_and_grad(_scalarized, argnums=argnums)(*args, **kwargs)
