"""Pallas-tier training functions: fused linear + cross-entropy.

The accelerated function tier the reference builds in
backends/ttx/functions/ + kernels/npu/a2/fused_linear_cross_entropy.py:
a hand-written forward/backward pair (jax.custom_vjp over the Mosaic
kernels in kernels/flce.py) replacing autodiff-of-golden for the
training hot path.  Unsupported configurations (bias, ce_weight,
reduction='none', giant hidden, ragged N) fall back to the golden.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.flce import flce
from mojo_opset_tpu.core.functions.loss import (
    MojoFusedLinearCrossEntropyFunction,
    MojoFusedLinearCrossEntropyLoss,
)
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


def _kernel_supported(self, input_tensor, bias, ce_weight) -> bool:
    N, H = input_tensor.shape
    return (
        bias is None
        and ce_weight is None
        and self.reduction in ("mean", "sum")
        and N % 8 == 0
        and H % 128 == 0
        and H <= 8192
    )


def _run(self, input_tensor, weight, target):
    loss, z_loss = flce(
        input_tensor, weight, target,
        self.ignore_index, self.lse_square_scale, self.label_smoothing,
        self.reduction, self.softcap, pallas_interpret_mode(),
    )
    if self.return_z_loss:
        return loss, z_loss
    return loss


class PallasFusedLinearCrossEntropyFunction(MojoFusedLinearCrossEntropyFunction):
    # Not the default tier for SPEED: on-chip (r5) the kernel runs the MXU
    # at ~86% but recomputes logits in both backward kernels (5/3x the
    # matmul FLOPs), so XLA autodiff-of-golden is 1.6x faster at
    # N=4096 H=2560 V=151936 (58 ms vs 93 ms) — at the cost of
    # materializing the (N, V) logits (1.25 GB bf16 at this shape) plus
    # autodiff residuals in HBM.  Select MOJO_BACKEND=pallas when N*V is
    # memory-bound (long-sequence training shards) — this pair's HBM
    # footprint is O(N*H + V*H), independent of N*V.
    dispatch_default = False

    def forward(
        self,
        input_tensor: jax.Array,
        weight: jax.Array,
        target: jax.Array,
        bias: Optional[jax.Array] = None,
        ce_weight: Optional[jax.Array] = None,
    ):
        if not _kernel_supported(self, input_tensor, bias, ce_weight):
            return super().forward(input_tensor, weight, target, bias, ce_weight)
        return _run(self, input_tensor, weight, target)


class PallasFusedLinearCrossEntropyLoss(MojoFusedLinearCrossEntropyLoss):
    dispatch_default = False  # see PallasFusedLinearCrossEntropyFunction

    def forward(self, lin_weight, input_tensor, target, bias=None, ce_weight=None):
        if not _kernel_supported(self, input_tensor, bias, ce_weight):
            return super().forward(lin_weight, input_tensor, target, bias, ce_weight)
        return _run(self, input_tensor, lin_weight, target)
