"""Fused linear + cross-entropy loss (training function).

Parity: reference mojo_opset/core/functions/loss_function.py:10-190
(MojoFusedLinearCrossEntropyFunction + MojoFusedLinearCrossEntropyLoss):
lm_head GEMM fused with CE loss — kernel backends avoid materializing the
full logits; supports ce_weight, ignore_index, label smoothing, z-loss
(lse_square_scale) and softcap.

TPU notes: the golden computes logits directly (XLA fuses the matmul with
the row-wise logsumexp); JAX autodiff supplies the backward, matching the
reference's recompute-based backward (loss_function.py:99-160).  A
chunked variant (``chunk_size``) processes the vocab GEMM in row blocks so
the logits never materialize at full (T, V) — the memory-saving behavior
the Triton kernel provides in the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.function import MojoFunction


def _ce_from_logits(
    logits: jax.Array,  # (N, V) fp32
    target: jax.Array,  # (N,)
    ce_weight: Optional[jax.Array],
    ignore_index: int,
    lse_square_scale: float,
    label_smoothing: float,
    reduction: str,
    softcap: Optional[float],
):
    if softcap is not None:
        logits = jnp.tanh(logits / softcap) * softcap
    valid = target != ignore_index
    safe_target = jnp.where(valid, target, 0).astype(jnp.int32)

    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    target_logit = jnp.take_along_axis(logits, safe_target[:, None], axis=-1)[:, 0]

    if label_smoothing > 0.0:
        V = logits.shape[-1]
        smooth_loss = -jnp.mean(logits, axis=-1)
        nll = (1.0 - label_smoothing) * (lse - target_logit) + label_smoothing * (
            lse + smooth_loss
        )
    else:
        nll = lse - target_logit

    if ce_weight is not None:
        w = ce_weight[safe_target]
        nll = nll * w
        denom = jnp.sum(jnp.where(valid, w, 0.0))
    else:
        denom = jnp.sum(valid)

    nll = jnp.where(valid, nll, 0.0)
    if reduction == "mean":
        loss = jnp.sum(nll) / jnp.maximum(denom, 1.0)
    elif reduction == "sum":
        loss = jnp.sum(nll)
    else:
        loss = nll

    z_loss = None
    if lse_square_scale > 0.0:
        lse_valid = jnp.where(valid, lse, 0.0)
        z_sum = lse_square_scale * jnp.sum(lse_valid * lse_valid)
        # z-loss follows the reduction: a "sum" chunk must NOT pre-divide
        # by its local count — the chunked caller divides the combined
        # total by the GLOBAL count (dividing twice shrank the objective)
        if reduction == "sum":
            z_loss = z_sum
        else:
            z_loss = z_sum / jnp.maximum(jnp.sum(valid), 1)
        if reduction != "none":
            loss = loss + z_loss
    return loss, z_loss


def fused_linear_cross_entropy(
    input_tensor: jax.Array,  # (N, H)
    weight: jax.Array,  # (V, H)
    target: jax.Array,  # (N,)
    bias: Optional[jax.Array] = None,
    ce_weight: Optional[jax.Array] = None,
    ignore_index: int = -100,
    lse_square_scale: float = 0.0,
    label_smoothing: float = 0.0,
    reduction: str = "mean",
    softcap: Optional[float] = None,
    return_z_loss: bool = False,
    chunk_size: Optional[int] = None,
):
    """Functional fused linear + CE. With ``chunk_size``, token rows are
    processed in blocks via ``lax.map`` so full (N, V) logits never
    materialize (differentiable end-to-end)."""
    if chunk_size is None or input_tensor.shape[0] <= chunk_size:
        logits = (input_tensor @ weight.T).astype(jnp.float32)
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        loss, z_loss = _ce_from_logits(
            logits, target, ce_weight, ignore_index, lse_square_scale,
            label_smoothing, reduction, softcap,
        )
        if return_z_loss:
            return loss, (z_loss if z_loss is not None else jnp.float32(0.0))
        return loss

    N = input_tensor.shape[0]
    pad = (-N) % chunk_size
    x = jnp.pad(input_tensor, ((0, pad), (0, 0)))
    t = jnp.pad(target, (0, pad), constant_values=ignore_index)
    xc = x.reshape(-1, chunk_size, x.shape[-1])
    tc = t.reshape(-1, chunk_size)

    def chunk_loss(args):
        xi, ti = args
        logits = (xi @ weight.T).astype(jnp.float32)
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        loss_sum, z_sum = _ce_from_logits(
            logits, ti, ce_weight, ignore_index, lse_square_scale,
            label_smoothing, "sum", softcap,
        )
        if z_sum is not None:
            loss_sum = loss_sum - z_sum  # recombined after global division
        valid = jnp.sum(ti != ignore_index) if ce_weight is None else jnp.sum(
            jnp.where(ti != ignore_index, ce_weight[jnp.where(ti != ignore_index, ti, 0)], 0.0)
        )
        n_valid = jnp.sum(ti != ignore_index)
        return loss_sum, valid, n_valid, (z_sum if z_sum is not None else jnp.float32(0.0))

    sums, counts, n_valids, z_sums = jax.lax.map(chunk_loss, (xc, tc))
    total = jnp.sum(sums)
    denom = jnp.sum(counts)
    z_total = jnp.sum(z_sums)
    if reduction == "mean":
        loss = total / jnp.maximum(denom, 1.0)
        # z mean matches the unchunked path: UNWEIGHTED valid count
        z_total = z_total / jnp.maximum(jnp.sum(n_valids), 1)
    elif reduction == "sum":
        loss = total
    else:
        raise NotImplementedError("chunked fused CE supports mean/sum reduction")
    if lse_square_scale > 0.0:
        loss = loss + z_total
    if return_z_loss:
        return loss, z_total
    return loss


class MojoFusedLinearCrossEntropyFunction(MojoFunction):
    """Dispatchable op form; forward(input, weight, target, ...) -> loss."""

    def __init__(
        self,
        ignore_index: int = -100,
        lse_square_scale: float = 0.0,
        label_smoothing: float = 0.0,
        reduction: str = "mean",
        softcap: Optional[float] = None,
        return_z_loss: bool = False,
        chunk_size: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.ignore_index = ignore_index
        self.lse_square_scale = lse_square_scale
        self.label_smoothing = label_smoothing
        self.reduction = reduction
        self.softcap = softcap
        self.return_z_loss = return_z_loss
        self.chunk_size = chunk_size

    def forward(
        self,
        input_tensor: jax.Array,
        weight: jax.Array,
        target: jax.Array,
        bias: Optional[jax.Array] = None,
        ce_weight: Optional[jax.Array] = None,
    ):
        return fused_linear_cross_entropy(
            input_tensor, weight, target, bias, ce_weight,
            ignore_index=self.ignore_index,
            lse_square_scale=self.lse_square_scale,
            label_smoothing=self.label_smoothing,
            reduction=self.reduction,
            softcap=self.softcap,
            return_z_loss=self.return_z_loss,
            chunk_size=self.chunk_size,
        )

    def extra_repr(self) -> str:
        return (
            f"ignore_index={self.ignore_index}, lse_square_scale={self.lse_square_scale}, "
            f"label_smoothing={self.label_smoothing}, reduction={self.reduction!r}, "
            f"softcap={self.softcap}, chunk_size={self.chunk_size}"
        )


class MojoFusedLinearCrossEntropyLoss(MojoFunction):
    """Module-style wrapper (reference loss_function.py:161-190)."""

    def __init__(
        self,
        ignore_index: int = -100,
        lse_square_scale: float = 0.0,
        label_smoothing: float = 0.0,
        reduction: str = "mean",
        softcap: Optional[float] = None,
        return_z_loss: bool = False,
        chunk_size: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.ignore_index = ignore_index
        self.lse_square_scale = lse_square_scale
        self.label_smoothing = label_smoothing
        self.reduction = reduction
        self.softcap = softcap
        self.return_z_loss = return_z_loss
        self.chunk_size = chunk_size

    def forward(self, lin_weight, input_tensor, target, bias=None, ce_weight=None):
        return fused_linear_cross_entropy(
            input_tensor, lin_weight, target, bias, ce_weight,
            ignore_index=self.ignore_index,
            lse_square_scale=self.lse_square_scale,
            label_smoothing=self.label_smoothing,
            reduction=self.reduction,
            softcap=self.softcap,
            return_z_loss=self.return_z_loss,
            chunk_size=self.chunk_size,
        )
