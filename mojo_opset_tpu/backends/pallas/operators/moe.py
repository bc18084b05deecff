"""Pallas-tier MoE: grouped-SwiGLU experts on the padded-window GMM kernel.

Analogue of the reference TTX fused-MoE wrappers
(backends/ttx/operators/moe.py over kernels/npu/a2/moe/); the expert
FFN's two ragged matmuls run on the aligned-window grouped_matmul kernel
instead of ``lax.ragged_dot``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.group_gemm import grouped_matmul
from mojo_opset_tpu.backends.xla.operators.moe import XlaExperts
from mojo_opset_tpu.core.operators.moe import MojoMoE
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


def _gmm_ok(M: int, K: int, N: int) -> bool:
    return K % 128 == 0 and N % 256 == 0 and M % 8 == 0 and M >= 24


def _pick_bk(K: int) -> int:
    if K <= 4096:
        return K
    if K % 4096 == 0:
        return 4096
    if K % 2048 == 0:
        return 2048
    return K


class PallasExperts(XlaExperts):
    """Grouped SwiGLU FFN: two aligned-window GMMs with fused activation."""

    def forward(self, sorted_hidden_states: jax.Array, tokens_per_expert: jax.Array):
        M, H = sorted_hidden_states.shape
        # stored layouts are (E, OUT, K) — exactly the kernel's
        # trans_weight fast path (K-contiguous bursts); never transpose
        I2 = self.up_proj_weight.shape[1]
        if not (_gmm_ok(M, H, I2) and _gmm_ok(M, I2 // 2, H)):
            return XlaExperts.forward(self, sorted_hidden_states, tokens_per_expert)
        interpret = pallas_interpret_mode()
        gs = tokens_per_expert.astype(jnp.int32)
        bm = 512 if M >= 4096 else max(8, ((M // 16) // 8) * 8 or 8)
        fc1 = grouped_matmul(
            sorted_hidden_states, self.up_proj_weight, gs,
            bm=bm, bn=256 if I2 % 256 == 0 else 128, bk=_pick_bk(H),
            trans_weight=True, interpret=interpret,
        )
        gate, up = jnp.split(fc1.astype(jnp.float32), 2, axis=-1)
        act = (jax.nn.silu(gate) * up).astype(sorted_hidden_states.dtype)
        return grouped_matmul(
            act, self.down_proj_weight, gs,
            bm=bm, bn=256 if H % 256 == 0 else 128, bk=_pick_bk(I2 // 2),
            trans_weight=True, interpret=interpret,
        )


class PallasMoE(MojoMoE):
    """Full MoE pipeline wired to the pallas experts tier (gating /
    dispatch / combine fall back to the best registered tier)."""
