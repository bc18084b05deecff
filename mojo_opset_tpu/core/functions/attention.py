"""Training attention functions.

Parity: reference mojo_opset/core/functions/attention.py:236
(MojoSWAFunction fwd+bwd) — differentiable dense varlen sliding-window
attention; the math is the MojoSWA golden, which is jnp end-to-end so
``jax.grad`` flows through (the reference hand-writes the backward for
its Triton kernels).
"""

from __future__ import annotations

from typing import Optional

import jax

from mojo_opset_tpu.core.function import MojoFunction
from mojo_opset_tpu.core.operators.attention import MojoSWA


class MojoSWAFunction(MojoFunction):
    def __init__(
        self,
        is_causal: bool = True,
        gqa_layout: str = "AABB",
        global_window_size: Optional[int] = None,
        local_window_size: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.swa = MojoSWA._registry.get(self._backend)(
            is_causal=is_causal,
            gqa_layout=gqa_layout,
            global_window_size=global_window_size,
            local_window_size=local_window_size,
        )

    def forward(self, query, key, value, cu_q_lens, cu_total_seq_lens, softmax_scale=None):
        return self.swa(query, key, value, cu_q_lens, cu_total_seq_lens, softmax_scale)

    def extra_repr(self) -> str:
        return self.swa.extra_repr()
