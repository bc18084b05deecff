"""Pallas-tier ApplyRoPE (wrapper over kernels/rope.py).

Analogue of the reference TTX rope wrapper ops (backends/ttx/operators/
+ kernels/npu/a2/rope.py).  Full-rope, lane-aligned layouts go through
the streaming Mosaic kernel; partial rope (nope_dim), odd widths and
unaligned lengths fall back to the XLA golden.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np

from mojo_opset_tpu.backends.pallas.kernels.rope import (
    rope_head_first,
    rope_token_first,
)
from mojo_opset_tpu.core.operators.position_embedding import MojoApplyRoPE
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


class PallasApplyRoPE(MojoApplyRoPE):
    def forward(
        self,
        q: jax.Array,
        k: jax.Array,
        cos: jax.Array,
        sin: jax.Array,
        head_first: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        D = q.shape[-1]
        table_ok = (
            cos.shape == sin.shape
            and cos.shape[-1] == D  # full rope only (nope_dim == 0)
            and int(np.prod(cos.shape[:-2])) == 1
            and D % 128 == 0
        )
        interpret = pallas_interpret_mode()
        if table_ok and head_first and q.ndim == 4 and k.ndim == 4:
            from mojo_opset_tpu.backends.pallas.kernels.rope import head_first_supported

            S = q.shape[2]
            H = max(q.shape[1], k.shape[1])
            if (
                cos.shape[-2] == S
                and k.shape[2] == S
                and S % 8 == 0
                and head_first_supported(S, H, D, q.dtype)
            ):
                c2 = cos.reshape(S, D)
                s2 = sin.reshape(S, D)
                return (
                    rope_head_first(q, c2, s2, interpret),
                    rope_head_first(k, c2, s2, interpret),
                )
        if table_ok and not head_first and q.ndim == 3 and k.ndim == 3:
            T = q.shape[0]
            if cos.shape[-2] == T and k.shape[0] == T and T % 8 == 0:
                c2 = cos.reshape(T, D)
                s2 = sin.reshape(T, D)
                return (
                    rope_token_first(q, c2, s2, interpret),
                    rope_token_first(k, c2, s2, interpret),
                )
        return super().forward(q, k, cos, sin, head_first)
