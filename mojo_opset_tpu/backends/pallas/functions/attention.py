"""Pallas-tier training function: varlen GQA/SWA flash attention fwd+bwd.

Replaces autodiff-of-golden for the training attention hot path — the
reference's largest kernel family (TTXSWAFunction over the hand-written
swa_fwd/swa_bwd Triton pair, reference backends/ttx/functions/attention.py:57
+ kernels/npu/a2/swa.py:1).  Unsupported geometries (non-AABB grouping,
non-lane-aligned head_dim) fall back to the golden, whose backward is
derived by JAX autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.flash_vjp import flash_swa
from mojo_opset_tpu.core.functions.attention import MojoSWAFunction
from mojo_opset_tpu.utils.platform import pallas_interpret_mode

_MAX_BATCH = 64  # per-tile mask recomputation unrolls over sequences


class PallasSWAFunction(MojoSWAFunction):
    def forward(self, query, key, value, cu_q_lens, cu_total_seq_lens, softmax_scale=None):
        swa = self.swa
        D = query.shape[-1]
        if (
            query.ndim != 3
            or key.ndim != 3
            or swa.gqa_layout != "AABB"
            or D % 128 != 0
            or key.shape[-1] != D
            or query.shape[1] % key.shape[1] != 0
            or cu_q_lens.shape[0] - 1 > _MAX_BATCH
            or not jnp.issubdtype(query.dtype, jnp.floating)
            or query.dtype != key.dtype
            or key.dtype != value.dtype
        ):
            return super().forward(query, key, value, cu_q_lens, cu_total_seq_lens, softmax_scale)

        # the diagonal-skip optimization is only sound when the global token
        # order equals the in-sequence order on both sides, i.e. the SAME
        # cu_lens vector describes q and kv (the training case)
        aligned = cu_q_lens is cu_total_seq_lens

        f16 = query.dtype == jnp.float16
        if f16:  # Mosaic has no native f16 arithmetic; ride fp32 (grads cast back)
            query, key, value = (x.astype(jnp.float32) for x in (query, key, value))
        out = flash_swa(
            query, key, value,
            cu_q_lens, cu_total_seq_lens,
            swa.is_causal,
            swa.local_window_size,
            swa.global_window_size,
            softmax_scale,
            aligned,
            256, 256,
            pallas_interpret_mode(),
        )
        return out.astype(jnp.float16) if f16 else out
