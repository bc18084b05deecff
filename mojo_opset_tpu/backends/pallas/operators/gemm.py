"""Pallas-tier GEMM ops.

Analogue of the reference TTX group_gemm wrappers
(backends/ttx/operators/gemm.py over kernels/npu/a2/group_gemm.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.group_gemm import grouped_matmul
from mojo_opset_tpu.backends.pallas.kernels.int4_matmul import int4_scaled_matmul
from mojo_opset_tpu.backends.pallas.kernels.int8_matmul import int8_scaled_matmul
from mojo_opset_tpu.core.operators.gemm import MojoGroupGemm, MojoQuantGemm
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


class PallasGroupGemm(MojoGroupGemm):
    """Padded-GMM grouped matmul (one expert per M tile on the MXU)."""

    def forward(self, input: jax.Array, group_list: jax.Array) -> jax.Array:
        M, K = input.shape
        if self.trans_weight:
            G, N, _ = self.weight.shape  # stored (G, N, K): kernel-native
        else:
            G, _, N = self.weight.shape
        interpret = pallas_interpret_mode()
        if input.dtype == jnp.float16:
            # the MXU has no fp16 input mode (bf16 is TPU's native 16-bit):
            # feed bf16 operands to the proven kernel config instead of
            # upcasting 400+ MB of operands to fp32 (accumulation is fp32
            # either way; the extra input rounding is 2^-8 vs 2^-11, far
            # inside the reference's fp16 tolerance ladder, tests/utils.py:90)
            out = self.replace(weight=self.weight.astype(jnp.bfloat16))(
                input.astype(jnp.bfloat16), group_list)
            return out.astype(jnp.float16)
        # geometry the kernel cannot tile: keep the xla tier's ragged_dot
        if K % 128 != 0 or N % 128 != 0 or M % 8 != 0 or M < 24:
            out = jax.lax.ragged_dot(
                input, self._canonical_weight(),
                group_sizes=jnp.asarray(group_list, jnp.int32),
                preferred_element_type=jnp.float32,
            )
            return out.astype(input.dtype)
        bn = 256 if N % 256 == 0 else 128
        bm = 512 if M >= 4096 else max(8, ((M // 16) // 8) * 8 or 8)
        # single k chunk when the weight slab fits VMEM: exact ragged_dot
        # numerics (one fp32 accumulation chain) and no inter-chunk adds
        if K <= 4096:
            bk = K
        elif K % 4096 == 0:
            bk = 4096
        elif K % 2048 == 0:
            bk = 2048
        else:
            bk = K  # small odd K (multiple of 128 guaranteed above)
        # pass the STORED layout: the kernel reads (G, N, K) directly with
        # trans_weight (K-contiguous bursts) — materializing a transpose
        # here would copy every expert weight per call
        return grouped_matmul(
            input, self.weight, jnp.asarray(group_list, jnp.int32),
            bm=bm, bn=bn, bk=bk, trans_weight=self.trans_weight,
            interpret=interpret,
        )


class PallasQuantGemm(MojoQuantGemm):
    """int8 GEMM with the dequant epilogue fused into the final K step
    (kernels/int8_matmul.py; reference TTX int8_gemm analogue)."""

    def forward(self, input: jax.Array, input_scale: jax.Array) -> jax.Array:
        M, K = input.shape
        N = self.out_features
        # geometry the kernel cannot tile: fall back to the XLA dot path.
        # Small M (decode shapes) also goes to XLA: both paths are weight-
        # bandwidth-bound there and the XLA int8 dot sustains ~660-684 GB/s
        # vs the Pallas kernel's ~480-500 (measured on v5e at M=8,
        # tools/diagnose_int8_decode.py) — the kernel's VMEM pipeline only
        # pays off once M is large enough to be MXU-bound.
        if self.weight_dtype == "int4" and K % 128 == 0:
            # int4 must stay on the kernel at ANY M: the XLA fallback
            # materializes the unpacked (N, K) int8 weight per call, which
            # doubles the HBM traffic the packing exists to halve. Decode
            # shapes (M=1..7) pad M up to the 8-row tile — activation
            # bytes are negligible next to the weight stream.
            pad = (-M) % 8
            x = jnp.pad(input, ((0, pad), (0, 0))) if pad else input
            s = jnp.pad(input_scale.reshape(-1), (0, pad)) if pad else input_scale.reshape(-1)
            Mp = M + pad
            bm4 = next(b for b in (256, 128, 64, 32, 16, 8) if Mp % b == 0)
            # bk/bn auto-pick inside the kernel: wide blocks keep the
            # weight DMAs MB-scale (the v1 bk=512 override measured
            # 110 GB/s at M=8 — 6x under the XLA int8 dot)
            out = int4_scaled_matmul(
                x.astype(jnp.int8), self.weight, s, self.weight_scale,
                out_dtype=self.output_dtype, bm=bm4,
                interpret=pallas_interpret_mode(),
            )
            return out[:M] if pad else out
        if M % 8 or K % 128 or N % 128 or M < 64:
            return super().forward(input, input_scale)
        # (1024, 256) is the measured best large-M tile (427 µs vs 439 at
        # (512, 512) for 4096³ — r5 re-sweep); fall through to narrower
        # tiles when M/N don't divide
        if M % 1024 == 0 and N % 256 == 0:
            bm, bn = 1024, 256
        else:
            bm = 512 if M % 512 == 0 else (256 if M % 256 == 0 else
                                           next(b for b in (128, 64, 32, 16, 8) if M % b == 0))
            bn = 512 if N % 512 == 0 else (256 if N % 256 == 0 else 128)
        # deepest K chunk that divides K within the VMEM budget: bk=4096
        # measured 299-319 TFLOP/s vs 249-276 at bk<=1024 (the 2026-08-21
        # tile sweep, tools/tune_quant_gemm.py) — fewer accumulator
        # round-trips and MB-scale weight DMAs
        budget = 10 * 2**20
        bk = next(
            (b for b in (4096, 2048, 1024, 512, 256, 128)
             if K % b == 0 and (bm + bn) * b + 4 * bm * bn <= budget),
            128,
        )
        return int8_scaled_matmul(
            input.astype(jnp.int8), self.weight,
            input_scale.reshape(-1), self.weight_scale,
            out_dtype=self.output_dtype, bm=bm, bn=bn, bk=bk,
            trans_weight=self.trans_weight,
            interpret=pallas_interpret_mode(),
        )
