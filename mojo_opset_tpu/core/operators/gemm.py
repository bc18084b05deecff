"""GEMM ops: dense, ragged grouped, and quantized.

Parity: reference mojo_opset/core/operators/gemm.py:12-231
(MojoGemm :12, MojoGroupGemm :59, MojoQuantGemm :127).

TPU notes: MojoGemm lowers to a single MXU matmul; MojoGroupGemm's golden
uses a segment loop while the XLA tier maps to ``jax.lax.ragged_dot`` (the
MXU-native ragged grouped matmul); MojoQuantGemm uses int8xint8->int32 MXU
accumulation via ``preferred_element_type`` rather than the reference's
fp32 emulation (gemm.py:139).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator


class MojoGemm(MojoOperator):
    """nn.Linear-alike: ``y = x @ W^T + b`` with weight stored ``(out, in)``."""

    def __init__(
        self,
        in_features: Optional[int] = None,
        out_features: Optional[int] = None,
        bias: Optional[bool] = None,  # None = auto: True when initializing,
                                      # no bias when a prebuilt weight is given
        weight: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if weight is not None:
            if in_features is not None or out_features is not None:
                raise ValueError("Provide either weight or in_features/out_features, not both.")
            if weight.ndim != 2:
                raise ValueError(f"weight must be 2D, got shape {tuple(weight.shape)}.")
            self.out_features, self.in_features = weight.shape
            self.weight = weight
            # an EXPLICIT bias=True with a prebuilt weight gets a zero bias
            # leaf (set it afterwards); silently dropping it would be wrong
            self.bias = (
                jnp.zeros((self.out_features,), weight.dtype) if bias else None
            )
            return

        if in_features is None or out_features is None:
            raise ValueError("in_features and out_features are required when weight is not provided.")
        bias = True if bias is None else bias
        self.in_features = in_features
        self.out_features = out_features
        dtype = self.param_dtype or jnp.float32
        if key is None:
            key = jax.random.PRNGKey(0)
        from mojo_opset_tpu.utils import init as winit

        wkey, bkey = jax.random.split(key)
        bound = 1.0 / (in_features**0.5)
        self.weight = winit.uniform(wkey, (out_features, in_features), dtype, -bound, bound)
        self.bias = winit.uniform(bkey, (out_features,), dtype, -bound, bound) if bias else None

    def forward(self, input: jax.Array) -> jax.Array:
        out = jnp.matmul(input, self.weight.T, preferred_element_type=jnp.float32)
        if self.bias is not None:
            out = out + self.bias.astype(jnp.float32)
        return out.astype(input.dtype)

    def extra_repr(self) -> str:
        return f"in_features={self.in_features}, out_features={self.out_features}, bias={self.bias is not None}"


class MojoGroupGemm(MojoOperator):
    """Ragged grouped GEMM: 2-D input split row-wise by ``group_list``
    counts, per-group weight ``(G, Din, Dout)``.

    The golden uses a per-group loop (eager only, reference gemm.py:116);
    the XLA tier is jittable via ``jax.lax.ragged_dot``.
    """

    def __init__(self, weight: jax.Array, trans_weight: bool = False):
        super().__init__()
        self.weight = weight
        self.trans_weight = trans_weight

    def _canonical_weight(self) -> jax.Array:
        # (G, Din, Dout) regardless of storage layout.
        return jnp.swapaxes(self.weight, 1, 2) if self.trans_weight else self.weight

    def forward(self, input: jax.Array, group_list: jax.Array) -> jax.Array:
        assert input.ndim == 2, "input must be 2D"
        assert self.weight.ndim == 3, "weight must be 3D"
        weight = self._canonical_weight()
        num_groups = weight.shape[0]
        import numpy as np

        counts = np.asarray(group_list)
        assert counts.shape[0] == num_groups, "weight group count must match group_list length"
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        out_list = []
        for g in range(num_groups):
            seg = input[int(starts[g]) : int(starts[g] + counts[g])]
            out_list.append(
                jnp.matmul(seg, weight[g], preferred_element_type=jnp.float32).astype(input.dtype)
            )
        return jnp.concatenate(out_list, axis=0)

    def extra_repr(self) -> str:
        return f"weight_shape={tuple(self.weight.shape)}, weight_dtype={self.weight.dtype}, trans_weight={self.trans_weight}"


INT4_BLOCK = 128  # packed-int4 row-block (see pack_int4_rows)


def pack_int4_rows(w_q: jax.Array) -> jax.Array:
    """Pack int4 values (int8 storage, range [-8, 7]) two-per-byte along
    the OUTPUT-channel axis of a transposed (N, K) weight, in 128-row
    blocks: packed row ``j*64 + r`` carries channel ``j*128 + r`` in the
    low nibble and ``j*128 + 64 + r`` in the high nibble.  This layout
    lets the Pallas kernel (backends/pallas/kernels/int4_matmul.py)
    unpack a block with a single sublane concat, channel order preserved.
    Extends the reference's int4 expert packing (moe.py:566-573) to dense
    weights."""
    n, k = w_q.shape
    assert n % INT4_BLOCK == 0, f"int4 packing needs N % {INT4_BLOCK} == 0, got {n}"
    b = w_q.astype(jnp.int8).reshape(n // INT4_BLOCK, INT4_BLOCK, k)
    lo, hi = b[:, : INT4_BLOCK // 2], b[:, INT4_BLOCK // 2:]
    packed = jnp.bitwise_or(jnp.left_shift(hi, 4), jnp.bitwise_and(lo, 15))
    return packed.astype(jnp.int8).reshape(n // 2, k)


def unpack_int4_rows(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_int4_rows`: (N//2, K) int8 -> (N, K) int8."""
    n2, k = packed.shape
    b = packed.reshape(n2 * 2 // INT4_BLOCK, INT4_BLOCK // 2, k)
    lo = (jnp.bitwise_xor(jnp.bitwise_and(b, 15), 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(b, 4).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=1).reshape(n2 * 2, k)


class MojoQuantGemm(MojoOperator):
    """int8 (or packed-int4) x int8 -> int32 GEMM dequantized by per-token
    input scale and per-channel weight scale; output cast to
    ``output_dtype``.

    Weight stored ``(K, N)`` (or ``(N, K)`` when ``trans_weight``), weight
    scale ``(N,)``. Reference gemm.py:127-231.  ``weight_dtype="int4"``
    (beyond the reference's dense contract — it ships int4 only for MoE
    experts, moe.py:452-667) stores the weight packed two-channels-per-byte
    as ``(N//2, K)`` (:func:`pack_int4_rows`); requires ``trans_weight``.
    """

    def __init__(
        self,
        in_features: int,
        out_features: int,
        output_dtype=jnp.bfloat16,
        trans_weight: bool = False,
        quant_dtype=jnp.int8,
        weight_dtype=jnp.int8,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.in_features = in_features
        self.out_features = out_features
        self.quant_dtype = jnp.dtype(quant_dtype)
        self.weight_dtype = "int4" if weight_dtype == "int4" else jnp.dtype(weight_dtype)
        assert self.quant_dtype == jnp.int8, f"QuantGemm only supports int8 activations, got {quant_dtype}"
        assert self.weight_dtype in ("int4", jnp.dtype(jnp.int8)), (
            f"QuantGemm only supports int8/int4 weights, got {weight_dtype}")
        if self.weight_dtype == "int4":
            assert trans_weight, "int4 weights require trans_weight=True (packed (N//2, K))"
            assert out_features % INT4_BLOCK == 0, (
                f"int4 weights need out_features % {INT4_BLOCK} == 0, got {out_features}")
            self.weight_shape = (out_features // 2, in_features)
        else:
            self.weight_shape = (out_features, in_features) if trans_weight else (in_features, out_features)
        self.weight = jnp.zeros(self.weight_shape, jnp.int8)
        self.weight_scale = jnp.ones((out_features,), jnp.bfloat16)
        self.output_dtype = jnp.dtype(output_dtype)
        self.trans_weight = trans_weight

    def forward(self, input: jax.Array, input_scale: jax.Array) -> jax.Array:
        if input.ndim != 2:
            raise ValueError(f"input must be 2D, got shape {tuple(input.shape)}.")
        weight = self.weight
        if self.weight_dtype == "int4":
            weight = unpack_int4_rows(weight)  # (N, K)
        if self.trans_weight:
            weight = weight.T  # (K, N)
        # int8 x int8 with int32 accumulation on the MXU.
        out = jax.lax.dot_general(
            input.astype(jnp.int8),
            weight.astype(jnp.int8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

        input_scale = input_scale.astype(jnp.float32)
        if input_scale.ndim == 1:
            input_scale = input_scale[:, None]
        weight_scale = self.weight_scale.astype(jnp.float32)[None, :]
        out = out * input_scale * weight_scale
        return out.astype(self.output_dtype)

    def extra_repr(self) -> str:
        return (
            f"in_features={self.in_features}, out_features={self.out_features}, "
            f"output_dtype={self.output_dtype}, trans_weight={self.trans_weight}, "
            f"quant_dtype={self.quant_dtype}, weight_dtype={self.weight_dtype}"
        )
