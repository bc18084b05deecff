"""Attention over int8-quantized KV caches (dequant fused in).

Parity: reference mojo_opset/experimental/operators/attention.py:461-1152
(MojoPagedPrefillGQAWithKVDequant :461, MojoPagedDecodeGQAWithKVDequant
:635, MojoPagedPrefillSWAWithKVDequant :803, MojoPagedDecodeSWAWithKVDequant
:985) plus the multi-token decode MojoPagedDecodeNstepSWA :1154.

The caches hold int8 K/V with per-channel scales ``(Hkv, D)``; dequant
happens inside the forward.  ``compute_dtype=int8`` re-quantizes Q (scaled
by the key scale) and the probabilities so both matmuls run int8 on the
MXU (reference :605-620) — the TPU analogue of Sage-style quant attention.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.attention import (
    assert_paged_decode_contract,
    assert_paged_prefill_contract,
    expand_gqa,
    gather_paged_kv,
    masked_softmax,
    seq_lens_from_cu,
    window_mask_rows,
)

NEG_INF = float("-inf")


def dynamic_quantize(tensor: jax.Array, qmax: float, qmin: float, quant_dtype):
    """Per-last-dim symmetric dynamic quant (reference attention.py:441-450)."""
    amax = jnp.clip(jnp.max(jnp.abs(tensor), axis=-1, keepdims=True), min=1e-12)
    scale = amax / qmax
    scale = jnp.where(scale < 1e-6, 1.0, scale)
    q = jnp.clip(jnp.round(tensor / scale), qmin, qmax).astype(quant_dtype)
    return q, scale


class _KVDequantConfig:
    def _init_dequant(self, is_causal, gqa_layout, query_dtype, context_dtype, compute_dtype):
        if gqa_layout not in ("ABAB", "AABB"):
            raise ValueError(f"gqa_layout must be one of ['ABAB', 'AABB'], got {gqa_layout}")
        self.is_causal = is_causal
        self.gqa_layout = gqa_layout
        self.query_dtype = jnp.dtype(query_dtype)
        self.context_dtype = jnp.dtype(context_dtype)
        self.compute_dtype = jnp.dtype(compute_dtype)
        if self.query_dtype == jnp.int8:
            raise NotImplementedError("Quantized query is not implemented")
        assert self.context_dtype == jnp.int8, (
            f"Quant attention supports int8 context only, got {self.context_dtype}"
        )
        self.qmax, self.qmin = 127.0, -128.0

    def _expand_scales(self, key_scale, value_scale, num_q_heads, num_kv_heads):
        # single source of truth for the AABB/ABAB head expansion
        g = num_q_heads // num_kv_heads if num_q_heads != num_kv_heads else 1
        return (
            expand_gqa(key_scale, g, self.gqa_layout, 0),
            expand_gqa(value_scale, g, self.gqa_layout, 0),
        )

    def _scores(self, q, k_exp, key_scale, softmax_scale):
        """q (R, Hq, D) fp; k_exp (R?, K, Hq, D) int8; key_scale (Hq, D)."""
        if self.compute_dtype == jnp.int8:
            q_scaled = q.astype(jnp.float32) * key_scale.astype(jnp.float32)
            q_quant, q_scale = dynamic_quantize(q_scaled, self.qmax, self.qmin, jnp.int8)
            s = jnp.einsum(
                "...hd,...khd->...hk", q_quant.astype(jnp.float32), k_exp.astype(jnp.float32)
            )
            return s * q_scale * softmax_scale
        k_deq = k_exp.astype(jnp.float32) * key_scale.astype(jnp.float32)
        return jnp.einsum("...hd,...khd->...hk", q.astype(jnp.float32), k_deq) * softmax_scale

    def _pv(self, probs, v_exp, value_scale):
        """probs (..., Hq, K); v_exp (..., K, Hq, D) int8; value_scale (Hq, D)."""
        if self.compute_dtype == jnp.int8:
            p_quant, p_scale = dynamic_quantize(
                probs.astype(jnp.float32), self.qmax, self.qmin, jnp.int8
            )
            o = jnp.einsum(
                "...hk,...khd->...hd", p_quant.astype(jnp.float32), v_exp.astype(jnp.float32)
            )
            return o * p_scale * value_scale.astype(jnp.float32)
        v_deq = v_exp.astype(jnp.float32) * value_scale.astype(jnp.float32)
        return jnp.einsum("...hk,...khd->...hd", probs.astype(jnp.float32), v_deq)

    def extra_repr(self) -> str:
        return (
            f"is_causal={self.is_causal}, gqa_layout={self.gqa_layout}, "
            f"query_dtype={self.query_dtype}, context_dtype={self.context_dtype}, "
            f"compute_dtype={self.compute_dtype}"
        )


class MojoPagedDecodeGQAWithKVDequant(_KVDequantConfig, MojoOperator):
    def __init__(
        self, is_causal: bool = True, gqa_layout: str = "AABB",
        query_dtype=jnp.bfloat16, context_dtype=jnp.int8, compute_dtype=jnp.bfloat16,
    ):
        super().__init__()
        self._init_dequant(is_causal, gqa_layout, query_dtype, context_dtype, compute_dtype)

    def forward(
        self,
        query: jax.Array,  # (B, Hq, D)
        query_scale: Optional[jax.Array],
        key_cache: jax.Array,  # (N, Hkv, bs, D) int8
        key_scale: jax.Array,  # (Hkv, D)
        value_cache: jax.Array,
        value_scale: jax.Array,
        total_seq_lens: jax.Array,
        block_tables: jax.Array,
        softmax_scale: Optional[float] = None,
        mask: Optional[jax.Array] = None,
        *,
        max_total_seq_len: Optional[int] = None,
    ) -> jax.Array:
        assert_paged_decode_contract(block_tables, total_seq_lens)
        assert query_scale is None, "query_scale must be None for non-quantized query"
        B, Hq, D = query.shape
        Hkv = key_cache.shape[1]
        group = Hq // Hkv
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)

        key_scale, value_scale = self._expand_scales(key_scale, value_scale, Hq, Hkv)
        k = expand_gqa(gather_paged_kv(key_cache, block_tables), group, self.gqa_layout, 2)
        v = expand_gqa(gather_paged_kv(value_cache, block_tables), group, self.gqa_layout, 2)
        K = k.shape[1]

        scores = self._scores(query, k, key_scale, softmax_scale)
        valid = jnp.arange(K)[None, None, :] < total_seq_lens[:, None, None]
        if not self.is_causal and mask is not None:
            # same contract as MojoPagedDecodeGQA: row `seq_len` of the
            # (possibly per-batch) mask, True = mask OUT (reference
            # attention.py:790)
            if mask.ndim == 2:
                rows = mask[jnp.clip(total_seq_lens, 0, mask.shape[0] - 1)]
            else:
                rows = jnp.take_along_axis(
                    mask, jnp.clip(total_seq_lens, 0, mask.shape[1] - 1)[:, None, None], axis=1
                )[:, 0, :]
            pad = K - rows.shape[-1]
            if pad > 0:
                rows = jnp.pad(rows, ((0, 0), (0, pad)))
            valid = valid & ~rows[:, None, :K].astype(bool)
        probs = masked_softmax(scores, valid, query.dtype)
        out = self._pv(probs, v, value_scale)
        out = jnp.where((total_seq_lens > 0)[:, None, None], out, 0)
        return out.astype(query.dtype)


class MojoPagedPrefillGQAWithKVDequant(_KVDequantConfig, MojoOperator):
    def __init__(
        self, is_causal: bool = True, gqa_layout: str = "AABB",
        query_dtype=jnp.bfloat16, context_dtype=jnp.int8, compute_dtype=jnp.bfloat16,
    ):
        super().__init__()
        self._init_dequant(is_causal, gqa_layout, query_dtype, context_dtype, compute_dtype)

    def forward(
        self,
        query: jax.Array,  # (T, Hq, D)
        query_scale: Optional[jax.Array],
        key_cache: jax.Array,
        key_scale: jax.Array,
        value_cache: jax.Array,
        value_scale: jax.Array,
        cu_q_lens: jax.Array,
        block_tables: jax.Array,
        softmax_scale: Optional[float] = None,
        cu_total_seq_lens: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        max_q_len: Optional[int] = None,
        max_total_seq_len: Optional[int] = None,
    ) -> jax.Array:
        assert_paged_prefill_contract(cu_q_lens, block_tables, cu_total_seq_lens)
        assert query_scale is None, "query_scale must be None for non-quantized query"
        T, Hq, D = query.shape
        Hkv = key_cache.shape[1]
        group = Hq // Hkv
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)

        q_lens = seq_lens_from_cu(cu_q_lens)
        kv_lens = q_lens if cu_total_seq_lens is None else seq_lens_from_cu(cu_total_seq_lens)
        B = q_lens.shape[0]
        token_ids = jnp.arange(T, dtype=jnp.int32)
        token_batch = jnp.clip(
            jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1, 0, B - 1
        )
        q_pos = token_ids - cu_q_lens[token_batch]
        kv_len_t = kv_lens[token_batch]
        q_abs = kv_len_t - q_lens[token_batch] + q_pos

        key_scale, value_scale = self._expand_scales(key_scale, value_scale, Hq, Hkv)
        k_all = expand_gqa(gather_paged_kv(key_cache, block_tables), group, self.gqa_layout, 2)
        v_all = expand_gqa(gather_paged_kv(value_cache, block_tables), group, self.gqa_layout, 2)
        K = k_all.shape[1]
        k_t = k_all[token_batch]
        v_t = v_all[token_batch]

        scores = self._scores(query, k_t, key_scale, softmax_scale)
        kv_pos = jnp.arange(K, dtype=jnp.int32)[None, :]
        keep = kv_pos < kv_len_t[:, None]
        if self.is_causal:
            keep = keep & (kv_pos <= q_abs[:, None])
        elif mask is not None:
            rows = (
                mask[jnp.clip(q_abs, 0, mask.shape[0] - 1)]
                if mask.ndim == 2
                else mask[token_batch, jnp.clip(q_abs, 0, mask.shape[1] - 1)]
            )
            pad = K - rows.shape[-1]
            if pad > 0:
                rows = jnp.pad(rows, ((0, 0), (0, pad)))
            keep = keep & rows[:, :K].astype(bool)
        probs = masked_softmax(scores, keep[:, None, :], query.dtype)
        out = self._pv(probs, v_t, value_scale)
        out = jnp.where((kv_len_t > 0)[:, None, None], out, 0)
        return out.astype(query.dtype)


class _SWADequantMixin(_KVDequantConfig):
    def _init_swa(self, global_window_size, local_window_size):
        self.global_window_size = global_window_size
        self.local_window_size = local_window_size

    def extra_repr(self) -> str:
        return (
            super().extra_repr()
            + f", global_window_size={self.global_window_size}, local_window_size={self.local_window_size}"
        )


class MojoPagedDecodeSWAWithKVDequant(_SWADequantMixin, MojoOperator):
    def __init__(
        self, is_causal: bool = True, gqa_layout: str = "AABB",
        global_window_size: Optional[int] = None, local_window_size: Optional[int] = None,
        query_dtype=jnp.bfloat16, context_dtype=jnp.int8, compute_dtype=jnp.bfloat16,
    ):
        super().__init__()
        self._init_dequant(is_causal, gqa_layout, query_dtype, context_dtype, compute_dtype)
        self._init_swa(global_window_size, local_window_size)

    def forward(
        self, query, query_scale, key_cache, key_scale, value_cache, value_scale,
        total_seq_lens, block_table, softmax_scale=None, *, max_total_seq_len=None,
    ):
        assert_paged_decode_contract(block_table, total_seq_lens)
        assert query_scale is None, "query_scale must be None for non-quantized query"
        B, Hq, D = query.shape
        Hkv = key_cache.shape[1]
        group = Hq // Hkv
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)
        key_scale, value_scale = self._expand_scales(key_scale, value_scale, Hq, Hkv)
        k = expand_gqa(gather_paged_kv(key_cache, block_table), group, self.gqa_layout, 2)
        v = expand_gqa(gather_paged_kv(value_cache, block_table), group, self.gqa_layout, 2)
        K = k.shape[1]
        scores = self._scores(query, k, key_scale, softmax_scale)
        kv_pos = jnp.arange(K, dtype=jnp.int32)
        keep = kv_pos[None, :] < total_seq_lens[:, None]
        if self.is_causal:
            win = window_mask_rows(
                (total_seq_lens - 1)[:, None], kv_pos[None, :],
                self.local_window_size, self.global_window_size,
            )[:, 0, :]
            keep = keep & win
        probs = masked_softmax(scores, keep[:, None, :], query.dtype)
        out = self._pv(probs, v, value_scale)
        out = jnp.where((total_seq_lens > 0)[:, None, None], out, 0)
        return out.astype(query.dtype)


class MojoPagedPrefillSWAWithKVDequant(_SWADequantMixin, MojoOperator):
    def __init__(
        self, is_causal: bool = True, gqa_layout: str = "AABB",
        global_window_size: Optional[int] = None, local_window_size: Optional[int] = None,
        query_dtype=jnp.bfloat16, context_dtype=jnp.int8, compute_dtype=jnp.bfloat16,
    ):
        super().__init__()
        self._init_dequant(is_causal, gqa_layout, query_dtype, context_dtype, compute_dtype)
        self._init_swa(global_window_size, local_window_size)

    def forward(
        self, query, query_scale, key_cache, key_scale, value_cache, value_scale,
        cu_q_lens, block_table, softmax_scale=None, cu_total_seq_lens=None,
        *, max_q_len=None, max_total_seq_len=None,
    ):
        assert_paged_prefill_contract(cu_q_lens, block_table, cu_total_seq_lens)
        assert query_scale is None, "query_scale must be None for non-quantized query"
        T, Hq, D = query.shape
        Hkv = key_cache.shape[1]
        group = Hq // Hkv
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)
        q_lens = seq_lens_from_cu(cu_q_lens)
        kv_lens = q_lens if cu_total_seq_lens is None else seq_lens_from_cu(cu_total_seq_lens)
        B = q_lens.shape[0]
        token_ids = jnp.arange(T, dtype=jnp.int32)
        token_batch = jnp.clip(
            jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1, 0, B - 1
        )
        q_pos = token_ids - cu_q_lens[token_batch]
        kv_len_t = kv_lens[token_batch]
        q_abs = kv_len_t - q_lens[token_batch] + q_pos

        key_scale, value_scale = self._expand_scales(key_scale, value_scale, Hq, Hkv)
        k_all = expand_gqa(gather_paged_kv(key_cache, block_table), group, self.gqa_layout, 2)
        v_all = expand_gqa(gather_paged_kv(value_cache, block_table), group, self.gqa_layout, 2)
        K = k_all.shape[1]
        k_t = k_all[token_batch]
        v_t = v_all[token_batch]
        scores = self._scores(query, k_t, key_scale, softmax_scale)
        kv_pos = jnp.arange(K, dtype=jnp.int32)
        keep = kv_pos[None, :] < kv_len_t[:, None]
        if self.is_causal:
            win = window_mask_rows(
                q_abs[:, None], kv_pos[None, :], self.local_window_size, self.global_window_size
            )[:, 0, :]
            keep = keep & win
        probs = masked_softmax(scores, keep[:, None, :], query.dtype)
        out = self._pv(probs, v_t, value_scale)
        out = jnp.where((kv_len_t > 0)[:, None, None], out, 0)
        return out.astype(query.dtype)


class MojoPagedDecodeNstepSWA(MojoOperator):
    """Multi-token (speculative N-step) SWA decode: q (B, S, Hq, D).
    Reference attention.py:1154-1263."""

    def __init__(
        self, is_causal: bool = True, gqa_layout: str = "AABB",
        global_window_size: Optional[int] = None, local_window_size: Optional[int] = None,
    ):
        super().__init__()
        if gqa_layout not in ("ABAB", "AABB"):
            raise ValueError(f"gqa_layout must be one of ['ABAB', 'AABB'], got {gqa_layout}")
        self.is_causal = is_causal
        self.gqa_layout = gqa_layout
        self.global_window_size = global_window_size
        self.local_window_size = local_window_size

    def forward(
        self,
        query: jax.Array,  # (B, S, Hq, D)
        key_cache: jax.Array,
        value_cache: jax.Array,
        total_seq_lens: jax.Array,
        block_table: jax.Array,
        softmax_scale: Optional[float] = None,
        *,
        max_total_seq_len: Optional[int] = None,
    ) -> jax.Array:
        assert_paged_decode_contract(block_table, total_seq_lens)
        assert query.ndim == 4, "NstepSWA expects 4D query [bsz, seq_len, Hq, D]"
        B, S, Hq, D = query.shape
        Hkv = key_cache.shape[1]
        group = Hq // Hkv
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)

        k = expand_gqa(gather_paged_kv(key_cache, block_table), group, self.gqa_layout, 2)
        v = expand_gqa(gather_paged_kv(value_cache, block_table), group, self.gqa_layout, 2)
        K = k.shape[1]
        scores = jnp.einsum(
            "bshd,bkhd->bhsk", query.astype(jnp.float32), k.astype(jnp.float32)
        ) * softmax_scale
        kv_pos = jnp.arange(K, dtype=jnp.int32)
        keep = jnp.broadcast_to(kv_pos[None, None, :] < total_seq_lens[:, None, None], (B, S, K))
        if self.is_causal:
            # reference window mask over the full (S, kv_len) grid; row s has
            # absolute kv position total_seq_len - S + s
            q_abs = total_seq_lens[:, None] - S + jnp.arange(S, dtype=jnp.int32)[None, :]
            win = window_mask_rows(
                q_abs, kv_pos[None, :], self.local_window_size, self.global_window_size
            )  # (B, S, K)
            keep = keep & win
        probs = masked_softmax(scores, keep[:, None, :, :], query.dtype)
        out = jnp.einsum("bhsk,bkhd->bshd", probs, v)
        out = jnp.where((total_seq_lens > 0)[:, None, None, None], out, 0)
        return out.astype(query.dtype)

    def extra_repr(self) -> str:
        return (
            f"is_causal={self.is_causal}, gqa_layout={self.gqa_layout}, "
            f"global_window_size={self.global_window_size}, "
            f"local_window_size={self.local_window_size}"
        )
