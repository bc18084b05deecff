"""Sage (quantized Q/K) paged prefill attention.

Parity: reference mojo_opset/experimental/operators/attention.py:1641-1840
(MojoPagedPrefillSageGQA): Q is dynamically quantized per (head, token)
with scale ``(Hq, T)``, K per (block, head, position) with scale
``(N_blocks, Hkv, bs)``, V statically per channel ``(Hkv, D)``; the
unnormalized exp-scores are re-quantized to int8 before the PV matmul.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.attention import (
    assert_paged_prefill_contract,
    seq_lens_from_cu,
)

NEG_INF = float("-inf")


class MojoPagedPrefillSageGQA(MojoOperator):
    def __init__(
        self,
        is_causal: bool = True,
        gqa_layout: str = "AABB",
        query_dtype=jnp.int8,
        context_dtype=jnp.int8,
        compute_dtype=jnp.int8,
    ):
        super().__init__()
        if gqa_layout not in ("ABAB", "AABB"):
            raise ValueError(f"gqa_layout must be one of ['ABAB', 'AABB'], got {gqa_layout}")
        self.is_causal = is_causal
        self.gqa_layout = gqa_layout
        self.query_dtype = jnp.dtype(query_dtype)
        self.context_dtype = jnp.dtype(context_dtype)
        self.compute_dtype = jnp.dtype(compute_dtype)
        assert self.query_dtype == jnp.int8
        assert self.context_dtype == jnp.int8
        assert self.compute_dtype == jnp.int8
        self.qmax, self.qmin = 127.0, -128.0

    def forward(
        self,
        query: jax.Array,  # (T, Hq, D) int8
        query_scale: jax.Array,  # (Hq, T) fp32
        key_cache: jax.Array,  # (N, Hkv, bs, D) int8
        key_scale: jax.Array,  # (N, Hkv, bs) fp32
        value_cache: jax.Array,  # (N, Hkv, bs, D) int8
        value_scale: jax.Array,  # (Hkv, D) fp32
        cu_q_lens: jax.Array,
        block_tables: jax.Array,
        softmax_scale: Optional[float] = None,
        cu_total_seq_lens: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        max_q_len: Optional[int] = None,
        max_total_seq_len: Optional[int] = None,
    ) -> jax.Array:
        assert_paged_prefill_contract(cu_q_lens, block_tables, cu_total_seq_lens)
        T, Hq, D = query.shape
        N, Hkv, bs, _ = key_cache.shape
        group = Hq // Hkv
        assert query_scale.shape == (Hq, T)
        assert key_scale.shape == (N, Hkv, bs)
        assert value_scale.shape == (Hkv, D)
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

        # gather dense K/V + per-token K scales per batch
        bt = jnp.clip(block_tables, 0, N - 1)
        k_g = key_cache[bt]  # (B, NB, Hkv, bs, D)
        ks_g = key_scale[bt]  # (B, NB, Hkv, bs)
        v_g = value_cache[bt]
        NB = bt.shape[1]
        k_dense = jnp.swapaxes(k_g, 2, 3).reshape(B, NB * bs, Hkv, D)
        ks_dense = jnp.swapaxes(ks_g, 2, 3).reshape(B, NB * bs, Hkv)
        v_dense = jnp.swapaxes(v_g, 2, 3).reshape(B, NB * bs, Hkv, D)

        def expand(x, axis):
            if group == 1:
                return x
            return (
                jnp.repeat(x, group, axis=axis)
                if self.gqa_layout == "AABB"
                else jnp.tile(x, (1,) * axis + (group,) + (1,) * (x.ndim - axis - 1))
            )

        k_dense = expand(k_dense, 2)
        ks_dense = expand(ks_dense, 2)
        v_dense = expand(v_dense, 2)
        v_scale = expand(value_scale[None], 1)[0]  # (Hq, D)
        K = k_dense.shape[1]

        k_t = k_dense[token_batch]  # (T, K, Hq, D)
        ks_t = ks_dense[token_batch]  # (T, K, Hq)
        v_t = v_dense[token_batch]

        scores = jnp.einsum(
            "thd,tkhd->thk", query.astype(jnp.float32), k_t.astype(jnp.float32)
        ) * softmax_scale
        q_sc = query_scale.T  # (T, Hq)
        scores = scores * q_sc[:, :, None] * jnp.swapaxes(ks_t, 1, 2)

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
        scores = jnp.where(keep[:, None, :], scores, NEG_INF)

        # Sage: quantize the unnormalized exp-scores to int levels
        m = jnp.max(scores, axis=-1, keepdims=True)
        m = jnp.where(jnp.isneginf(m), 0.0, m)
        p = jnp.exp(scores - m)
        p_quant = jnp.round(p * self.qmax)
        p_scale = 1.0 / self.qmax
        denom = jnp.sum(p_quant, axis=-1, keepdims=True) * p_scale
        o = jnp.einsum("thk,tkhd->thd", p_quant, v_t.astype(jnp.float32))
        o = o * v_scale[None] * p_scale / jnp.maximum(denom, 1e-38)
        o = jnp.where((kv_len_t > 0)[:, None, None], o, 0.0)
        return o.astype(jnp.bfloat16)

    def extra_repr(self) -> str:
        return (
            f"is_causal={self.is_causal}, gqa_layout={self.gqa_layout}, "
            f"query_dtype={self.query_dtype}, context_dtype={self.context_dtype}, "
            f"compute_dtype={self.compute_dtype}"
        )
