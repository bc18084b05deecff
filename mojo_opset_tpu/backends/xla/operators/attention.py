"""XLA-tier attention: flash-style lax.scan implementations.

These are the jittable, memory-efficient counterparts of the golden ops in
core/operators/attention.py — they stream the KV in logical-block chunks
with an online-softmax carry instead of materializing full score matrices
(replacing the reference TTX Triton flash kernels,
backends/ttx/kernels/npu/a2/flash_attention.py, with XLA-fused scans; the
Pallas tier supersedes these on TPU for the hot paths).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operators.attention import (
    MojoPagedDecodeGQA,
    MojoPagedPrefillGQA,
    MojoSWA,
    expand_gqa,
    seq_lens_from_cu,
)

_NEG = -1e30


def _paged_prefill_flash(
    query,  # (T, Hq, D)
    key_cache,  # (N, Hkv, bs, D)
    value_cache,
    cu_q_lens,  # (B+1,)
    block_tables,  # (B, NB)
    softmax_scale: float,
    kv_lens,  # (B,)
    q_abs,  # (T,) absolute kv position of each query row (causal bound)
    gqa_layout: str,
    kv_layout: str = "HND",
):
    from mojo_opset_tpu.core.operators.attention import paged_cache_dims

    T, Hq, D = query.shape
    _, Hkv, bs, _ = paged_cache_dims(key_cache, kv_layout)
    group = Hq // Hkv
    B, NB = block_tables.shape

    token_ids = jnp.arange(T, dtype=jnp.int32)
    token_batch = jnp.clip(
        jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1, 0, B - 1
    )
    kv_len_t = kv_lens[token_batch]

    q = query.astype(jnp.float32) * softmax_scale

    def body(carry, logical_block):
        m, l, acc = carry
        # Each token reads logical block `logical_block` of its own batch.
        phys = block_tables[token_batch, logical_block]  # (T,)
        safe = jnp.clip(phys, 0, key_cache.shape[0] - 1)
        k_blk = key_cache[safe]
        v_blk = value_cache[safe]
        if kv_layout == "NHD":  # (T, bs, Hkv, D) -> (T, Hkv, bs, D)
            k_blk = jnp.swapaxes(k_blk, 1, 2)
            v_blk = jnp.swapaxes(v_blk, 1, 2)
        k_blk = expand_gqa(k_blk, group, gqa_layout, head_axis=1)  # (T, Hq, bs, D)
        v_blk = expand_gqa(v_blk, group, gqa_layout, head_axis=1)

        s = jnp.einsum("thd,thsd->ths", q, k_blk.astype(jnp.float32))  # (T, Hq, bs)
        kv_pos = logical_block * bs + jnp.arange(bs, dtype=jnp.int32)  # (bs,)
        keep = (kv_pos[None, :] < kv_len_t[:, None]) & (kv_pos[None, :] <= q_abs[:, None])
        keep = keep & (phys >= 0)[:, None]
        s = jnp.where(keep[:, None, :], s, _NEG)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))  # (T, Hq)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        p = jnp.where(keep[:, None, :], p, 0.0)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum("ths,thsd->thd", p, v_blk.astype(jnp.float32))
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((T, Hq), _NEG, jnp.float32)
    l0 = jnp.zeros((T, Hq), jnp.float32)
    acc0 = jnp.zeros((T, Hq, D), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(NB, dtype=jnp.int32))
    out = acc / jnp.maximum(l, 1e-38)[..., None]
    out = jnp.where((kv_len_t > 0)[:, None, None], out, 0.0)
    return out.astype(query.dtype)


class XlaPagedPrefillGQA(MojoPagedPrefillGQA):
    """Flash paged prefill: scans logical KV blocks with an online-softmax
    carry; O(T * Hq * block_size) live memory per step."""

    def forward(
        self,
        query: jax.Array,
        key_cache: jax.Array,
        value_cache: jax.Array,
        cu_q_lens: jax.Array,
        block_tables: jax.Array,
        softmax_scale: Optional[float] = None,
        cu_total_seq_lens: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        max_q_len: Optional[int] = None,
        max_total_seq_len: Optional[int] = None,
    ) -> jax.Array:
        if not self.is_causal or mask is not None:
            # custom-mask path: fall back to the golden dense computation
            return MojoPagedPrefillGQA.forward(
                self, query, key_cache, value_cache, cu_q_lens, block_tables,
                softmax_scale, cu_total_seq_lens, mask, max_q_len, max_total_seq_len,
            )
        T, Hq, D = query.shape
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)
        q_lens = seq_lens_from_cu(cu_q_lens)
        kv_lens = q_lens if cu_total_seq_lens is None else seq_lens_from_cu(cu_total_seq_lens)

        token_ids = jnp.arange(T, dtype=jnp.int32)
        B = q_lens.shape[0]
        token_batch = jnp.clip(
            jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1, 0, B - 1
        )
        q_pos = token_ids - cu_q_lens[token_batch]
        q_abs = kv_lens[token_batch] - q_lens[token_batch] + q_pos

        return _paged_prefill_flash(
            query, key_cache, value_cache, cu_q_lens, block_tables,
            softmax_scale, kv_lens, q_abs, self.gqa_layout, self.kv_layout,
        )


class XlaPagedDecodeGQA(MojoPagedDecodeGQA):
    """Vectorized paged decode; identical math to the golden but gathers
    KV blocks batch-major and keeps the score matrix (B, Hq, K) — small for
    decode — so XLA fuses it into two MXU calls plus a fused softmax."""

    def forward(
        self,
        query: jax.Array,
        key_cache: jax.Array,
        value_cache: jax.Array,
        total_seq_lens: jax.Array,
        block_tables: jax.Array,
        softmax_scale: Optional[float] = None,
        mask: Optional[jax.Array] = None,
        *,
        max_total_seq_len: Optional[int] = None,
    ) -> jax.Array:
        return MojoPagedDecodeGQA.forward(
            self, query, key_cache, value_cache, total_seq_lens, block_tables,
            softmax_scale, mask, max_total_seq_len=max_total_seq_len,
        )


class XlaSWA(MojoSWA):
    """Flash-style chunked SWA over the packed KV axis.

    The golden materializes the full (T, Hq, Tk) score tensor; this tier
    scans fixed-size chunks of the packed KV with an online-softmax carry,
    so peak memory is (T, Hq, C) and the QK/PV matmuls stay large and
    fused.  Semantics identical (causal ∧ (local ∨ global) window per
    batch), ~5x faster at the reference SWA shapes.
    """

    CHUNK = 256

    def forward(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        cu_q_lens: jax.Array,
        cu_total_seq_lens: jax.Array,
        softmax_scale=None,
    ) -> jax.Array:
        import math

        from mojo_opset_tpu.core.operators.attention import (
            expand_gqa,
            seq_lens_from_cu,
            window_mask_rows,
        )

        assert cu_q_lens.dtype == jnp.int32 and cu_total_seq_lens.dtype == jnp.int32
        T, Hq, D = query.shape
        Tk, Hkv, _ = key.shape
        group = Hq // Hkv
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)

        q_lens = seq_lens_from_cu(cu_q_lens)
        kv_lens = seq_lens_from_cu(cu_total_seq_lens)
        B = q_lens.shape[0]

        token_ids = jnp.arange(T, dtype=jnp.int32)
        token_batch = jnp.clip(
            jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1, 0, B - 1
        )
        q_pos = token_ids - cu_q_lens[token_batch]
        q_abs = kv_lens[token_batch] - q_lens[token_batch] + q_pos

        k_ids = jnp.arange(Tk, dtype=jnp.int32)
        k_batch = jnp.clip(
            jnp.searchsorted(cu_total_seq_lens, k_ids, side="right").astype(jnp.int32) - 1, 0, B - 1
        )
        k_pos = k_ids - cu_total_seq_lens[k_batch]

        C = min(self.CHUNK, Tk)
        n_chunks = -(-Tk // C)
        pad = n_chunks * C - Tk
        kx = expand_gqa(key, group, self.gqa_layout, head_axis=1)
        vx = expand_gqa(value, group, self.gqa_layout, head_axis=1)
        if pad:
            kx = jnp.pad(kx, ((0, pad), (0, 0), (0, 0)))
            vx = jnp.pad(vx, ((0, pad), (0, 0), (0, 0)))
            k_batch = jnp.pad(k_batch, (0, pad), constant_values=-1)
            k_pos = jnp.pad(k_pos, (0, pad), constant_values=-1)

        q = query.astype(jnp.float32) * softmax_scale
        kx = kx.reshape(n_chunks, C, Hq, D)
        vx = vx.reshape(n_chunks, C, Hq, D)
        k_batch = k_batch.reshape(n_chunks, C)
        k_pos = k_pos.reshape(n_chunks, C)

        def body(carry, chunk):
            m, l, acc = carry
            kc, vc, kb, kp = chunk
            s = jnp.einsum("thd,chd->thc", q, kc.astype(jnp.float32))  # (T, Hq, C)
            same = token_batch[:, None] == kb[None, :]
            if self.is_causal:
                win = window_mask_rows(
                    q_abs[:, None], kp[None, :],
                    self.local_window_size, self.global_window_size,
                )[:, 0, :]
                keep = same & win & (kb >= 0)[None, :]
            else:
                keep = same & (kb >= 0)[None, :]
            s = jnp.where(keep[:, None, :], s, _NEG)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.where(keep[:, None, :], jnp.exp(s - m_new[..., None]), 0.0)
            l_new = l * alpha + jnp.sum(p, axis=-1)
            acc_new = acc * alpha[..., None] + jnp.einsum(
                "thc,chd->thd", p, vc.astype(jnp.float32)
            )
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((T, Hq), _NEG, jnp.float32)
        l0 = jnp.zeros((T, Hq), jnp.float32)
        acc0 = jnp.zeros((T, Hq, D), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), (kx, vx, k_batch, k_pos))
        out = acc / jnp.maximum(l, 1e-38)[..., None]
        out = jnp.where((l > 0)[..., None], out, 0.0)
        return out.astype(query.dtype)
