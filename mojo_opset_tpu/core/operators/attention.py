"""Core attention suite: dense/paged GQA prefill & decode, SDPA, SWA.

Parity: reference mojo_opset/core/operators/attention.py
(MojoDecodeGQA :44, MojoPagedDecodeGQA :113, MojoPrefillGQA :235,
MojoPagedPrefillGQA :315, MojoSdpa :456, window mask :507,
MojoPagedPrefillSWA :533, MojoPagedDecodeSWA :645, MojoSWA :747).

Shape contracts (identical to the reference):
  * paged caches: ``(n_blocks, n_kv_heads, block_size, head_dim)``
  * ``cu_q_lens`` / ``total_seq_lens`` / ``block_tables``: int32
  * GQA layouts: ``AABB`` (repeat_interleave) vs ``ABAB`` (tiled repeat)
  * softmax in fp32, probabilities cast back to the input dtype.

TPU notes: the golden implementations here are fully vectorized with
masking (no per-batch ``.item()`` loops) so they are jittable, at the cost
of materializing full score matrices; the ``xla`` tier provides
flash-style ``lax.scan`` variants and the ``pallas`` tier hand kernels.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator

NEG_INF = float("-inf")


def assert_paged_prefill_contract(cu_q_lens, block_tables, cu_total_seq_lens) -> None:
    assert cu_q_lens.dtype == jnp.int32
    assert block_tables.dtype == jnp.int32
    assert block_tables.ndim == 2
    assert block_tables.shape[0] == cu_q_lens.shape[0] - 1
    if cu_total_seq_lens is not None:
        assert cu_total_seq_lens.dtype == jnp.int32
        assert cu_total_seq_lens.ndim == 1
        assert cu_total_seq_lens.shape[0] == cu_q_lens.shape[0]


def assert_paged_decode_contract(block_tables, total_seq_lens) -> None:
    assert block_tables.dtype == jnp.int32
    assert total_seq_lens.dtype == jnp.int32
    assert block_tables.ndim == 2
    assert block_tables.shape[0] == total_seq_lens.shape[0]


def seq_lens_from_cu(cu_seqlens: jax.Array) -> jax.Array:
    return cu_seqlens[1:] - cu_seqlens[:-1]


def expand_gqa(kv: jax.Array, group: int, layout: str, head_axis: int) -> jax.Array:
    """Expand KV heads to match query heads.

    ``AABB`` repeats each head ``group`` times contiguously
    (repeat_interleave); ``ABAB`` tiles the whole head block.
    """
    if group == 1:
        return kv
    if layout == "AABB":
        return jnp.repeat(kv, group, axis=head_axis)
    reps = [1] * kv.ndim
    reps[head_axis] = group
    return jnp.tile(kv, reps)


KV_LAYOUTS = ("HND", "NHD")


def paged_cache_dims(cache: jax.Array, kv_layout: str = "HND"):
    """Normalize paged-cache dims to ``(N_blocks, Hkv, block_size, D)``.

    Two physical layouts are supported:

    - ``"HND"`` — ``(N_blocks, Hkv, block_size, D)``: the reference
      contract (reference core/operators/attention.py:12-37).
    - ``"NHD"`` — ``(N_blocks, block_size, Hkv, D)``: the TPU-native
      runtime layout. Token rows are contiguous, so the decode-store
      scatter hits only the two leading dims and XLA keeps the update
      in place inside jitted loops; the reference layout's scatter
      across a middle dim forces a full-cache copy per step (measured:
      48 x 67 MB copies per decode step on an 8-layer model).
    """
    if kv_layout == "HND":
        n, hkv, bs, d = cache.shape
    elif kv_layout == "NHD":
        n, bs, hkv, d = cache.shape
    else:
        raise ValueError(f"kv_layout must be one of {KV_LAYOUTS}, got {kv_layout}")
    return n, hkv, bs, d


def gather_paged_kv(
    cache: jax.Array, block_tables: jax.Array, kv_layout: str = "HND"
) -> jax.Array:
    """Gather a paged cache into dense per-sequence KV.

    cache (``HND`` or ``NHD`` layout, see :func:`paged_cache_dims`) +
    block_tables ``(B, NB)`` -> ``(B, NB*bs, Hkv, D)`` (invalid block ids
    are clamped; callers mask by sequence length).
    """
    bt = jnp.clip(block_tables, 0, cache.shape[0] - 1)
    gathered = cache[bt]  # (B, NB, ...) in cache layout
    if kv_layout == "HND":
        gathered = jnp.swapaxes(gathered, 2, 3)  # (B, NB, bs, Hkv, D)
    b, nb, bs, hkv, d = gathered.shape
    return gathered.reshape(b, nb * bs, hkv, d)


def window_mask_rows(
    q_abs: jax.Array,
    kv_positions: jax.Array,
    local_window_size: Optional[int],
    global_window_size: Optional[int],
) -> jax.Array:
    """Vectorized sliding/global window mask (True = attend).

    Equivalent to the reference ``_generate_window_mask``
    (attention.py:507-531): causal AND (local-window OR global-window)
    when either window is set, else plain causal.  ``q_abs`` is the
    absolute kv-position of each query row.
    """
    causal = q_abs[..., :, None] >= kv_positions[..., None, :]
    if local_window_size is None and global_window_size is None:
        return causal
    local = (
        q_abs[..., :, None] <= kv_positions[..., None, :] + local_window_size
        if local_window_size is not None
        else jnp.zeros_like(causal)
    )
    glob = (
        jnp.broadcast_to((kv_positions < global_window_size)[..., None, :], causal.shape)
        if global_window_size is not None
        else jnp.zeros_like(causal)
    )
    return causal & (local | glob)


def masked_softmax(scores: jax.Array, mask: jax.Array, out_dtype) -> jax.Array:
    """fp32 softmax over the last axis with boolean keep-mask; fully-masked
    rows produce zeros (matching the reference's zero-init outputs)."""
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    probs = jnp.where(denom > 0, p / jnp.maximum(denom, 1e-38), 0.0)
    return probs.astype(out_dtype)


class MojoDecodeGQA(MojoOperator):
    """Non-paged GQA decode attention (one query token per batch).
    q (B,Hq,D), dense k/v (B,Hkv,S,D). Reference attention.py:44-110."""

    def __init__(self, is_causal: bool = True, gqa_layout: str = "AABB"):
        super().__init__()
        if gqa_layout not in ("ABAB", "AABB"):
            raise ValueError(f"gqa_layout must be 'ABAB' or 'AABB', got {gqa_layout}")
        self.is_causal = is_causal
        self.gqa_layout = gqa_layout

    def forward(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        total_seq_lens: Optional[jax.Array] = None,
        softmax_scale: Optional[float] = None,
    ) -> jax.Array:
        B, Hq, D = query.shape
        _, Hkv, S, _ = key.shape
        group = Hq // Hkv
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)

        k = expand_gqa(key, group, self.gqa_layout, head_axis=1)
        v = expand_gqa(value, group, self.gqa_layout, head_axis=1)

        scores = jnp.einsum("bhd,bhsd->bhs", query.astype(jnp.float32), k.astype(jnp.float32))
        scores = scores * softmax_scale
        if total_seq_lens is not None:
            valid = jnp.arange(S)[None, None, :] < total_seq_lens[:, None, None]
        else:
            valid = jnp.ones_like(scores, dtype=bool)
        probs = masked_softmax(scores, valid, query.dtype)
        out = jnp.einsum("bhs,bhsd->bhd", probs, v)
        if total_seq_lens is not None:
            out = jnp.where((total_seq_lens > 0)[:, None, None], out, 0)
        return out.astype(query.dtype)

    def extra_repr(self) -> str:
        return f"is_causal={self.is_causal}, gqa_layout={self.gqa_layout}"


class MojoPagedDecodeGQA(MojoOperator):
    """Paged decode GQA over a blocked KV cache.
    Reference attention.py:113-232."""

    def __init__(
        self, is_causal: bool = True, gqa_layout: str = "AABB", kv_layout: str = "HND"
    ):
        super().__init__()
        if gqa_layout not in ("ABAB", "AABB"):
            raise ValueError(f"gqa_layout must be one of ['ABAB', 'AABB'], got {gqa_layout}")
        if kv_layout not in KV_LAYOUTS:
            raise ValueError(f"kv_layout must be one of {KV_LAYOUTS}, got {kv_layout}")
        self.is_causal = is_causal
        self.gqa_layout = gqa_layout
        self.kv_layout = kv_layout

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
        assert_paged_decode_contract(block_tables, total_seq_lens)
        B, Hq, D = query.shape
        _, Hkv, block_size, _ = paged_cache_dims(key_cache, self.kv_layout)
        group = Hq // Hkv
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)

        k = gather_paged_kv(key_cache, block_tables, self.kv_layout)  # (B, K, Hkv, D)
        v = gather_paged_kv(value_cache, block_tables, self.kv_layout)
        k = expand_gqa(k, group, self.gqa_layout, head_axis=2)
        v = expand_gqa(v, group, self.gqa_layout, head_axis=2)
        K = k.shape[1]

        scores = jnp.einsum("bhd,bkhd->bhk", query.astype(jnp.float32), k.astype(jnp.float32))
        scores = scores * softmax_scale
        valid = jnp.arange(K)[None, None, :] < total_seq_lens[:, None, None]

        if not self.is_causal and mask is not None:
            # Decode: row `seq_len` of the (possibly per-batch) mask; True
            # means "mask out" here (reference attention.py:219-225).
            # NOTE: the reference's decode and prefill mask contracts
            # deliberately DIFFER and we mirror both bug-for-bug — prefill
            # reads rows [kv_len-q_len, kv_len) with True = KEEP
            # (reference attention.py:429-435), decode reads row kv_len
            # (not kv_len-1) with True = EXCLUDE. A mask authored for one
            # op is not interchangeable with the other.
            if mask.ndim == 2:
                rows = mask[jnp.clip(total_seq_lens, 0, mask.shape[0] - 1)]  # (B, Tm)
            else:
                rows = jnp.take_along_axis(
                    mask, jnp.clip(total_seq_lens, 0, mask.shape[1] - 1)[:, None, None], axis=1
                )[:, 0, :]
            pad = K - rows.shape[-1]
            if pad > 0:
                rows = jnp.pad(rows, ((0, 0), (0, pad)))
            valid = valid & ~rows[:, None, :K].astype(bool)

        probs = masked_softmax(scores, valid, query.dtype)
        out = jnp.einsum("bhk,bkhd->bhd", probs, v)
        out = jnp.where((total_seq_lens > 0)[:, None, None], out, 0)
        return out.astype(query.dtype)

    def extra_repr(self) -> str:
        return f"is_causal={self.is_causal}, gqa_layout={self.gqa_layout}"


class MojoPrefillGQA(MojoOperator):
    """Padded dense causal GQA prefill: q (B,Hq,S,D), k/v (B,Hkv,S,D) ->
    out (B,S,Hq,D). Reference attention.py:235-312."""

    def __init__(self, is_causal: bool = True, gqa_layout: str = "ABAB"):
        super().__init__()
        self.is_causal = is_causal
        self.gqa_layout = gqa_layout

    def forward(
        self,
        query: jax.Array,
        k_cache: jax.Array,
        v_cache: jax.Array,
        cu_q_lens: jax.Array,
        softmax_scale: Optional[float] = None,
    ) -> jax.Array:
        assert cu_q_lens.dtype == jnp.int32
        B, Hq, S, D = query.shape
        Hkv = k_cache.shape[1]
        group = Hq // Hkv
        if not self.is_causal:
            raise NotImplementedError

        k = expand_gqa(k_cache, group, self.gqa_layout, head_axis=1)
        v = expand_gqa(v_cache, group, self.gqa_layout, head_axis=1)

        scores = jnp.einsum("bhqd,bhkd->bhqk", query.astype(jnp.float32), k.astype(jnp.float32))
        scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(D)
        scores = scores * scale
        causal = jnp.tril(jnp.ones((S, S), dtype=bool))
        probs = masked_softmax(scores, causal[None, None], query.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return jnp.swapaxes(out, 1, 2).astype(query.dtype)  # (B, S, Hq, D)


class MojoPagedPrefillGQA(MojoOperator):
    """Varlen paged prefill GQA: q (T,Hq,D) + cu_q_lens + paged cache.
    Supports chunked prefill via ``cu_total_seq_lens`` and custom masks.
    Reference attention.py:315-451."""

    def __init__(
        self, is_causal: bool = True, gqa_layout: str = "AABB", kv_layout: str = "HND"
    ):
        super().__init__()
        if gqa_layout not in ("ABAB", "AABB"):
            raise ValueError(f"gqa_layout must be one of ['ABAB', 'AABB'], got {gqa_layout}")
        if kv_layout not in KV_LAYOUTS:
            raise ValueError(f"kv_layout must be one of {KV_LAYOUTS}, got {kv_layout}")
        self.is_causal = is_causal
        self.gqa_layout = gqa_layout
        self.kv_layout = kv_layout

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
        assert_paged_prefill_contract(cu_q_lens, block_tables, cu_total_seq_lens)
        T, Hq, D = query.shape
        _, Hkv, block_size, _ = paged_cache_dims(key_cache, self.kv_layout)
        group = Hq // Hkv
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)

        q_lens = seq_lens_from_cu(cu_q_lens)
        total_seq_lens = (
            q_lens if cu_total_seq_lens is None else seq_lens_from_cu(cu_total_seq_lens)
        )

        # token -> batch bookkeeping (vectorized varlen layout)
        token_ids = jnp.arange(T, dtype=jnp.int32)
        token_batch = jnp.clip(
            jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1,
            0,
            q_lens.shape[0] - 1,
        )
        q_pos = token_ids - cu_q_lens[token_batch]
        kv_len_t = total_seq_lens[token_batch]
        q_len_t = q_lens[token_batch]
        q_abs = kv_len_t - q_len_t + q_pos  # absolute kv position of each query row

        k_all = gather_paged_kv(key_cache, block_tables, self.kv_layout)  # (B, K, Hkv, D)
        v_all = gather_paged_kv(value_cache, block_tables, self.kv_layout)
        k_all = expand_gqa(k_all, group, self.gqa_layout, head_axis=2)
        v_all = expand_gqa(v_all, group, self.gqa_layout, head_axis=2)
        K = k_all.shape[1]

        k_t = k_all[token_batch]  # (T, K, Hq, D) — golden-tier memory tradeoff
        v_t = v_all[token_batch]

        scores = jnp.einsum("thd,tkhd->thk", query.astype(jnp.float32), k_t.astype(jnp.float32))
        scores = scores * softmax_scale

        kv_pos = jnp.arange(K, dtype=jnp.int32)[None, :]
        in_seq = kv_pos < kv_len_t[:, None]  # (T, K)
        if self.is_causal:
            keep = in_seq & (kv_pos <= q_abs[:, None])
        elif mask is not None:
            # Prefill: rows [kv_len-q_len, kv_len) of the mask; True means
            # KEEP here (reference attention.py:438-444).
            if mask.ndim == 2:
                rows = mask[jnp.clip(q_abs, 0, mask.shape[0] - 1)]  # (T, Tm)
            else:
                rows = mask[token_batch, jnp.clip(q_abs, 0, mask.shape[1] - 1)]
            pad = K - rows.shape[-1]
            if pad > 0:
                rows = jnp.pad(rows, ((0, 0), (0, pad)))
            keep = in_seq & rows[:, :K].astype(bool)
        else:
            keep = in_seq

        probs = masked_softmax(scores, keep[:, None, :], query.dtype)
        out = jnp.einsum("thk,tkhd->thd", probs, v_t)
        out = jnp.where((kv_len_t > 0)[:, None, None], out, 0)
        return out.astype(query.dtype)

    def extra_repr(self) -> str:
        return f"is_causal={self.is_causal}, gqa_layout={self.gqa_layout}"


class MojoSdpa(MojoOperator):
    """Plain SDPA wrapper (scale, enable_gqa, boolean-or-additive mask).
    Reference attention.py:456-504."""

    def __init__(self, scale: Optional[float] = None, enable_gqa: bool = False):
        super().__init__()
        self.scale = scale
        self.enable_gqa = enable_gqa

    def forward(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        D = query.shape[-1]
        scale = self.scale if self.scale is not None else 1.0 / math.sqrt(D)
        k, v = key, value
        if self.enable_gqa and query.shape[-3] != key.shape[-3]:
            group = query.shape[-3] // key.shape[-3]
            k = jnp.repeat(k, group, axis=-3)
            v = jnp.repeat(v, group, axis=-3)
        scores = (
            jnp.einsum("...qd,...kd->...qk", query.astype(jnp.float32), k.astype(jnp.float32))
            * scale
        )
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                scores = jnp.where(attn_mask, scores, NEG_INF)
            else:
                scores = scores + attn_mask.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(query.dtype)
        return jnp.einsum("...qk,...kd->...qd", probs, v).astype(query.dtype)

    def extra_repr(self) -> str:
        return f"scale={self.scale}, enable_gqa={self.enable_gqa}"


class _SWAConfigMixin:
    """Shared constructor/config for the SWA family (plain mixin — only the
    concrete classes below are dispatchable core ops)."""

    def __init__(
        self,
        is_causal: bool = True,
        gqa_layout: str = "AABB",
        global_window_size: Optional[int] = None,
        local_window_size: Optional[int] = None,
        kv_layout: str = "HND",
    ):
        super().__init__()
        if gqa_layout not in ("ABAB", "AABB"):
            raise ValueError(f"gqa_layout must be one of ['ABAB', 'AABB'], got {gqa_layout}")
        if kv_layout not in KV_LAYOUTS:
            raise ValueError(f"kv_layout must be one of {KV_LAYOUTS}, got {kv_layout}")
        self.is_causal = is_causal
        self.gqa_layout = gqa_layout
        self.global_window_size = global_window_size
        self.local_window_size = local_window_size
        self.kv_layout = kv_layout

    def extra_repr(self) -> str:
        return (
            f"is_causal={self.is_causal}, gqa_layout={self.gqa_layout}, "
            f"global_window_size={self.global_window_size}, "
            f"local_window_size={self.local_window_size}"
        )


class MojoPagedPrefillSWA(_SWAConfigMixin, MojoOperator):
    """Varlen paged prefill with sliding/global window masking.
    Reference attention.py:533-642."""

    def forward(
        self,
        query: jax.Array,
        key_cache: jax.Array,
        value_cache: jax.Array,
        cu_q_lens: jax.Array,
        block_table: jax.Array,
        softmax_scale: Optional[float] = None,
        cu_total_seq_lens: Optional[jax.Array] = None,
        *,
        max_q_len: Optional[int] = None,
        max_total_seq_len: Optional[int] = None,
    ) -> jax.Array:
        assert_paged_prefill_contract(cu_q_lens, block_table, cu_total_seq_lens)
        T, Hq, D = query.shape
        _, Hkv, page_size, _ = paged_cache_dims(key_cache, self.kv_layout)
        group = Hq // Hkv
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)

        q_lens = seq_lens_from_cu(cu_q_lens)
        total_seq_lens = (
            q_lens if cu_total_seq_lens is None else seq_lens_from_cu(cu_total_seq_lens)
        )
        token_ids = jnp.arange(T, dtype=jnp.int32)
        token_batch = jnp.clip(
            jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1,
            0,
            q_lens.shape[0] - 1,
        )
        q_pos = token_ids - cu_q_lens[token_batch]
        kv_len_t = total_seq_lens[token_batch]
        q_abs = kv_len_t - q_lens[token_batch] + q_pos

        k_all = expand_gqa(gather_paged_kv(key_cache, block_table, self.kv_layout), group, self.gqa_layout, 2)
        v_all = expand_gqa(gather_paged_kv(value_cache, block_table, self.kv_layout), group, self.gqa_layout, 2)
        K = k_all.shape[1]
        k_t = k_all[token_batch]
        v_t = v_all[token_batch]

        scores = jnp.einsum("thd,tkhd->thk", query.astype(jnp.float32), k_t.astype(jnp.float32))
        scores = scores * softmax_scale
        kv_pos = jnp.arange(K, dtype=jnp.int32)
        in_seq = kv_pos[None, :] < kv_len_t[:, None]
        if self.is_causal:
            win = window_mask_rows(
                q_abs[:, None], kv_pos[None, :], self.local_window_size, self.global_window_size
            )
            keep = in_seq & win[:, 0, :]
        else:
            keep = in_seq
        probs = masked_softmax(scores, keep[:, None, :], query.dtype)
        out = jnp.einsum("thk,tkhd->thd", probs, v_t)
        out = jnp.where((kv_len_t > 0)[:, None, None], out, 0)
        return out.astype(query.dtype)


class MojoPagedDecodeSWA(_SWAConfigMixin, MojoOperator):
    """Paged decode with sliding/global window. Reference attention.py:645-744."""

    def forward(
        self,
        query: jax.Array,
        key_cache: jax.Array,
        value_cache: jax.Array,
        total_seq_lens: jax.Array,
        block_table: jax.Array,
        softmax_scale: Optional[float] = None,
        *,
        max_total_seq_len: Optional[int] = None,
    ) -> jax.Array:
        assert_paged_decode_contract(block_table, total_seq_lens)
        B, Hq, D = query.shape
        _, Hkv, page_size, _ = paged_cache_dims(key_cache, self.kv_layout)
        group = Hq // Hkv
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)

        k = expand_gqa(gather_paged_kv(key_cache, block_table, self.kv_layout), group, self.gqa_layout, 2)
        v = expand_gqa(gather_paged_kv(value_cache, block_table, self.kv_layout), group, self.gqa_layout, 2)
        K = k.shape[1]

        scores = jnp.einsum("bhd,bkhd->bhk", query.astype(jnp.float32), k.astype(jnp.float32))
        scores = scores * softmax_scale
        kv_pos = jnp.arange(K, dtype=jnp.int32)
        in_seq = kv_pos[None, :] < total_seq_lens[:, None]
        if self.is_causal:
            q_abs = (total_seq_lens - 1)[:, None]  # single decode row
            win = window_mask_rows(
                q_abs, kv_pos[None, :], self.local_window_size, self.global_window_size
            )[:, 0, :]
            keep = in_seq & win
        else:
            keep = in_seq
        probs = masked_softmax(scores, keep[:, None, :], query.dtype)
        out = jnp.einsum("bhk,bkhd->bhd", probs, v)
        out = jnp.where((total_seq_lens > 0)[:, None, None], out, 0)
        return out.astype(query.dtype)


class MojoSWA(_SWAConfigMixin, MojoOperator):
    """Dense varlen SWA: packed q (T,Hq,D), packed k/v (Tk,Hkv,D) with
    cu_q_lens / cu_total_seq_lens. Reference attention.py:747-838."""

    def forward(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        cu_q_lens: jax.Array,
        cu_total_seq_lens: jax.Array,
        softmax_scale: Optional[float] = None,
    ) -> jax.Array:
        assert cu_q_lens.dtype == jnp.int32
        assert cu_total_seq_lens.dtype == jnp.int32
        T, Hq, D = query.shape
        Tk = key.shape[0]
        Hkv = key.shape[1]
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
        kv_len_t = kv_lens[token_batch]
        q_abs = kv_len_t - q_lens[token_batch] + q_pos

        # packed-kv token bookkeeping: key row j belongs to batch kb[j] at
        # in-sequence position kpos[j]
        k_ids = jnp.arange(Tk, dtype=jnp.int32)
        k_batch = jnp.clip(
            jnp.searchsorted(cu_total_seq_lens, k_ids, side="right").astype(jnp.int32) - 1, 0, B - 1
        )
        k_pos = k_ids - cu_total_seq_lens[k_batch]

        kx = expand_gqa(key, group, self.gqa_layout, head_axis=1)
        vx = expand_gqa(value, group, self.gqa_layout, head_axis=1)

        scores = jnp.einsum("thd,khd->thk", query.astype(jnp.float32), kx.astype(jnp.float32))
        scores = scores * softmax_scale

        same_batch = token_batch[:, None] == k_batch[None, :]
        if self.is_causal:
            win = window_mask_rows(
                q_abs[:, None], k_pos[None, :], self.local_window_size, self.global_window_size
            )[:, 0, :]
            keep = same_batch & win
        else:
            keep = same_batch
        probs = masked_softmax(scores, keep[:, None, :], query.dtype)
        out = jnp.einsum("thk,khd->thd", probs, vx)
        return out.astype(query.dtype)
