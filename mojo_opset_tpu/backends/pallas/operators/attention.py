"""Pallas-tier attention ops.

Analogue of the reference TTX wrapper ops
(backends/ttx/operators/attention.py, e.g. TTXPagedDecodeGQA :143).
"""

from __future__ import annotations

from typing import Optional

import jax

import jax.numpy as jnp

import math

from mojo_opset_tpu.backends.pallas.kernels.flash_prefill import paged_prefill_gqa
from mojo_opset_tpu.backends.pallas.kernels.paged_decode import paged_decode_gqa
from mojo_opset_tpu.experimental.operators.kv_quant_attention import (
    MojoPagedDecodeGQAWithKVDequant,
    MojoPagedDecodeSWAWithKVDequant,
    MojoPagedPrefillGQAWithKVDequant,
)
from mojo_opset_tpu.core.operators.attention import (
    MojoPagedDecodeSWA,
    MojoPagedDecodeGQA,
    MojoPagedPrefillGQA,
    MojoPrefillGQA,
    MojoSdpa,
    expand_gqa,
    seq_lens_from_cu,
)
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


def _flash_blocks(sq: int, skv: int):
    """Tuned in-tree flash block sizes (512 wins at large S on v5e)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    bq = max(128, min(512, sq))
    bk = max(128, min(512, skv))
    if sq % bq or skv % bk:
        return None
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_q_dkv=bq,
        block_k_dkv=bk, block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk,
    )


class PallasPagedDecodeGQA(MojoPagedDecodeGQA):
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
        interpret = pallas_interpret_mode()
        if (mask is not None and not self.is_causal) or (
            not interpret and query.shape[-1] % 128 != 0
        ):
            # masked decode stays on the golden path; on real TPU hardware
            # Mosaic dynamic DMA views need lane-aligned (128) head dims
            return MojoPagedDecodeGQA.forward(
                self, query, key_cache, value_cache, total_seq_lens, block_tables,
                softmax_scale, mask, max_total_seq_len=max_total_seq_len,
            )
        return paged_decode_gqa(
            query, key_cache, value_cache, total_seq_lens, block_tables,
            softmax_scale=softmax_scale, gqa_layout=self.gqa_layout,
            interpret=interpret, kv_layout=self.kv_layout,
        )


class PallasPagedPrefillGQA(MojoPagedPrefillGQA):
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
        interpret = pallas_interpret_mode()
        if (
            not self.is_causal
            or mask is not None
            or self.gqa_layout != "AABB"
            or query.shape[0] < 8
            or (not interpret and query.shape[-1] % 128 != 0)
        ):
            # custom-mask / ABAB / tiny-token path: fall back to the golden
            return MojoPagedPrefillGQA.forward(
                self, query, key_cache, value_cache, cu_q_lens, block_tables,
                softmax_scale, cu_total_seq_lens, mask, max_q_len, max_total_seq_len,
            )
        q_lens = seq_lens_from_cu(cu_q_lens)
        kv_lens = q_lens if cu_total_seq_lens is None else seq_lens_from_cu(cu_total_seq_lens)
        return paged_prefill_gqa(
            query, key_cache, value_cache, cu_q_lens, block_tables,
            kv_lens.astype(jnp.int32),
            softmax_scale=softmax_scale, gqa_layout=self.gqa_layout,
            interpret=interpret, kv_layout=self.kv_layout,
        )


class PallasSdpa(MojoSdpa):
    """SDPA on Mosaic flash kernels.

    Aligned maskless shapes ride the in-tree flash kernel with tuned
    block sizes (8.7x the reference TTXSdpa baseline at the 4096-token
    shape).  Tile-UNALIGNED maskless shapes — e.g. the Wan DiT backbone,
    L = 1560 at the (1,60,104) latent — route through the in-tree
    varlen flash trio (kernels/flash_vjp.py) as B equal-length
    non-causal sequences: its per-tile cu_lens masks handle the padding
    the in-tree kernel cannot (its segment-id path fails to legalize on
    this toolchain — 'Bad lhs type' tpu.matmul, tools history
    2026-08-21).  Masked calls stay on the golden."""

    def forward(self, query, key, value, attn_mask=None):
        Lq, Lkv = query.shape[-2], key.shape[-2]
        D = query.shape[-1]
        if (
            attn_mask is not None
            or pallas_interpret_mode()
            or query.ndim != 4
            or D % 128 != 0
            or min(Lq, Lkv) < 16
            or query.dtype not in (jnp.float32, jnp.bfloat16)
            or key.dtype != query.dtype
            or value.dtype != query.dtype
            # flash kernels require a uniform head_dim; the golden MojoSdpa
            # allows value head-dim != query head-dim, so gate on the full
            # k/v shape before any kernel-side reshape can corrupt data
            or key.shape[-1] != D
            or value.shape != key.shape
        ):
            return MojoSdpa.forward(self, query, key, value, attn_mask)
        scale = self.scale if self.scale is not None else 1.0 / math.sqrt(D)
        k, v = key, value
        group_ok = query.shape[1] == k.shape[1] or (
            self.enable_gqa and query.shape[1] % k.shape[1] == 0
        )
        blocks = _flash_blocks(Lq, Lkv)
        if blocks is not None:
            if self.enable_gqa and query.shape[-3] != k.shape[-3]:
                g = query.shape[-3] // k.shape[-3]
                k = jnp.repeat(k, g, axis=-3)
                v = jnp.repeat(v, g, axis=-3)
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            return flash_attention(
                query, k, v, causal=False, sm_scale=scale,
                block_sizes=blocks,
            ).astype(query.dtype)
        B = query.shape[0]
        if not group_ok or B > 32:
            return MojoSdpa.forward(self, query, key, value, attn_mask)
        from mojo_opset_tpu.backends.pallas.kernels.flash_vjp import flash_swa

        def pack(x):  # (B, H, L, Dh) -> (B*L, H, Dh)
            return jnp.swapaxes(x, 1, 2).reshape(-1, x.shape[1], D)

        cu_q = jnp.arange(B + 1, dtype=jnp.int32) * Lq
        cu_k = jnp.arange(B + 1, dtype=jnp.int32) * Lkv
        # big tiles: the per-grid-step overhead dominates at 256x256
        # (983 -> 361 us at the DiT's L=1560 — tools/exp history 2026-08-21)
        bq = 512 if Lq >= 512 else 256
        bk = 1024 if Lkv >= 1024 else (512 if Lkv >= 512 else 256)
        out = flash_swa(
            pack(query), pack(k), pack(v), cu_q, cu_k,
            False, None, None, scale, False, bq, bk,
        )
        return jnp.swapaxes(out.reshape(B, Lq, -1, D), 1, 2)


class PallasPrefillGQA(MojoPrefillGQA):
    """Padded dense causal GQA prefill on the in-tree Mosaic flash kernel;
    varlen padding is masked via flash segment ids (pad rows get a
    different segment so valid rows never attend to pad keys)."""

    def forward(self, query, k_cache, v_cache, cu_q_lens, softmax_scale=None):
        B, Hq, S, D = query.shape
        if (
            pallas_interpret_mode()
            or not self.is_causal
            or D % 128 != 0
            or _flash_blocks(S, S) is None
        ):
            return MojoPrefillGQA.forward(self, query, k_cache, v_cache, cu_q_lens, softmax_scale)
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
            flash_attention,
        )

        group = Hq // k_cache.shape[1]
        k = expand_gqa(k_cache, group, self.gqa_layout, head_axis=1)
        v = expand_gqa(v_cache, group, self.gqa_layout, head_axis=1)
        lens = (cu_q_lens[1:] - cu_q_lens[:-1]).astype(jnp.int32)
        pos = jnp.arange(S, dtype=jnp.int32)[None, :]
        seg = jnp.where(pos < lens[:, None], 0, 1).astype(jnp.int32)
        scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(D)
        out = flash_attention(
            query, k, v, causal=True, sm_scale=scale,
            segment_ids=SegmentIds(q=seg, kv=seg),
            block_sizes=_flash_blocks(S, S),
        )
        # (B, Hq, S, D) -> (B, S, Hq, D) to match the op contract
        return jnp.swapaxes(out, 1, 2).astype(query.dtype)


class PallasPagedDecodeGQAWithKVDequant(MojoPagedDecodeGQAWithKVDequant):
    """int8-KV decode through the unmodified flash kernel: the per-channel
    key scale folds into the query before the kernel and the value scale
    applies to the output after it (scores/PV are linear in those scales),
    so the kernel streams int8 pages — half the HBM traffic of bf16."""

    def forward(
        self,
        query: jax.Array,
        query_scale: Optional[jax.Array],
        key_cache: jax.Array,
        key_scale: jax.Array,
        value_cache: jax.Array,
        value_scale: jax.Array,
        total_seq_lens: jax.Array,
        block_tables: jax.Array,
        softmax_scale: Optional[float] = None,
        mask: Optional[jax.Array] = None,
        *,
        max_total_seq_len: Optional[int] = None,
    ) -> jax.Array:
        interpret = pallas_interpret_mode()
        if (
            self.compute_dtype == jnp.int8
            or mask is not None
            or query_scale is not None
            or (not interpret and query.shape[-1] % 128 != 0)
        ):
            return MojoPagedDecodeGQAWithKVDequant.forward(
                self, query, query_scale, key_cache, key_scale, value_cache,
                value_scale, total_seq_lens, block_tables, softmax_scale,
                mask, max_total_seq_len=max_total_seq_len,
            )
        Hq, Hkv = query.shape[1], key_cache.shape[1]
        ks, vs = self._expand_scales(key_scale, value_scale, Hq, Hkv)
        q_folded = (query.astype(jnp.float32) * ks.astype(jnp.float32)[None]).astype(
            jnp.bfloat16
        )
        out = paged_decode_gqa(
            q_folded, key_cache, value_cache, total_seq_lens, block_tables,
            softmax_scale=softmax_scale, gqa_layout=self.gqa_layout,
            interpret=interpret, kv_layout="HND",
        )
        return (out.astype(jnp.float32) * vs.astype(jnp.float32)[None]).astype(query.dtype)


class PallasPagedPrefillGQAWithKVDequant(MojoPagedPrefillGQAWithKVDequant):
    """int8-KV varlen prefill via the same scale-folding trick."""

    def forward(
        self,
        query: jax.Array,
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
        interpret = pallas_interpret_mode()
        if (
            self.compute_dtype == jnp.int8
            or not self.is_causal
            or mask is not None
            or query_scale is not None
            or self.gqa_layout != "AABB"
            or query.shape[0] < 8
            or (not interpret and query.shape[-1] % 128 != 0)
        ):
            return MojoPagedPrefillGQAWithKVDequant.forward(
                self, query, query_scale, key_cache, key_scale, value_cache,
                value_scale, cu_q_lens, block_tables, softmax_scale,
                cu_total_seq_lens, mask, max_q_len, max_total_seq_len,
            )
        Hq, Hkv = query.shape[1], key_cache.shape[1]
        ks, vs = self._expand_scales(key_scale, value_scale, Hq, Hkv)
        q_folded = (query.astype(jnp.float32) * ks.astype(jnp.float32)[None]).astype(
            jnp.bfloat16
        )
        q_lens = seq_lens_from_cu(cu_q_lens)
        kv_lens = q_lens if cu_total_seq_lens is None else seq_lens_from_cu(cu_total_seq_lens)
        out = paged_prefill_gqa(
            q_folded, key_cache, value_cache, cu_q_lens, block_tables,
            kv_lens.astype(jnp.int32),
            softmax_scale=softmax_scale, gqa_layout=self.gqa_layout,
            interpret=interpret, kv_layout="HND",
        )
        return (out.astype(jnp.float32) * vs.astype(jnp.float32)[None]).astype(query.dtype)


class PallasPagedDecodeSWA(MojoPagedDecodeSWA):
    """Windowed paged decode: the flash decode kernel skips DMA + compute
    for pages entirely outside [seq_len-1-local, seq_len) ∪ [0, global),
    so cost tracks the window size instead of the context length."""

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
        interpret = pallas_interpret_mode()
        if not self.is_causal or (not interpret and query.shape[-1] % 128 != 0):
            return MojoPagedDecodeSWA.forward(
                self, query, key_cache, value_cache, total_seq_lens, block_table,
                softmax_scale, max_total_seq_len=max_total_seq_len,
            )
        # (measured: matching the super size to the window costs more in
        # grid-step overhead than it saves in DMA — keep the default 16)
        return paged_decode_gqa(
            query, key_cache, value_cache, total_seq_lens, block_table,
            softmax_scale=softmax_scale, gqa_layout=self.gqa_layout,
            interpret=interpret, kv_layout=self.kv_layout,
            local_window=self.local_window_size,
            global_window=self.global_window_size,
        )


class PallasPagedDecodeSWAWithKVDequant(MojoPagedDecodeSWAWithKVDequant):
    """int8-KV windowed decode: scale folding (see GQA dequant tier) plus
    window page-skipping in one kernel pass."""

    def forward(
        self, query, query_scale, key_cache, key_scale, value_cache, value_scale,
        total_seq_lens, block_table, softmax_scale=None, *, max_total_seq_len=None,
    ):
        interpret = pallas_interpret_mode()
        if (
            self.compute_dtype == jnp.int8
            or not self.is_causal
            or query_scale is not None
            or (not interpret and query.shape[-1] % 128 != 0)
        ):
            return MojoPagedDecodeSWAWithKVDequant.forward(
                self, query, query_scale, key_cache, key_scale, value_cache,
                value_scale, total_seq_lens, block_table, softmax_scale,
                max_total_seq_len=max_total_seq_len,
            )
        Hq, Hkv = query.shape[1], key_cache.shape[1]
        ks, vs = self._expand_scales(key_scale, value_scale, Hq, Hkv)
        q_folded = (query.astype(jnp.float32) * ks.astype(jnp.float32)[None]).astype(
            jnp.bfloat16
        )
        out = paged_decode_gqa(
            q_folded, key_cache, value_cache, total_seq_lens, block_table,
            softmax_scale=softmax_scale, gqa_layout=self.gqa_layout,
            interpret=interpret, kv_layout="HND",
            local_window=self.local_window_size,
            global_window=self.global_window_size,
        )
        return (out.astype(jnp.float32) * vs.astype(jnp.float32)[None]).astype(query.dtype)
