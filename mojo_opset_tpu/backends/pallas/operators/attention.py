"""Pallas-tier attention ops.

Analogue of the reference TTX wrapper ops
(backends/ttx/operators/attention.py, e.g. TTXPagedDecodeGQA :143).
"""

from __future__ import annotations

from typing import Optional

import jax

import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.flash_prefill import paged_prefill_gqa
from mojo_opset_tpu.backends.pallas.kernels.paged_decode import paged_decode_gqa
from mojo_opset_tpu.core.operators.attention import (
    MojoPagedDecodeGQA,
    MojoPagedPrefillGQA,
    seq_lens_from_cu,
)
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


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
            interpret=interpret,
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
            interpret=interpret,
        )
