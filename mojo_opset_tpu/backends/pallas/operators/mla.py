"""Pallas-tier MLA decode (wrapper over kernels/mla_decode.py).

Absorbs ``kv_b_proj`` into the queries (see the XLA tier), then runs the
latent-space MQA kernel; ``W_uv`` applies to the kernel's normalized
latent output.  Attention-sink configs fall back to the XLA tier (the
kernel normalizes internally, and the sink needs the softmax
denominator)."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.backends.pallas.kernels.mla_decode import mla_decode_absorbed
from mojo_opset_tpu.backends.xla.operators.mla import XlaPagedDecodeMLA, _absorb_weights
from mojo_opset_tpu.utils.platform import pallas_interpret_mode


class PallasPagedDecodeMLA(XlaPagedDecodeMLA):
    def forward(
        self,
        query: jax.Array,  # (B, H, dn + dr)
        compressed_kv_cache: jax.Array,
        k_pe_cache: jax.Array,
        total_seq_lens: jax.Array,
        block_tables: jax.Array,
        softmax_scale: Optional[float] = None,
    ) -> jax.Array:
        interpret = pallas_interpret_mode()
        r = compressed_kv_cache.shape[-1]
        dr_cache = k_pe_cache.shape[-1]  # lane-padded rope width
        if self.attn_sink is not None or (
            not interpret and (r % 128 != 0 or dr_cache % 128 != 0)
        ):
            return super().forward(
                query, compressed_kv_cache, k_pe_cache, total_seq_lens,
                block_tables, softmax_scale,
            )
        dn = self.qk_nope_head_dim
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(self.qk_head_dim)
        w_uk, w_uv = _absorb_weights(self)
        q = query.astype(jnp.float32) * softmax_scale
        q_lat = jnp.einsum("bhd,hdr->bhr", q[..., :dn], w_uk).astype(jnp.bfloat16)
        q_pe = q[..., dn:].astype(jnp.bfloat16)
        if dr_cache != q_pe.shape[-1]:  # zero-pad to the cache's lane width
            q_pe = jnp.pad(q_pe, ((0, 0), (0, 0), (0, dr_cache - q_pe.shape[-1])))
        out_lat = mla_decode_absorbed(
            q_lat, q_pe, compressed_kv_cache, k_pe_cache,
            total_seq_lens, block_tables, interpret=interpret,
        )
        out = jnp.einsum("bhr,hdr->bhd", out_lat, w_uv)
        out = jnp.where((total_seq_lens > 0)[:, None, None], out, 0.0)
        return out.astype(query.dtype)
