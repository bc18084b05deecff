"""Native Sparse Attention (NSA): three branches blended by a head gate.

Parity: reference mojo_opset/experimental/operators/attention.py:1270-1640
(compress helper :1270, block selection :1280, window :1314,
MojoDecodeNSA :1380, MojoPagedDecodeNSA :1428, MojoPrefillNSA :1488,
MojoPagedPrefillNSA :1551).

Branches per query: compressed-global (mean-pooled KV), top-k selected
blocks (scored via the compressed keys), and a sliding window; a per-head
sigmoid gate ``gate_proj (H, D, 3)`` mixes them.

The goldens are eager (host-driven loops over batches / query positions,
mirroring the reference's sequential definition); the kernel tiers own the
vectorized forms.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.attention import (
    assert_paged_decode_contract,
    assert_paged_prefill_contract,
    seq_lens_from_cu,
)
from mojo_opset_tpu.utils import init as winit


def _nsa_compress_kv(k, v, compress_ratio):
    """Mean-pool K/V in blocks of ``compress_ratio`` along the seq dim."""
    S, H, D = k.shape
    n = (S // compress_ratio) * compress_ratio
    k_t = k[:n].reshape(-1, compress_ratio, H, D).mean(axis=1)
    v_t = v[:n].reshape(-1, compress_ratio, H, D).mean(axis=1)
    return k_t, v_t


def _nsa_select_blocks(query, comp_k, sl, softmax_scale, compress_ratio, block_size, num_selected_blocks):
    """Top-k block mask (H, sl) from compressed attention scores."""
    H, D = query.shape
    C = comp_k.shape[0]
    qk = jnp.einsum("hd,chd->hc", query.astype(jnp.float32), comp_k.astype(jnp.float32))
    qk = jax.nn.softmax(qk * softmax_scale, axis=-1)  # (H, C)

    tokens_per_block = block_size // compress_ratio
    num_blocks = math.ceil(sl / block_size)
    block_score = np.zeros((H, num_blocks), np.float32)
    qk_np = np.asarray(qk)
    for b in range(num_blocks):
        s, e = b * tokens_per_block, min((b + 1) * tokens_per_block, C)
        if s < C:
            block_score[:, b] = qk_np[:, s:e].sum(axis=-1)

    num_sel = min(num_selected_blocks, num_blocks)
    topk_idx = np.argsort(-block_score, axis=-1)[:, :num_sel]
    mask = np.zeros((H, sl), bool)
    for h in range(H):
        for b in topk_idx[h]:
            mask[h, b * block_size : min((b + 1) * block_size, sl)] = True
    return jnp.asarray(mask)


def _nsa_attend(q, k, v, softmax_scale, mask=None):
    """q (Tq,H,D), k/v (Tk,H,D) -> (Tq,H,D); mask (H,Tk) True=keep."""
    scores = jnp.einsum("thd,shd->ths", q.astype(jnp.float32), k.astype(jnp.float32))
    scores = scores * softmax_scale
    if mask is not None:
        scores = jnp.where(mask[None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        probs = jnp.nan_to_num(probs, nan=0.0)
    return jnp.einsum("ths,shd->thd", probs.astype(q.dtype), v)


def _nsa_gate(query, gate_proj):
    return jax.nn.sigmoid(
        jnp.einsum("...hd,hdc->...hc", query.astype(jnp.float32), gate_proj.astype(jnp.float32))
    )


class _NSAMixin:
    def _init_nsa(self, num_heads, head_dim, compress_ratio, num_selected_blocks,
                  block_size, window_size, is_causal, key=None):
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.compress_ratio = compress_ratio
        self.num_selected_blocks = num_selected_blocks
        self.block_size = block_size
        self.window_size = window_size
        self.is_causal = is_causal
        if key is None:
            key = jax.random.PRNGKey(0)
        self.gate_proj = winit.normal(key, (num_heads, head_dim, 3), jnp.float32, 0.02)

    def _decode_core(self, q_i, k_i, v_i, sl, softmax_scale):
        if sl <= 0:
            return jnp.zeros_like(q_i)
        if sl >= self.compress_ratio:
            comp_k, comp_v = _nsa_compress_kv(k_i, v_i, self.compress_ratio)
        else:
            # fewer context tokens than one compression block: the
            # compressed branch falls back to the raw context (reference
            # attention.py:1533) — pooling would attend an EMPTY kv
            comp_k, comp_v = k_i[:sl], v_i[:sl]
        sel_mask = _nsa_select_blocks(
            q_i, comp_k, sl, softmax_scale, self.compress_ratio,
            self.block_size, self.num_selected_blocks,
        )
        start = max(0, sl - self.window_size)
        win_k, win_v = k_i[start:sl], v_i[start:sl]

        q_u = q_i[None]
        out_comp = _nsa_attend(q_u, comp_k, comp_v, softmax_scale)[0]
        out_sel = _nsa_attend(q_u, k_i, v_i, softmax_scale, mask=sel_mask)[0]
        out_win = _nsa_attend(q_u, win_k, win_v, softmax_scale)[0]
        g = _nsa_gate(q_i, self.gate_proj)  # (H, 3)
        out = g[..., 0:1] * out_comp + g[..., 1:2] * out_sel + g[..., 2:3] * out_win
        return out.astype(q_i.dtype)

    def extra_repr(self) -> str:
        return (
            f"num_heads={self.num_heads}, head_dim={self.head_dim}, "
            f"compress_ratio={self.compress_ratio}, "
            f"num_selected_blocks={self.num_selected_blocks}, "
            f"block_size={self.block_size}, window_size={self.window_size}, "
            f"is_causal={self.is_causal}"
        )


class MojoDecodeNSA(_NSAMixin, MojoOperator):
    def __init__(self, num_heads, head_dim, compress_ratio=4, num_selected_blocks=16,
                 block_size=64, window_size=512, is_causal=True, key=None, **kwargs):
        super().__init__(**kwargs)
        self._init_nsa(num_heads, head_dim, compress_ratio, num_selected_blocks,
                       block_size, window_size, is_causal, key)

    def forward(self, query, key, value, total_seq_lens=None, softmax_scale=None):
        B, H, D = query.shape
        S = key.shape[1]
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)
        lens = np.asarray(total_seq_lens) if total_seq_lens is not None else np.full(B, S)
        outs = []
        for i in range(B):
            sl = int(lens[i])
            if sl <= 0:
                outs.append(jnp.zeros_like(query[i]))
                continue
            outs.append(self._decode_core(query[i], key[i, :sl], value[i, :sl], sl, softmax_scale))
        return jnp.stack(outs)


class MojoPagedDecodeNSA(_NSAMixin, MojoOperator):
    def __init__(self, num_heads, head_dim, compress_ratio=4, num_selected_blocks=16,
                 block_size=64, window_size=512, is_causal=True, key=None, **kwargs):
        super().__init__(**kwargs)
        self._init_nsa(num_heads, head_dim, compress_ratio, num_selected_blocks,
                       block_size, window_size, is_causal, key)

    def forward(self, query, key_cache, value_cache, total_seq_lens, block_tables, softmax_scale=None):
        assert_paged_decode_contract(block_tables, total_seq_lens)
        B, H, D = query.shape
        blk = key_cache.shape[2]
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)
        lens = np.asarray(total_seq_lens)
        bt = np.asarray(block_tables)
        outs = []
        for i in range(B):
            sl = int(lens[i])
            if sl <= 0:
                outs.append(jnp.zeros_like(query[i]))
                continue
            if bt[i, 0] < 0:
                raise ValueError("Paged decode requires a valid block table for rows with kv lens > 0.")
            nb = -(-sl // blk)
            # stop at the first invalid entry: -1 would wrap to the LAST
            # physical block via Python indexing (reference breaks at bid<0)
            bids = [int(bt[i, j]) for j in range(nb)]
            bids = bids[: next((j for j, b in enumerate(bids) if b < 0), nb)]
            k_i = jnp.concatenate([jnp.swapaxes(key_cache[b], 0, 1) for b in bids])[:sl]
            v_i = jnp.concatenate([jnp.swapaxes(value_cache[b], 0, 1) for b in bids])[:sl]
            outs.append(self._decode_core(query[i], k_i, v_i, sl, softmax_scale))
        return jnp.stack(outs)


class MojoPrefillNSA(_NSAMixin, MojoOperator):
    def __init__(self, num_heads, head_dim, compress_ratio=4, num_selected_blocks=16,
                 block_size=64, window_size=512, is_causal=True, key=None, **kwargs):
        super().__init__(**kwargs)
        self._init_nsa(num_heads, head_dim, compress_ratio, num_selected_blocks,
                       block_size, window_size, is_causal, key)

    def forward(self, query, key, value, cu_q_lens, softmax_scale=None):
        assert cu_q_lens.dtype == jnp.int32
        T, H, D = query.shape
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)
        cu = np.asarray(cu_q_lens)
        out = jnp.zeros_like(query)
        for i in range(cu.shape[0] - 1):
            s, e = int(cu[i]), int(cu[i + 1])
            q_seq, k_seq, v_seq = query[s:e], key[s:e], value[s:e]
            for t in range(e - s):
                t_sl = t + 1 if self.is_causal else (e - s)
                row = self._decode_core(q_seq[t], k_seq[:t_sl], v_seq[:t_sl], t_sl, softmax_scale)
                out = out.at[s + t].set(row)
        return out


class MojoPagedPrefillNSA(_NSAMixin, MojoOperator):
    def __init__(self, num_heads, head_dim, compress_ratio=4, num_selected_blocks=16,
                 block_size=64, window_size=512, is_causal=True, key=None, **kwargs):
        super().__init__(**kwargs)
        self._init_nsa(num_heads, head_dim, compress_ratio, num_selected_blocks,
                       block_size, window_size, is_causal, key)

    def forward(self, query, key_cache, value_cache, cu_q_lens, block_tables,
                softmax_scale=None, cu_total_seq_lens=None):
        assert_paged_prefill_contract(cu_q_lens, block_tables, cu_total_seq_lens)
        T, H, D = query.shape
        blk = key_cache.shape[2]
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(D)
        q_lens = np.asarray(seq_lens_from_cu(cu_q_lens))
        kv_lens = q_lens if cu_total_seq_lens is None else np.asarray(seq_lens_from_cu(cu_total_seq_lens))
        cu = np.asarray(cu_q_lens)
        bt = np.asarray(block_tables)
        out = jnp.zeros_like(query)
        for i in range(q_lens.shape[0]):
            qs, qe = int(cu[i]), int(cu[i + 1])
            kv_len, q_len = int(kv_lens[i]), qe - qs
            if q_len == 0 or kv_len <= 0:
                continue
            if bt[i, 0] < 0:
                raise ValueError("Paged prefill requires a valid block table for rows with kv lens > 0.")
            nb = -(-kv_len // blk)
            bids = [int(bt[i, j]) for j in range(nb)]
            bids = bids[: next((j for j, b in enumerate(bids) if b < 0), nb)]
            k_seq = jnp.concatenate([jnp.swapaxes(key_cache[b], 0, 1) for b in bids])[:kv_len]
            v_seq = jnp.concatenate([jnp.swapaxes(value_cache[b], 0, 1) for b in bids])[:kv_len]
            for t in range(q_len):
                t_kv = (kv_len - q_len + t + 1) if self.is_causal else kv_len
                row = self._decode_core(query[qs + t], k_seq[:t_kv], v_seq[:t_kv], t_kv, softmax_scale)
                out = out.at[qs + t].set(row)
        return out
