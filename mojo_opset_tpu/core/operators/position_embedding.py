"""Rotary position embedding ops.

Parity: reference mojo_opset/core/operators/position_embedding.py:9-407
(MojoRotaryEmbedding :9, MojoApplyRoPE :98, MojoMRoPE :178,
MojoVisionRotaryEmbedding2D :281, MojoApplyVisionRoPE2D :366).

TPU notes: the varlen position-id construction is vectorized (cumsum /
searchsorted) instead of the reference's per-batch Python loop
(position_embedding.py:70-80) so the whole op stays jittable.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator


def varlen_position_ids(
    total_tokens: int,
    cu_q_lens: jax.Array,
    total_seq_lens: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-token positions for varlen layouts (vectorized, jittable).

    Token t in batch i gets position ``context_len_i + (t - cu_q_lens[i])``
    where ``context_len_i = total_seq_lens[i] - q_lens[i]`` (0 if absent).
    """
    token_ids = jnp.arange(total_tokens, dtype=jnp.int32)
    batch = jnp.searchsorted(cu_q_lens, token_ids, side="right").astype(jnp.int32) - 1
    batch = jnp.clip(batch, 0, cu_q_lens.shape[0] - 2)
    pos_in_seq = token_ids - cu_q_lens[batch]
    if total_seq_lens is not None:
        q_lens = cu_q_lens[1:] - cu_q_lens[:-1]
        context = total_seq_lens - q_lens
        return (context[batch] + pos_in_seq).astype(jnp.int32)
    return pos_in_seq.astype(jnp.int32)


class MojoRotaryEmbedding(MojoOperator):
    """cos/sin generation for RoPE.

    Modes (reference position_embedding.py:50-57):
      1. varlen prefill: x [T, H] + cu_q_lens (+ total_seq_lens) -> cos/sin [T, D]
      2. padded prefill: x [B, S, H], no ids -> cos/sin [S, D]
      3. decode: x [B, H] + position_ids [B] -> cos/sin [B, D]
    Optional precomputed table via ``init_max_length``.
    """

    def __init__(
        self,
        rope_theta: float,
        rope_dim: int,
        attention_scaling: float = 1.0,
        init_max_length: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.rope_theta = rope_theta
        self.rope_dim = rope_dim
        self.attention_scaling = attention_scaling
        self.inv_freq = 1.0 / (
            rope_theta ** (jnp.arange(0, rope_dim, 2, dtype=jnp.float32) / rope_dim)
        )
        self.init_max_length = init_max_length
        if init_max_length is not None:
            positions = jnp.arange(init_max_length, dtype=jnp.float32)
            freqs = positions[:, None] * self.inv_freq[None, :]
            emb = jnp.concatenate([freqs, freqs], axis=-1)
            self.cos = jnp.cos(emb) * attention_scaling
            self.sin = jnp.sin(emb) * attention_scaling
        else:
            self.cos = None
            self.sin = None

    def forward(
        self,
        x: jax.Array,
        cu_q_lens: Optional[jax.Array] = None,
        total_seq_lens: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        assert position_ids is None or cu_q_lens is None, (
            "At most one of cu_q_lens or position_ids should be provided"
        )
        if cu_q_lens is not None:
            assert x.ndim == 2, "x must be 2D: [T, D] for varlen"
            position_ids = varlen_position_ids(x.shape[0], cu_q_lens, total_seq_lens)
        elif position_ids is None:
            position_ids = jnp.arange(x.shape[1], dtype=jnp.int32)

        if self.init_max_length is None:
            freqs = position_ids[..., None].astype(jnp.float32) * self.inv_freq[None, :]
            emb = jnp.concatenate([freqs, freqs], axis=-1)
            cos = jnp.cos(emb) * self.attention_scaling
            sin = jnp.sin(emb) * self.attention_scaling
        else:
            cos = self.cos[position_ids]
            sin = self.sin[position_ids]
        return cos, sin

    def extra_repr(self) -> str:
        return (
            f"rope_theta={self.rope_theta}, rope_dim={self.rope_dim}, "
            f"attention_scaling={self.attention_scaling}, init_max_length={self.init_max_length}"
        )


def rotate_half(x: jax.Array) -> jax.Array:
    x1 = x[..., : x.shape[-1] // 2]
    x2 = x[..., x.shape[-1] // 2 :]
    return jnp.concatenate([-x2, x1], axis=-1)


class MojoApplyRoPE(MojoOperator):
    """Rotate-half RoPE application with partial-rope (``nope_dim``) support
    and head-first/token-first layouts (reference position_embedding.py:98-175)."""

    def __init__(self, interleaved: bool = False):
        super().__init__()
        assert not interleaved, "interleaved impl is not supported yet."
        self.interleaved = interleaved

    def extra_repr(self) -> str:
        return f"interleaved={self.interleaved}"

    def _apply_rope(self, q, k, cos, sin):
        rope_dim = cos.shape[-1]
        nope_dim = q.shape[-1] - rope_dim
        if nope_dim > 0:
            q_nope, q = q[..., :nope_dim], q[..., nope_dim:]
            k_nope, k = k[..., :nope_dim], k[..., nope_dim:]

        q_rot = (q * cos + rotate_half(q) * sin).astype(q.dtype)
        k_rot = (k * cos + rotate_half(k) * sin).astype(k.dtype)

        if nope_dim > 0:
            q_rot = jnp.concatenate([q_nope, q_rot], axis=-1)
            k_rot = jnp.concatenate([k_nope, k_rot], axis=-1)
        return q_rot, k_rot

    def forward(
        self,
        q: jax.Array,
        k: jax.Array,
        cos: jax.Array,
        sin: jax.Array,
        head_first: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Layouts: varlen [T,N,D]/[N,T,D]; padded [B,S,N,D]/[B,N,S,D];
        decode [B,N,D]/[N,B,D]; cos/sin broadcast over the head axis."""
        assert q.ndim == k.ndim, "q and k must have the same rank"
        assert q.ndim in (3, 4), "q and k must be 3D or 4D"
        assert cos.shape == sin.shape, "cos and sin must have the same shape"
        if head_first:
            cos = jnp.expand_dims(cos, -3)
            sin = jnp.expand_dims(sin, -3)
        else:
            cos = jnp.expand_dims(cos, -2)
            sin = jnp.expand_dims(sin, -2)
        return self._apply_rope(q, k, cos, sin)


class MojoMRoPE(MojoOperator):
    """Qwen2-VL multimodal 3-axis RoPE over flattened (tokens, H*D) q/k
    (reference position_embedding.py:178-278)."""

    @staticmethod
    def _apply_interleaved_mrope(cos_table, sin_table, mrope_section: List[int]):
        cos_i = cos_table[0]
        sin_i = sin_table[0]
        cos_i = cos_i.at[..., 1 : mrope_section[1] * 3 : 3].set(
            cos_table[1, ..., 1 : mrope_section[1] * 3 : 3]
        )
        cos_i = cos_i.at[..., 2 : mrope_section[2] * 3 : 3].set(
            cos_table[2, ..., 2 : mrope_section[2] * 3 : 3]
        )
        sin_i = sin_i.at[..., 1 : mrope_section[1] * 3 : 3].set(
            sin_table[1, ..., 1 : mrope_section[1] * 3 : 3]
        )
        sin_i = sin_i.at[..., 2 : mrope_section[2] * 3 : 3].set(
            sin_table[2, ..., 2 : mrope_section[2] * 3 : 3]
        )
        return cos_i, sin_i

    def forward(
        self,
        query: jax.Array,
        key: jax.Array,
        cos_table: jax.Array,
        sin_table: jax.Array,
        mrope_section: List[int],
        is_interleaved: bool = False,
        head_dim: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        num_tokens = query.shape[0]
        num_tokens_k = key.shape[0]
        rope_dim = sum(mrope_section) * 2
        half = rope_dim // 2
        if head_dim is None:
            head_dim = rope_dim
        n_qh = query.shape[1] // head_dim
        n_kh = key.shape[1] // head_dim

        query = query.reshape(num_tokens, n_qh, head_dim)
        key = key.reshape(num_tokens_k, n_kh, head_dim)
        q_rot, q_pass = query[..., :rope_dim], query[..., rope_dim:]
        k_rot, k_pass = key[..., :rope_dim], key[..., rope_dim:]

        if cos_table.ndim == 3:
            if is_interleaved:
                cos_table, sin_table = self._apply_interleaved_mrope(cos_table, sin_table, mrope_section)
            else:
                sections = list(mrope_section)
                offsets = [0]
                for s in sections:
                    offsets.append(offsets[-1] + s)
                cos_table = jnp.concatenate(
                    [cos_table[i, ..., offsets[i] : offsets[i + 1]] for i in range(len(sections))],
                    axis=-1,
                )
                sin_table = jnp.concatenate(
                    [sin_table[i, ..., offsets[i] : offsets[i + 1]] for i in range(len(sections))],
                    axis=-1,
                )

        cos = cos_table.reshape(num_tokens, half)[:, None, :]
        sin = sin_table.reshape(num_tokens, half)[:, None, :]

        def _rot(x):
            h1, h2 = x[..., :half], x[..., half:]
            return jnp.concatenate([h1 * cos - h2 * sin, h2 * cos + h1 * sin], axis=-1)

        query = jnp.concatenate([_rot(q_rot), q_pass], axis=-1).reshape(num_tokens, -1)
        key = jnp.concatenate([_rot(k_rot), k_pass], axis=-1).reshape(num_tokens_k, -1)
        return query, key


class MojoVisionRotaryEmbedding2D(MojoOperator):
    """2-D vision RoPE table builder over per-image ``grid_hw``
    (reference position_embedding.py:281-363). ``grid_hw`` is host-side
    metadata; the position regrouping loop runs eagerly in numpy."""

    def __init__(self, rope_theta: float = 10000.0, rope_dim: int = 64, adapooling_factor: int = 1, **kwargs):
        super().__init__(**kwargs)
        assert adapooling_factor >= 1, "adapooling_factor must be >= 1"
        assert rope_dim % 4 == 0, "vision 2D rope_dim must be divisible by 4"
        self.rope_theta = rope_theta
        self.rope_dim = rope_dim
        self.adapooling_factor = adapooling_factor
        rotary_dim = rope_dim // 2
        self.inv_freq = 1.0 / (
            rope_theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim)
        )

    def extra_repr(self) -> str:
        return (
            f"rope_theta={self.rope_theta}, rope_dim={self.rope_dim}, "
            f"adapooling_factor={self.adapooling_factor}"
        )

    def _build_position_ids(self, grid_hw) -> jax.Array:
        import numpy as np

        grid = np.asarray(grid_hw)
        assert grid.ndim == 2 and grid.shape[-1] == 2, "grid_hw must be [B, 2]"
        f = self.adapooling_factor
        pos_ids = []
        for gh, gw in grid.tolist():
            gh, gw = int(gh), int(gw)
            assert gh > 0 and gw > 0, "grid height/width must be positive"
            assert gh % f == 0 and gw % f == 0, "grid dims must be divisible by adapooling_factor"
            hpos = np.broadcast_to(np.arange(gh)[:, None], (gh, gw))
            hpos = hpos.reshape(gh // f, f, gw // f, f).transpose(0, 2, 1, 3).reshape(-1)
            wpos = np.broadcast_to(np.arange(gw)[None, :], (gh, gw))
            wpos = wpos.reshape(gh // f, f, gw // f, f).transpose(0, 2, 1, 3).reshape(-1)
            pos_ids.append(np.stack([hpos, wpos], axis=-1))
        return jnp.asarray(np.concatenate(pos_ids, axis=0))

    def forward(self, grid_hw) -> Tuple[jax.Array, jax.Array]:
        import numpy as np

        max_grid_size = int(np.asarray(grid_hw).max())
        seq = jnp.arange(max_grid_size, dtype=jnp.float32)
        table = seq[:, None] * self.inv_freq[None, :]
        pos_ids = self._build_position_ids(grid_hw)
        freqs = table[pos_ids].reshape(pos_ids.shape[0], -1)
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        return jnp.cos(emb), jnp.sin(emb)


class MojoApplyVisionRoPE2D(MojoOperator):
    """Apply full-head-dim RoPE to packed vision tokens [T, N, D] with
    prebuilt cos/sin [T, D] (reference position_embedding.py:366-407)."""

    def _apply(self, x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        out = xf * cos[:, None, :] + rotate_half(xf) * sin[:, None, :]
        return out.astype(orig_dtype)

    def forward(self, q, k, cos, sin) -> Tuple[jax.Array, jax.Array]:
        assert q.ndim == 3 and k.ndim == 3, "q and k must be 3D packed token-first tensors"
        assert cos.ndim == 2 and cos.shape == sin.shape
        assert q.shape[0] == cos.shape[0] and k.shape[0] == cos.shape[0]
        assert q.shape[-1] == cos.shape[-1], "vision rope rotates the full head_dim"
        return self._apply(q, cos, sin), self._apply(k, cos, sin)
