"""Over-Encoding ops: n-gram hashed token expansion + mega embeddings.

Parity: reference mojo_opset/core/operators/over_encoding.py
(n_gram_impl_torch :20-59, MojoOverEncodingNGram :61, MojoOverEncoding
:159, NF4 helpers :380-478, MojoNF4DequantEmbedding :480).

TPU notes: the rolling modular hash needs 64-bit intermediates
(``carry * vocab`` overflows int32); the hash runs under a local
``enable_x64`` scope and per-step carries are precomputed exactly on the
host (they depend only on static sizes).  The varlen path is vectorized:
per-token "previous id" lookups splice each sequence's history via the
same cu-lens bookkeeping used by the attention ops.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.operators.gemm import MojoGemm
from mojo_opset_tpu.core.operators.embedding import MojoEmbedding


def n_gram_ids(
    input_ids: jax.Array,  # (..., S)
    history: jax.Array,  # (..., Hlen) last max_gram-1 tokens before input
    oe_vocab_sizes: List[int],
    oe_vocab_offsets: List[int],
    n_grams: List[int],
    ori_vocab_size: int,
) -> jax.Array:
    """Rolling modular hash ids; returns (..., S, num_grams) int64-safe.

    Matches reference n_gram_impl_torch (over_encoding.py:20-59).
    """
    with jax.enable_x64(True):
        complete = jnp.concatenate(
            [history.astype(jnp.int64), input_ids.astype(jnp.int64)], axis=-1
        )
        S = input_ids.shape[-1]
        grams_out = []
        for gram_idx, gram in enumerate(n_grams):
            m = int(oe_vocab_sizes[gram_idx])
            gid = input_ids.astype(jnp.int64)
            carry = ori_vocab_size  # exact host-side carry chain
            for i in range(1, int(gram)):
                prev = complete[..., -i - S : complete.shape[-1] - i]
                gid = (gid + prev * (carry % m)) % m
                carry = carry * ori_vocab_size % m
            grams_out.append(gid + int(oe_vocab_offsets[gram_idx]))
        return jnp.stack(grams_out, axis=-1)


class MojoOverEncodingNGram(MojoOperator):
    def __init__(self, ori_vocab_size: int, oe_vocab_sizes: List[int], oe_grams: List[int], **kwargs):
        super().__init__(**kwargs)
        self.ori_vocab_size = ori_vocab_size
        self.oe_vocab_sizes = [int(v) for v in oe_vocab_sizes]
        self.oe_grams = [int(g) for g in oe_grams]
        self.oe_vocab_offsets = [0] + list(np.cumsum(self.oe_vocab_sizes[:-1]).astype(int))

    def forward(
        self,
        input_ids: jax.Array,
        oe_history_input: jax.Array,
        q_lens: Optional[jax.Array] = None,
    ) -> jax.Array:
        if q_lens is not None:
            assert input_ids.ndim == 1
            assert oe_history_input.ndim == 2
            lens = np.asarray(q_lens)
            off = 0
            parts = []
            for i in range(lens.shape[0]):
                sl = int(lens[i])
                parts.append(
                    n_gram_ids(
                        input_ids[off : off + sl], oe_history_input[i],
                        self.oe_vocab_sizes, self.oe_vocab_offsets,
                        self.oe_grams, self.ori_vocab_size,
                    )
                )
                off += sl
            return jnp.concatenate(parts, axis=0)
        assert input_ids.ndim == 2
        assert oe_history_input.ndim == 2 and oe_history_input.shape[0] == input_ids.shape[0]
        return n_gram_ids(
            input_ids, oe_history_input, self.oe_vocab_sizes, self.oe_vocab_offsets,
            self.oe_grams, self.ori_vocab_size,
        )

    def extra_repr(self) -> str:
        return (
            f"ori_vocab_size={self.ori_vocab_size}, oe_vocab_sizes={self.oe_vocab_sizes}, "
            f"oe_grams={self.oe_grams}"
        )


# -- NF4 ---------------------------------------------------------------

NF4_CODEBOOK = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)


def get_nf4_codebook(dtype=jnp.float16) -> jax.Array:
    return jnp.asarray(NF4_CODEBOOK, dtype=dtype)


def unpack_nf4_int8_to_uint4(packed: jax.Array) -> jax.Array:
    if packed.ndim != 2:
        raise ValueError(f"`packed` must be 2D, got shape={packed.shape}")
    q = packed.astype(jnp.uint8)
    low = q & 0x0F
    high = (q >> 4) & 0x0F
    return jnp.stack([low, high], axis=-1).reshape(packed.shape[0], packed.shape[1] * 2)


def dequantize_nf4_rows(
    nf4_qweight: jax.Array,
    nf4_scale: jax.Array,
    nf4_mean: jax.Array,
    *,
    group_size: int,
    codebook: Optional[jax.Array] = None,
    output_dtype=jnp.bfloat16,
) -> jax.Array:
    num_rows, num_groups = nf4_scale.shape
    embedding_dim = num_groups * group_size
    assert nf4_qweight.shape == (num_rows, embedding_dim // 2)
    if codebook is None:
        codebook = get_nf4_codebook()
    q_idx = unpack_nf4_int8_to_uint4(nf4_qweight).reshape(num_rows, num_groups, group_size)
    values = codebook[q_idx].astype(jnp.float32)
    scale = nf4_scale.astype(jnp.float32)[..., None]
    mean = nf4_mean.astype(jnp.float32)[..., None]
    return (values * scale + mean).reshape(num_rows, embedding_dim).astype(output_dtype)


class MojoNF4DequantEmbedding(MojoOperator):
    """NF4-packed embedding with per-group scale/mean, dequant on lookup.
    Out-of-range ids (relative to ``vocab_start_id``) return zeros."""

    def __init__(
        self,
        qweight: jax.Array,
        scale: jax.Array,
        mean: jax.Array,
        *,
        group_size: int,
        vocab_start_id: int = 0,
        cpu_only: bool = False,
        output_dtype=jnp.bfloat16,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if qweight.ndim != 2 or scale.ndim != 2 or mean.ndim != 2:
            raise ValueError("NF4 embedding tensors must all be 2D")
        if scale.shape != mean.shape:
            raise ValueError("`scale` and `mean` must have the same shape")
        if group_size <= 0:
            raise ValueError(f"`group_size` must be > 0, got {group_size}")
        self.embedding_dim = scale.shape[1] * group_size
        if qweight.shape[1] * 2 != self.embedding_dim:
            raise ValueError("`qweight` incompatible with `scale`/group_size")
        self.group_size = group_size
        self.output_dtype = jnp.dtype(output_dtype) if output_dtype is not None else jnp.bfloat16
        self.vocab_start_id = vocab_start_id
        self.cpu_only = cpu_only  # host-offload hint; JAX keeps arrays device-managed
        self.weight = qweight
        self.scale = scale
        self.mean = mean
        self.codebook = get_nf4_codebook()

    def forward(self, input: jax.Array) -> jax.Array:
        flat = input.reshape(-1)
        local = flat.astype(jnp.int32) - self.vocab_start_id
        valid = (local >= 0) & (local < self.weight.shape[0])
        safe = jnp.clip(local, 0, self.weight.shape[0] - 1)
        rows = dequantize_nf4_rows(
            self.weight[safe], self.scale[safe], self.mean[safe],
            group_size=self.group_size, codebook=self.codebook,
            output_dtype=self.output_dtype,
        )
        rows = jnp.where(valid[:, None], rows, 0)
        return rows.reshape(*input.shape, self.embedding_dim)

    def extra_repr(self) -> str:
        return (
            f"embedding_dim={self.embedding_dim}, group_size={self.group_size}, "
            f"vocab_start_id={self.vocab_start_id}, output_dtype={self.output_dtype}"
        )


class MojoOverEncoding(MojoOperator):
    """Over-tokenized embedding: base lookup + n-gram mega-embedding
    lookups concatenated then projected (reference over_encoding.py:159-370).
    The mega table is dense or NF4-quantized."""

    def __init__(
        self,
        ori_vocab_size: int,
        ori_embed_dim: int,
        oe_embed_dim: int,
        oe_vocab_sizes: List[int],
        oe_grams: List[int],
        _ori_embedding_weight: Optional[jax.Array] = None,
        _mega_embedding_weight: Optional[jax.Array] = None,
        _mega_embedding_scale: Optional[jax.Array] = None,
        _mega_embedding_mean: Optional[jax.Array] = None,
        _mega_embedding_group_size: int = 1,
        _mega_embedding_vocab_start_id: int = 0,
        mega_embedding_cpu_only: bool = False,
        key=None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.ori_vocab_size = ori_vocab_size
        self.ori_embed_dim = ori_embed_dim
        self.oe_embed_dim = oe_embed_dim
        self.oe_vocab_sizes = [int(v) for v in oe_vocab_sizes]
        self.oe_grams = [int(g) for g in oe_grams]
        self.oe_vocab_offsets = [0] + list(np.cumsum(self.oe_vocab_sizes[:-1]).astype(int))
        self.mega_embedding_cpu_only = mega_embedding_cpu_only
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)

        self.ori_embedding = MojoEmbedding(ori_vocab_size, ori_embed_dim, key=k1,
                                           dtype=self.param_dtype)
        if _ori_embedding_weight is not None:
            self.ori_embedding = self.ori_embedding.replace(weight=_ori_embedding_weight)

        if (
            _mega_embedding_weight is not None
            and _mega_embedding_scale is not None
            and _mega_embedding_mean is not None
        ):
            self.oe_mega_embedding = MojoNF4DequantEmbedding._registry.get(self._backend)(
                _mega_embedding_weight, _mega_embedding_scale, _mega_embedding_mean,
                group_size=_mega_embedding_group_size,
                vocab_start_id=_mega_embedding_vocab_start_id,
                output_dtype=self.param_dtype,
                cpu_only=mega_embedding_cpu_only,
            )
        else:
            mega = MojoEmbedding(sum(self.oe_vocab_sizes), oe_embed_dim, key=k2,
                                 dtype=self.param_dtype)
            if _mega_embedding_weight is not None:
                mega = mega.replace(weight=_mega_embedding_weight)
            self.oe_mega_embedding = mega

        self.oe_up_proj = MojoGemm(
            len(self.oe_vocab_sizes) * oe_embed_dim + ori_embed_dim, ori_embed_dim,
            bias=False, key=k3, dtype=self.param_dtype,
        )
        self.ngram = MojoOverEncodingNGram._registry.get(self._backend)(
            ori_vocab_size, self.oe_vocab_sizes, self.oe_grams
        )

    def forward(
        self,
        input_tensor: jax.Array,
        oe_history_input: jax.Array,
        q_lens: Optional[jax.Array] = None,
    ) -> jax.Array:
        oe_ngram = self.ngram(input_tensor, oe_history_input, q_lens)  # (..., G)
        oe_ids = oe_ngram.astype(jnp.int32)
        oe_result = self.oe_mega_embedding(oe_ids)  # (..., G, oe_dim)
        wte_result = self.ori_embedding(input_tensor)
        concat = jnp.concatenate(
            [wte_result, oe_result.reshape(*oe_result.shape[:-2], -1)], axis=-1
        )
        return self.oe_up_proj(concat)

    def extra_repr(self) -> str:
        return (
            f"ori_vocab_size={self.ori_vocab_size}, ori_embed_dim={self.ori_embed_dim}, "
            f"oe_embed_dim={self.oe_embed_dim}, oe_vocab_sizes={self.oe_vocab_sizes}, "
            f"oe_grams={self.oe_grams}, mega_embedding_cpu_only={self.mega_embedding_cpu_only}"
        )
