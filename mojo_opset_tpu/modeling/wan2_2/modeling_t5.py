"""umT5 text encoder for Wan2.2 (TPU-native).

Capability parity with reference mojo_opset/modeling/wan2_2/mojo_t5.py
(T5LayerNorm :69, T5Attention :83 (MojoSdpa scale=1), T5FeedForward :133
(gated GELU), T5SelfAttention :156, T5CrossAttention :180, T5Encoder :207,
T5Decoder :241, T5Model :284, T5EncoderModel :379).  Dropout is an
inference no-op.  Relative position bias comes from MojoRelativeEmbedding.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.module import Module
from mojo_opset_tpu.core.operators import MojoEmbedding, MojoGelu, MojoGemm, MojoRMSNorm, MojoSdpa
from mojo_opset_tpu.experimental.operators.position_embedding import MojoRelativeEmbedding
from mojo_opset_tpu.utils import init as winit


def fp16_clamp(x: jax.Array) -> jax.Array:
    if x.dtype == jnp.float16:
        clamp = float(jnp.finfo(jnp.float16).max) - 1000
        return jnp.clip(x, -clamp, clamp)
    return x


class T5LayerNorm(Module):
    """RMS-style T5 norm (no mean subtraction)."""

    def __init__(self, dim: int, eps: float = 1e-6):
        self.dim = dim
        self.eps = eps
        self.weight = jnp.ones((dim,), jnp.float32)

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (self.weight * normed).astype(x.dtype)


class T5Attention(Module):
    def __init__(self, dim, dim_attn, num_heads, dropout=0.1, key=None):
        assert dim_attn % num_heads == 0
        ks = jax.random.split(key if key is not None else jax.random.PRNGKey(0), 4)
        self.dim = dim
        self.dim_attn = dim_attn
        self.num_heads = num_heads
        self.head_dim = dim_attn // num_heads
        self.q = MojoGemm(dim, dim_attn, bias=False, key=ks[0])
        self.k = MojoGemm(dim, dim_attn, bias=False, key=ks[1])
        self.v = MojoGemm(dim, dim_attn, bias=False, key=ks[2])
        self.o = MojoGemm(dim_attn, dim, bias=False, key=ks[3])
        self.attn = MojoSdpa(scale=1.0)

    def __call__(self, x, context=None, mask=None, pos_bias=None):
        context = x if context is None else context
        b, n, c = x.shape[0], self.num_heads, self.head_dim
        q = self.q(x).reshape(b, -1, n, c)
        k = self.k(context).reshape(b, -1, n, c)
        v = self.v(context).reshape(b, -1, n, c)

        attn_bias = jnp.zeros((b, n, q.shape[1], k.shape[1]), jnp.float32)
        if pos_bias is not None:
            attn_bias = attn_bias + pos_bias
        if mask is not None:
            assert mask.ndim in (2, 3)
            m = mask[:, None, None, :] if mask.ndim == 2 else mask[:, None]
            attn_bias = jnp.where(m == 0, float(jnp.finfo(jnp.float32).min), attn_bias)

        out = self.attn(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
            attn_mask=attn_bias,
        )
        out = jnp.swapaxes(out, 1, 2).reshape(b, -1, n * c)
        return self.o(out)


class T5FeedForward(Module):
    def __init__(self, dim, dim_ffn, dropout=0.1, key=None):
        ks = jax.random.split(key if key is not None else jax.random.PRNGKey(0), 3)
        self.gate = MojoGemm(dim, dim_ffn, bias=False, key=ks[0])
        self.act = MojoGelu(approximate=True)
        self.fc1 = MojoGemm(dim, dim_ffn, bias=False, key=ks[1])
        self.fc2 = MojoGemm(dim_ffn, dim, bias=False, key=ks[2])

    def __call__(self, x):
        return self.fc2(self.fc1(x) * self.act(self.gate(x)))


class T5SelfAttention(Module):
    def __init__(self, dim, dim_attn, dim_ffn, num_heads, num_buckets, shared_pos=True,
                 dropout=0.1, key=None):
        ks = jax.random.split(key if key is not None else jax.random.PRNGKey(0), 3)
        self.shared_pos = shared_pos
        self.norm1 = T5LayerNorm(dim)
        self.attn = T5Attention(dim, dim_attn, num_heads, dropout, key=ks[0])
        self.norm2 = T5LayerNorm(dim)
        self.ffn = T5FeedForward(dim, dim_ffn, dropout, key=ks[1])
        self.pos_embedding = (
            None if shared_pos
            else MojoRelativeEmbedding(num_buckets, num_heads, bidirectional=True, key=ks[2])
        )

    def __call__(self, x, mask=None, pos_bias=None):
        e = pos_bias if self.shared_pos else self.pos_embedding(x.shape[1], x.shape[1])
        x = fp16_clamp(x + self.attn(self.norm1(x), mask=mask, pos_bias=e))
        x = fp16_clamp(x + self.ffn(self.norm2(x)))
        return x


class T5CrossAttention(Module):
    def __init__(self, dim, dim_attn, dim_ffn, num_heads, num_buckets, shared_pos=True,
                 dropout=0.1, key=None):
        ks = jax.random.split(key if key is not None else jax.random.PRNGKey(0), 4)
        self.shared_pos = shared_pos
        self.norm1 = MojoRMSNorm(dim, eps=1e-6)
        self.self_attn = T5Attention(dim, dim_attn, num_heads, dropout, key=ks[0])
        self.norm2 = MojoRMSNorm(dim, eps=1e-6)
        self.cross_attn = T5Attention(dim, dim_attn, num_heads, dropout, key=ks[1])
        self.norm3 = MojoRMSNorm(dim, eps=1e-6)
        self.ffn = T5FeedForward(dim, dim_ffn, dropout, key=ks[2])
        self.pos_embedding = (
            None if shared_pos
            else MojoRelativeEmbedding(num_buckets, num_heads, bidirectional=False, key=ks[3])
        )

    def __call__(self, x, mask=None, encoder_states=None, encoder_mask=None, pos_bias=None):
        e = pos_bias if self.shared_pos else self.pos_embedding(x.shape[1], x.shape[1])
        x = fp16_clamp(x + self.self_attn(self.norm1(x), mask=mask, pos_bias=e))
        x = fp16_clamp(x + self.cross_attn(self.norm2(x), context=encoder_states, mask=encoder_mask))
        x = fp16_clamp(x + self.ffn(self.norm3(x)))
        return x


class T5Encoder(Module):
    def __init__(self, vocab, dim, dim_attn, dim_ffn, num_heads, num_layers, num_buckets,
                 shared_pos=True, dropout=0.1, key=None):
        keys = jax.random.split(key if key is not None else jax.random.PRNGKey(0), num_layers + 2)
        self.shared_pos = shared_pos
        self.token_embedding = (
            vocab if isinstance(vocab, MojoEmbedding) else MojoEmbedding(vocab, dim, key=keys[0])
        )
        self.pos_embedding = (
            MojoRelativeEmbedding(num_buckets, num_heads, bidirectional=True, key=keys[1])
            if shared_pos else None
        )
        self.blocks = [
            T5SelfAttention(dim, dim_attn, dim_ffn, num_heads, num_buckets, shared_pos,
                            dropout, key=keys[i + 2])
            for i in range(num_layers)
        ]
        self.norm = T5LayerNorm(dim)

    def __call__(self, ids, mask=None):
        x = self.token_embedding(ids)
        e = self.pos_embedding(x.shape[1], x.shape[1]) if self.shared_pos else None
        for block in self.blocks:
            x = block(x, mask, pos_bias=e)
        return self.norm(x)


class T5Decoder(Module):
    def __init__(self, vocab, dim, dim_attn, dim_ffn, num_heads, num_layers, num_buckets,
                 shared_pos=True, dropout=0.1, key=None):
        keys = jax.random.split(key if key is not None else jax.random.PRNGKey(0), num_layers + 2)
        self.shared_pos = shared_pos
        self.token_embedding = (
            vocab if isinstance(vocab, MojoEmbedding) else MojoEmbedding(vocab, dim, key=keys[0])
        )
        self.pos_embedding = (
            MojoRelativeEmbedding(num_buckets, num_heads, bidirectional=False, key=keys[1])
            if shared_pos else None
        )
        self.blocks = [
            T5CrossAttention(dim, dim_attn, dim_ffn, num_heads, num_buckets, shared_pos,
                             dropout, key=keys[i + 2])
            for i in range(num_layers)
        ]
        self.norm = T5LayerNorm(dim)

    def __call__(self, ids, mask=None, encoder_states=None, encoder_mask=None):
        b, s = ids.shape
        if mask is None:
            mask = jnp.tril(jnp.ones((1, s, s)))
        elif mask.ndim == 2:
            mask = jnp.tril(jnp.broadcast_to(mask[:, None, :], (b, s, s)))
        x = self.token_embedding(ids)
        e = self.pos_embedding(x.shape[1], x.shape[1]) if self.shared_pos else None
        for block in self.blocks:
            x = block(x, mask, encoder_states, encoder_mask, pos_bias=e)
        return self.norm(x)


class T5Model(Module):
    def __init__(self, vocab_size, dim, dim_attn, dim_ffn, num_heads, encoder_layers,
                 decoder_layers, num_buckets, shared_pos=True, dropout=0.1, key=None):
        k0, k1, k2, k3 = jax.random.split(
            key if key is not None else jax.random.PRNGKey(0), 4)
        self.vocab_size = vocab_size
        self.dim = dim
        self.token_embedding = MojoEmbedding(vocab_size, dim, key=k0)
        self.encoder = T5Encoder(self.token_embedding, dim, dim_attn, dim_ffn, num_heads,
                                 encoder_layers, num_buckets, shared_pos, dropout, key=k1)
        self.decoder = T5Decoder(self.token_embedding, dim, dim_attn, dim_ffn, num_heads,
                                 decoder_layers, num_buckets, shared_pos, dropout, key=k2)
        self.head = MojoGemm(dim, vocab_size, bias=False, key=k3)

    def __call__(self, encoder_ids, encoder_mask, decoder_ids, decoder_mask):
        x = self.encoder(encoder_ids, encoder_mask)
        x = self.decoder(decoder_ids, decoder_mask, x, encoder_mask)
        return self.head(x)


def umt5_xxl_encoder(vocab_size: int = 256384, key=None, **overrides) -> T5Encoder:
    """The umT5-xxl encoder configuration used by Wan2.2
    (reference mojo_t5.py:379-415 T5EncoderModel)."""
    kwargs = dict(
        dim=4096, dim_attn=4096, dim_ffn=10240, num_heads=64, num_layers=24,
        num_buckets=32, shared_pos=False, dropout=0.1,
    )
    kwargs.update(overrides)
    return T5Encoder(vocab_size, key=key, **kwargs)


class T5EncoderModel:
    """Thin inference wrapper: encode pre-tokenized ids with masking
    (reference mojo_t5.py:379-415; tokenization itself is supplied by the
    caller's HF tokenizer)."""

    def __init__(self, encoder: T5Encoder):
        self.encoder = encoder

    def __call__(self, ids: jax.Array, mask: jax.Array) -> List[jax.Array]:
        context = self.encoder(ids, mask)
        seq_lens = mask.astype(jnp.int32).sum(axis=1)
        return [context[i, : int(seq_lens[i])] for i in range(ids.shape[0])]
