"""Wan2.2 DiT video diffusion backbone (TPU-native).

Capability parity with reference mojo_opset/modeling/wan2_2/mojo_wan_model.py:39-459
(WanModel built from Mojo ops: Sdpa, RMSNorm, LayerNorm, Gelu, Silu,
GridRoPE 3-D video RoPE) — t2v and i2v variants, patch embedding via a
strided 3-D conv, 6-way AdaLN modulation blocks, unpatchify.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.module import Module
from mojo_opset_tpu.core.operators import (
    MojoGelu,
    MojoGemm,
    MojoLayerNorm,
    MojoRMSNorm,
    MojoSdpa,
    MojoSilu,
)
from mojo_opset_tpu.experimental.operators.position_embedding import MojoGridRoPE
from mojo_opset_tpu.utils import init as winit


def sinusoidal_embedding_1d(dim: int, position: jax.Array) -> jax.Array:
    assert dim % 2 == 0
    half = dim // 2
    pos = position.astype(jnp.float32)
    sinusoid = jnp.outer(pos, jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half))
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)


def rope_params(max_seq_len: int, dim: int, theta: float = 10000.0) -> jax.Array:
    assert dim % 2 == 0
    freqs = np.outer(
        np.arange(max_seq_len),
        1.0 / np.power(theta, np.arange(0, dim, 2).astype(np.float64) / dim),
    )
    # Transfer float32 halves and form the complex array ON DEVICE:
    # complex64 host->device transfers are Unimplemented on some TPU
    # runtimes once any other program has run (observed on axon), while
    # device-side lax.complex always works.
    c = np.exp(1j * freqs)
    return jax.lax.complex(
        jnp.asarray(c.real.astype(np.float32)), jnp.asarray(c.imag.astype(np.float32))
    )


class WanSelfAttention(Module):
    def __init__(self, dim, num_heads, window_size=(-1, -1), qk_norm=True, eps=1e-6, key=None):
        assert dim % num_heads == 0
        ks = jax.random.split(key if key is not None else jax.random.PRNGKey(0), 4)
        self.dim = dim
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.window_size = window_size
        self.qk_norm = qk_norm
        self.eps = eps
        self.q = MojoGemm(dim, dim, key=ks[0])
        self.k = MojoGemm(dim, dim, key=ks[1])
        self.v = MojoGemm(dim, dim, key=ks[2])
        self.o = MojoGemm(dim, dim, key=ks[3])
        self.norm_q = MojoRMSNorm(dim, eps=eps) if qk_norm else None
        self.norm_k = MojoRMSNorm(dim, eps=eps) if qk_norm else None
        self.sdpa = MojoSdpa()
        self.grid_rope = MojoGridRoPE()

    def _qk_norm(self, norm, x):
        return norm(x) if norm is not None else x

    @staticmethod
    def _key_mask(lens, b, s):
        """(B, 1, 1, S) bool mask hiding padded keys (reference passes
        k_lens=seq_lens into its flash attention, mojo_wan_model.py)."""
        if lens is None:
            return None
        return (jnp.arange(s)[None, :] < jnp.asarray(lens).reshape(b, 1))[:, None, None, :]

    def __call__(self, x, seq_lens, grid_sizes, freqs):
        b, s = x.shape[:2]
        n, d = self.num_heads, self.head_dim
        q = self._qk_norm(self.norm_q, self.q(x)).reshape(b, s, n, d)
        k = self._qk_norm(self.norm_k, self.k(x)).reshape(b, s, n, d)
        v = self.v(x).reshape(b, s, n, d)

        qr = jnp.swapaxes(self.grid_rope(q, grid_sizes, freqs), 1, 2)
        kr = jnp.swapaxes(self.grid_rope(k, grid_sizes, freqs), 1, 2)
        out = self.sdpa(qr, kr, jnp.swapaxes(v, 1, 2),
                        attn_mask=self._key_mask(seq_lens, b, s))
        out = jnp.swapaxes(out, 1, 2).reshape(b, s, self.dim)
        return self.o(out)


class WanCrossAttention(WanSelfAttention):
    def __call__(self, x, context, context_lens):
        b = x.shape[0]
        n, d = self.num_heads, self.head_dim
        q = self._qk_norm(self.norm_q, self.q(x)).reshape(b, -1, n, d)
        k = self._qk_norm(self.norm_k, self.k(context)).reshape(b, -1, n, d)
        v = self.v(context).reshape(b, -1, n, d)
        out = self.sdpa(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
            attn_mask=self._key_mask(context_lens, b, k.shape[1]),
        )
        out = jnp.swapaxes(out, 1, 2).reshape(b, q.shape[1], self.dim)
        return self.o(out)


class WanAttentionBlock(Module):
    def __init__(self, dim, ffn_dim, num_heads, window_size=(-1, -1), qk_norm=True,
                 cross_attn_norm=False, eps=1e-6, key=None):
        ks = jax.random.split(key if key is not None else jax.random.PRNGKey(0), 5)
        self.dim = dim
        self.norm1 = MojoLayerNorm(dim, eps, elementwise_affine=False)
        self.self_attn = WanSelfAttention(dim, num_heads, window_size, qk_norm, eps, key=ks[0])
        self.norm3 = MojoLayerNorm(dim, eps) if cross_attn_norm else None
        self.cross_attn = WanCrossAttention(dim, num_heads, (-1, -1), qk_norm, eps, key=ks[1])
        self.norm2 = MojoLayerNorm(dim, eps, elementwise_affine=False)
        self.ffn_in = MojoGemm(dim, ffn_dim, key=ks[2])
        self.ffn_act = MojoGelu(approximate=True)
        self.ffn_out = MojoGemm(ffn_dim, dim, key=ks[3])
        self.modulation = winit.normal(ks[4], (1, 6, dim), jnp.float32) / dim**0.5

    def __call__(self, x, e, seq_lens, grid_sizes, freqs, context, context_lens):
        # e: (B, L1, 6, C); modulation broadcasts over the sequence axis
        e6 = self.modulation[None] + e  # (B, L1, 6, C)
        e_parts = [e6[:, :, i, :] for i in range(6)]

        y = self.self_attn(
            self.norm1(x) * (1 + e_parts[1]) + e_parts[0], seq_lens, grid_sizes, freqs
        )
        x = x + y * e_parts[2]
        x = x + self.cross_attn(self.norm3(x) if self.norm3 is not None else x, context, context_lens)
        y = self.ffn_out(self.ffn_act(self.ffn_in(self.norm2(x) * (1 + e_parts[4]) + e_parts[3])))
        x = x + y * e_parts[5]
        return x


class Head(Module):
    def __init__(self, dim, out_dim, patch_size, eps=1e-6, key=None):
        k1, k2 = jax.random.split(key if key is not None else jax.random.PRNGKey(0))
        self.dim = dim
        self.out_dim = out_dim
        self.patch_size = tuple(patch_size)
        self.norm = MojoLayerNorm(dim, eps, elementwise_affine=False)
        self.head = MojoGemm(dim, math.prod(patch_size) * out_dim, key=k1)
        self.modulation = winit.normal(k2, (1, 2, dim), jnp.float32) / dim**0.5

    def __call__(self, x, e):
        e2 = self.modulation[None] + e[:, :, None, :]  # (B, L1, 2, C)
        return self.head(self.norm(x) * (1 + e2[:, :, 1, :]) + e2[:, :, 0, :])


@dataclass
class WanConfig:
    model_type: str = "t2v"
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 2048
    ffn_dim: int = 8192
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 16
    num_layers: int = 32
    window_size: Tuple[int, int] = (-1, -1)
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6


class WanModel(Module):
    """Wan diffusion backbone supporting text-to-video and image-to-video."""

    def __init__(self, config: Optional[WanConfig] = None, key=None, **overrides):
        cfg = config or WanConfig(**overrides)
        assert cfg.model_type in ("t2v", "i2v", "ti2v", "s2v")
        self.cfg = cfg
        keys = jax.random.split(key if key is not None else jax.random.PRNGKey(0),
                                cfg.num_layers + 8)

        d = cfg.dim // cfg.num_heads
        assert cfg.dim % cfg.num_heads == 0 and d % 2 == 0

        in_dim = cfg.in_dim * 2 if cfg.model_type == "i2v" else cfg.in_dim
        self.in_dim = in_dim
        # patch embedding: strided 3-D conv (OIDHW kernel)
        bound = 1.0 / math.sqrt(in_dim * math.prod(cfg.patch_size))
        self.patch_weight = winit.uniform(
            keys[0], (cfg.dim, in_dim, *cfg.patch_size), jnp.float32, -bound, bound
        )
        self.patch_bias = winit.uniform(keys[1], (cfg.dim,), jnp.float32, -bound, bound)

        self.text_in = MojoGemm(cfg.text_dim, cfg.dim, key=keys[2])
        self.text_act = MojoGelu(approximate=True)
        self.text_out = MojoGemm(cfg.dim, cfg.dim, key=keys[3])

        self.time_in = MojoGemm(cfg.freq_dim, cfg.dim, key=keys[4])
        self.time_act = MojoSilu()
        self.time_out = MojoGemm(cfg.dim, cfg.dim, key=keys[5])
        self.time_proj = MojoGemm(cfg.dim, cfg.dim * 6, key=keys[6])

        self.blocks = [
            WanAttentionBlock(cfg.dim, cfg.ffn_dim, cfg.num_heads, cfg.window_size,
                              cfg.qk_norm, cfg.cross_attn_norm, cfg.eps, key=keys[7 + i])
            for i in range(cfg.num_layers)
        ]
        self.head = Head(cfg.dim, cfg.out_dim, cfg.patch_size, cfg.eps, key=keys[-1])

        self.freqs = jnp.concatenate(
            [
                rope_params(1024, d - 4 * (d // 6)),
                rope_params(1024, 2 * (d // 6)),
                rope_params(1024, 2 * (d // 6)),
            ],
            axis=1,
        )

    # -- helpers --------------------------------------------------------
    def _patch_embed(self, u: jax.Array) -> jax.Array:
        """u (C_in, F, H, W) -> (1, L, dim) patch tokens + grid size.

        Tokens come out in the PARAMETER dtype: casting the backbone to
        bf16 (jax.tree_util.tree_map astype — the serving precision, see
        benchmark/dit_protocol.py) makes the whole transformer run bf16
        while latents stay f32 at the model boundary."""
        wdt = self.patch_weight.dtype
        out = jax.lax.conv_general_dilated(
            u[None].astype(jnp.float32),
            self.patch_weight.astype(jnp.float32),
            window_strides=self.cfg.patch_size,
            padding="VALID",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        ) + self.patch_bias.astype(jnp.float32)[None, :, None, None, None]
        grid = out.shape[2:]
        tokens = out.reshape(1, self.cfg.dim, -1).transpose(0, 2, 1)
        return tokens.astype(wdt), grid

    def calculate_freqs(self, grid_sizes, seq_len: int) -> List[jax.Array]:
        c = (self.cfg.dim // self.cfg.num_heads) // 2
        sizes = [c - 2 * (c // 3), c // 3, c // 3]
        offs = np.cumsum([0] + sizes)
        parts = [self.freqs[:, offs[i] : offs[i + 1]] for i in range(3)]
        freqs_list = []
        for f, h, w in np.asarray(grid_sizes).tolist():
            fi = jnp.concatenate(
                [
                    jnp.broadcast_to(parts[0][:f].reshape(f, 1, 1, -1), (f, h, w, sizes[0])),
                    jnp.broadcast_to(parts[1][:h].reshape(1, h, 1, -1), (f, h, w, sizes[1])),
                    jnp.broadcast_to(parts[2][:w].reshape(1, 1, w, -1), (f, h, w, sizes[2])),
                ],
                axis=-1,
            ).reshape(f * h * w, 1, -1)
            freqs_list.append(fi)
        return freqs_list

    def unpatchify(self, x: jax.Array, grid_sizes) -> List[jax.Array]:
        c = self.cfg.out_dim
        p = self.cfg.patch_size
        out = []
        for i, v in enumerate(np.asarray(grid_sizes).tolist()):
            u = x[i, : math.prod(v)].reshape(*v, *p, c)
            u = jnp.einsum("fhwpqrc->cfphqwr", u)
            out.append(u.reshape(c, *[a * b for a, b in zip(v, p)]))
        return out

    def __call__(self, x: List[jax.Array], t: jax.Array, context: List[jax.Array],
                 seq_len: int, y: Optional[List[jax.Array]] = None) -> List[jax.Array]:
        """x: list of (C_in, F, H, W); t: (B,) or (B, seq_len);
        context: list of (L, text_dim). Returns denoised videos."""
        cfg = self.cfg
        if cfg.model_type == "i2v":
            assert y is not None
        if y is not None:
            x = [jnp.concatenate([u, v], axis=0) for u, v in zip(x, y)]

        tokens, grids = [], []
        for u in x:
            tok, grid = self._patch_embed(u)
            tokens.append(tok)
            grids.append(grid)
        grid_sizes = np.asarray(grids)
        # token counts come from SHAPES, so they are static: when every
        # clip fills seq_len exactly (the standard single-geometry batch)
        # the key-padding mask is all-True — pass None instead, which keeps
        # MojoSdpa on the mask-free Pallas flash path (the golden fallback
        # materializes (B, H, L, L) f32 scores; measured 30% -> see
        # docs/kernels.md DiT section)
        lens_static = [tok.shape[1] for tok in tokens]
        assert max(lens_static) <= seq_len
        seq_lens = (None if all(n == seq_len for n in lens_static)
                    else jnp.asarray(lens_static, jnp.int32))
        xcat = jnp.concatenate(
            [jnp.pad(tok, ((0, 0), (0, seq_len - tok.shape[1]), (0, 0))) for tok in tokens]
        )

        # time embeddings (per-token timestep support). Uniform t — the
        # standard denoise step — runs the two timestep MLPs at ONE
        # position per batch row and lets (B, 1, ...) broadcasting do the
        # rest: identical values, seq_len x fewer MLP FLOPs (~39 GFLOP at
        # the (1,60,104) latent, measured in the step profile).
        bt = t.shape[0]
        tl = 1 if t.ndim == 1 else seq_len
        if t.ndim == 1:
            t = t[:, None]
        emb = sinusoidal_embedding_1d(cfg.freq_dim, t.reshape(-1)).reshape(bt, tl, -1)
        emb = emb.astype(self.patch_weight.dtype)
        e = self.time_out(self.time_act(self.time_in(emb)))
        e0 = self.time_proj(self.time_act(e)).reshape(bt, tl, 6, cfg.dim)

        # context
        ctx = jnp.stack(
            [jnp.pad(u, ((0, cfg.text_len - u.shape[0]), (0, 0))) for u in context]
        ).astype(self.patch_weight.dtype)
        ctx = self.text_out(self.text_act(self.text_in(ctx)))

        freqs_list = self.calculate_freqs(grid_sizes, seq_len)

        h = xcat
        for block in self.blocks:
            h = block(h, e0, seq_lens, grid_sizes, freqs_list, ctx, None)
        h = self.head(h, e)
        return [u.astype(jnp.float32) for u in self.unpatchify(h, grid_sizes)]
