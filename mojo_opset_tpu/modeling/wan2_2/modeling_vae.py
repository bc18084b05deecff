"""Wan2.2 causal video VAE (TPU-native).

Capability parity with reference mojo_opset/modeling/wan2_2/mojo_vae2_2.py
(CausalConv3d :20, Resample :56, ResidualBlock :162, AttentionBlock :203,
AvgDown3D :276, DupUp3D :329, Down/Up_ResidualBlock :373/:406,
Encoder3d :444, Decoder3d :556, WanVAE_ :671, Wan2_2_VAE :828).

The temporal feat-cache streaming (CACHE_T=2 frame carry between chunks)
is part of the model's semantics — encode consumes frames in 1+4k chunks
and decode emits frame-by-frame; caches are host-side lists of arrays
(eager golden; per-chunk jit is a later optimization).
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.module import Module
from mojo_opset_tpu.core.operators import MojoSilu
from mojo_opset_tpu.experimental.operators.normalization import MojoChannelRMSNorm
from mojo_opset_tpu.utils import init as winit

CACHE_T = 2


def _conv_init(key, shape, fan_in):
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    w = winit.uniform(k1, shape, jnp.float32, -bound, bound)
    b = winit.uniform(k2, (shape[0],), jnp.float32, -bound, bound)
    return w, b


class CausalConv3d(Module):
    """3-D conv, causal in time: left-pads 2*pad_t frames (or consumes the
    streamed cache), symmetric spatial padding."""

    def __init__(self, in_dim, out_dim, kernel_size, stride=1, padding=0, key=None):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,) * 3
        if isinstance(stride, int):
            stride = (stride,) * 3
        if isinstance(padding, int):
            padding = (padding,) * 3
        self.kernel_size = tuple(kernel_size)
        self.stride = tuple(stride)
        self.pad = tuple(padding)  # (t, h, w)
        fan_in = in_dim * math.prod(kernel_size)
        self.weight, self.bias = _conv_init(
            key if key is not None else jax.random.PRNGKey(0),
            (out_dim, in_dim, *kernel_size), fan_in,
        )

    def __call__(self, x: jax.Array, cache_x: Optional[jax.Array] = None) -> jax.Array:
        pt, ph, pw = self.pad
        t_left = 2 * pt
        if cache_x is not None and t_left > 0:
            x = jnp.concatenate([cache_x.astype(x.dtype), x], axis=2)
            t_left -= cache_x.shape[2]
        x = jnp.pad(x, ((0, 0), (0, 0), (t_left, 0), (ph, ph), (pw, pw)))
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), self.weight, window_strides=self.stride,
            padding="VALID", dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )
        return out + self.bias[None, :, None, None, None]


class Conv2dSame(Module):
    def __init__(self, dim_in, dim_out, kernel, stride=1, padding=0, key=None):
        if isinstance(kernel, int):
            kernel = (kernel, kernel)
        self.stride = (stride, stride) if isinstance(stride, int) else stride
        self.padding = (padding, padding) if isinstance(padding, int) else padding
        fan_in = dim_in * math.prod(kernel)
        self.weight, self.bias = _conv_init(
            key if key is not None else jax.random.PRNGKey(0), (dim_out, dim_in, *kernel), fan_in
        )

    def __call__(self, x, extra_pad=None):
        ph, pw = self.padding
        pads = ((0, 0), (0, 0), (ph, ph), (pw, pw))
        if extra_pad is not None:  # (left, right, top, bottom)
            l, r, t, b = extra_pad
            pads = ((0, 0), (0, 0), (t + ph, b + ph), (l + pw, r + pw))
        x = jnp.pad(x, pads)
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), self.weight, window_strides=self.stride,
            padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out + self.bias[None, :, None, None]


def _upsample2x_nearest(x: jax.Array) -> jax.Array:
    """(N, C, H, W) nearest-exact 2x."""
    x = jnp.repeat(x, 2, axis=-2)
    return jnp.repeat(x, 2, axis=-1)


class Resample(Module):
    def __init__(self, dim, mode, key=None):
        assert mode in ("none", "upsample2d", "upsample3d", "downsample2d", "downsample3d")
        k1, k2 = jax.random.split(key if key is not None else jax.random.PRNGKey(0))
        self.dim = dim
        self.mode = mode
        if mode in ("upsample2d", "upsample3d"):
            self.conv = Conv2dSame(dim, dim, 3, padding=1, key=k1)
        elif mode in ("downsample2d", "downsample3d"):
            self.conv = Conv2dSame(dim, dim, 3, stride=2, padding=0, key=k1)
        else:
            self.conv = None
        if mode == "upsample3d":
            self.time_conv = CausalConv3d(dim, dim * 2, (3, 1, 1), padding=(1, 0, 0), key=k2)
        elif mode == "downsample3d":
            self.time_conv = CausalConv3d(dim, dim, (3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0), key=k2)
        else:
            self.time_conv = None

    def _spatial(self, x):
        b, c, t, h, w = x.shape
        x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        if self.mode in ("upsample2d", "upsample3d"):
            x2 = self.conv(_upsample2x_nearest(x2.astype(jnp.float32)).astype(x2.dtype))
        elif self.mode in ("downsample2d", "downsample3d"):
            x2 = self.conv(x2, extra_pad=(0, 1, 0, 1))
        h2, w2 = x2.shape[-2:]
        return x2.reshape(b, t, -1, h2, w2).transpose(0, 2, 1, 3, 4)

    def __call__(self, x, feat_cache=None, feat_idx=None):
        b, c, t, h, w = x.shape
        if self.mode == "upsample3d" and feat_cache is not None:
            idx = feat_idx[0]
            if feat_cache[idx] is None:
                feat_cache[idx] = "Rep"
                feat_idx[0] += 1
            else:
                cache_x = x[:, :, -CACHE_T:]
                if cache_x.shape[2] < 2 and feat_cache[idx] is not None and feat_cache[idx] != "Rep":
                    cache_x = jnp.concatenate(
                        [feat_cache[idx][:, :, -1:][:, :, :], cache_x], axis=2
                    )
                if cache_x.shape[2] < 2 and feat_cache[idx] == "Rep":
                    cache_x = jnp.concatenate([jnp.zeros_like(cache_x), cache_x], axis=2)
                if feat_cache[idx] == "Rep":
                    x = self.time_conv(x)
                else:
                    x = self.time_conv(x, feat_cache[idx])
                feat_cache[idx] = cache_x
                feat_idx[0] += 1
                x = x.reshape(b, 2, c, t, h, w)
                x = jnp.stack([x[:, 0], x[:, 1]], axis=3)
                x = x.reshape(b, c, t * 2, h, w)
        x = self._spatial(x)
        if self.mode == "downsample3d" and feat_cache is not None:
            idx = feat_idx[0]
            if feat_cache[idx] is None:
                feat_cache[idx] = x
                feat_idx[0] += 1
            else:
                cache_x = x[:, :, -1:]
                x = self.time_conv(jnp.concatenate([feat_cache[idx][:, :, -1:], x], axis=2))
                feat_cache[idx] = cache_x
                feat_idx[0] += 1
        return x


def _stream_conv(conv, x, feat_cache, feat_idx):
    """Apply a CausalConv3d with CACHE_T frame carry (reference
    ResidualBlock.forward caching pattern)."""
    if feat_cache is None:
        return conv(x)
    idx = feat_idx[0]
    cache_x = x[:, :, -CACHE_T:]
    if cache_x.shape[2] < 2 and feat_cache[idx] is not None:
        cache_x = jnp.concatenate([feat_cache[idx][:, :, -1:], cache_x], axis=2)
    out = conv(x, feat_cache[idx])
    feat_cache[idx] = cache_x
    feat_idx[0] += 1
    return out


class ResidualBlock(Module):
    def __init__(self, in_dim, out_dim, dropout=0.0, key=None):
        ks = jax.random.split(key if key is not None else jax.random.PRNGKey(0), 3)
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.norm1 = MojoChannelRMSNorm(in_dim, images=False)
        self.act = MojoSilu()
        self.conv1 = CausalConv3d(in_dim, out_dim, 3, padding=1, key=ks[0])
        self.norm2 = MojoChannelRMSNorm(out_dim, images=False)
        self.conv2 = CausalConv3d(out_dim, out_dim, 3, padding=1, key=ks[1])
        self.shortcut = CausalConv3d(in_dim, out_dim, 1, key=ks[2]) if in_dim != out_dim else None

    def __call__(self, x, feat_cache=None, feat_idx=None):
        h = self.shortcut(x) if self.shortcut is not None else x
        y = self.act(self.norm1(x))
        y = _stream_conv(self.conv1, y, feat_cache, feat_idx)
        y = self.act(self.norm2(y))
        y = _stream_conv(self.conv2, y, feat_cache, feat_idx)
        return y + h


class AttentionBlock(Module):
    """Per-frame single-head self-attention (reference :203-240)."""

    def __init__(self, dim, key=None):
        k1, k2 = jax.random.split(key if key is not None else jax.random.PRNGKey(0))
        self.dim = dim
        self.norm = MojoChannelRMSNorm(dim)
        self.to_qkv = Conv2dSame(dim, dim * 3, 1, key=k1)
        proj = Conv2dSame(dim, dim, 1, key=k2)
        # zero-init the output projection (reference :214)
        self.proj = proj.replace(weight=jnp.zeros_like(proj.weight))

    def __call__(self, x):
        identity = x
        b, c, t, h, w = x.shape
        x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x2 = self.norm(x2)
        qkv = self.to_qkv(x2).reshape(b * t, 3 * c, h * w)
        qkv = qkv.transpose(0, 2, 1)  # (bt, hw, 3c)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scores = jnp.einsum("bqc,bkc->bqk", q, k) / math.sqrt(c)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v)
        out = out.transpose(0, 2, 1).reshape(b * t, c, h, w)
        out = self.proj(out)
        return out.reshape(b, t, c, h, w).transpose(0, 2, 1, 3, 4) + identity


def patchify(x: jax.Array, patch_size: int) -> jax.Array:
    if patch_size == 1:
        return x
    from einops import rearrange

    if x.ndim == 4:
        return rearrange(x, "b c (h q) (w r) -> b (c r q) h w", q=patch_size, r=patch_size)
    if x.ndim == 5:
        return rearrange(x, "b c f (h q) (w r) -> b (c r q) f h w", q=patch_size, r=patch_size)
    raise ValueError(f"Invalid input shape: {x.shape}")


def unpatchify(x: jax.Array, patch_size: int) -> jax.Array:
    if patch_size == 1:
        return x
    from einops import rearrange

    if x.ndim == 4:
        return rearrange(x, "b (c r q) h w -> b c (h q) (w r)", q=patch_size, r=patch_size)
    if x.ndim == 5:
        return rearrange(x, "b (c r q) f h w -> b c f (h q) (w r)", q=patch_size, r=patch_size)
    return x


class AvgDown3D(Module):
    def __init__(self, in_channels, out_channels, factor_t, factor_s=1):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.factor_t = factor_t
        self.factor_s = factor_s
        self.factor = factor_t * factor_s * factor_s
        assert in_channels * self.factor % out_channels == 0
        self.group_size = in_channels * self.factor // out_channels

    def __call__(self, x: jax.Array) -> jax.Array:
        pad_t = (self.factor_t - x.shape[2] % self.factor_t) % self.factor_t
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_t, 0), (0, 0), (0, 0)))
        B, C, T, H, W = x.shape
        ft, fs = self.factor_t, self.factor_s
        x = x.reshape(B, C, T // ft, ft, H // fs, fs, W // fs, fs)
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        x = x.reshape(B, C * self.factor, T // ft, H // fs, W // fs)
        x = x.reshape(B, self.out_channels, self.group_size, T // ft, H // fs, W // fs)
        return x.mean(axis=2)


class DupUp3D(Module):
    def __init__(self, in_channels, out_channels, factor_t, factor_s=1):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.factor_t = factor_t
        self.factor_s = factor_s
        self.factor = factor_t * factor_s * factor_s
        assert out_channels * self.factor % in_channels == 0
        self.repeats = out_channels * self.factor // in_channels

    def __call__(self, x: jax.Array, first_chunk: bool = False) -> jax.Array:
        x = jnp.repeat(x, self.repeats, axis=1)
        B = x.shape[0]
        ft, fs = self.factor_t, self.factor_s
        T, H, W = x.shape[2], x.shape[3], x.shape[4]
        x = x.reshape(B, self.out_channels, ft, fs, fs, T, H, W)
        x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
        x = x.reshape(B, self.out_channels, T * ft, H * fs, W * fs)
        if first_chunk:
            x = x[:, :, ft - 1 :]
        return x


class Down_ResidualBlock(Module):
    def __init__(self, in_dim, out_dim, dropout, mult, temperal_downsample=False,
                 down_flag=False, key=None):
        keys = jax.random.split(key if key is not None else jax.random.PRNGKey(0), mult + 1)
        self.avg_shortcut = AvgDown3D(
            in_dim, out_dim,
            factor_t=2 if temperal_downsample else 1,
            factor_s=2 if down_flag else 1,
        )
        blocks = []
        d = in_dim
        for i in range(mult):
            blocks.append(ResidualBlock(d, out_dim, dropout, key=keys[i]))
            d = out_dim
        self.resample = (
            Resample(out_dim, mode="downsample3d" if temperal_downsample else "downsample2d",
                     key=keys[-1])
            if down_flag else None
        )
        self.blocks = blocks

    def __call__(self, x, feat_cache=None, feat_idx=None):
        x_copy = x
        for block in self.blocks:
            x = block(x, feat_cache, feat_idx)
        if self.resample is not None:
            x = self.resample(x, feat_cache, feat_idx)
        return x + self.avg_shortcut(x_copy)


class Up_ResidualBlock(Module):
    def __init__(self, in_dim, out_dim, dropout, mult, temperal_upsample=False,
                 up_flag=False, key=None):
        keys = jax.random.split(key if key is not None else jax.random.PRNGKey(0), mult + 1)
        self.avg_shortcut = (
            DupUp3D(in_dim, out_dim, factor_t=2 if temperal_upsample else 1,
                    factor_s=2 if up_flag else 1)
            if up_flag else None
        )
        blocks = []
        d = in_dim
        for i in range(mult):
            blocks.append(ResidualBlock(d, out_dim, dropout, key=keys[i]))
            d = out_dim
        self.resample = (
            Resample(out_dim, mode="upsample3d" if temperal_upsample else "upsample2d",
                     key=keys[-1])
            if up_flag else None
        )
        self.blocks = blocks

    def __call__(self, x, feat_cache=None, feat_idx=None, first_chunk=False):
        x_main = x
        for block in self.blocks:
            x_main = block(x_main, feat_cache, feat_idx)
        if self.resample is not None:
            x_main = self.resample(x_main, feat_cache, feat_idx)
        if self.avg_shortcut is not None:
            return x_main + self.avg_shortcut(x, first_chunk)
        return x_main


class Encoder3d(Module):
    def __init__(self, dim=128, z_dim=4, dim_mult=(1, 2, 4, 4), num_res_blocks=2,
                 attn_scales=(), temperal_downsample=(True, True, False), dropout=0.0, key=None):
        keys = jax.random.split(key if key is not None else jax.random.PRNGKey(0),
                                len(dim_mult) + 5)
        dims = [dim * u for u in [1] + list(dim_mult)]
        self.conv1 = CausalConv3d(12, dims[0], 3, padding=1, key=keys[0])
        self.downsamples = [
            Down_ResidualBlock(
                in_dim, out_dim, dropout, num_res_blocks,
                temperal_downsample=temperal_downsample[i] if i < len(temperal_downsample) else False,
                down_flag=i != len(dim_mult) - 1,
                key=keys[1 + i],
            )
            for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:]))
        ]
        out_dim = dims[-1]
        self.mid_block1 = ResidualBlock(out_dim, out_dim, dropout, key=keys[-4])
        self.mid_attn = AttentionBlock(out_dim, key=keys[-3])
        self.mid_block2 = ResidualBlock(out_dim, out_dim, dropout, key=keys[-2])
        self.head_norm = MojoChannelRMSNorm(out_dim, images=False)
        self.head_act = MojoSilu()
        self.head_conv = CausalConv3d(out_dim, z_dim, 3, padding=1, key=keys[-1])

    def __call__(self, x, feat_cache=None, feat_idx=None):
        x = _stream_conv(self.conv1, x, feat_cache, feat_idx)
        for layer in self.downsamples:
            x = layer(x, feat_cache, feat_idx)
        x = self.mid_block1(x, feat_cache, feat_idx)
        x = self.mid_attn(x)
        x = self.mid_block2(x, feat_cache, feat_idx)
        x = self.head_act(self.head_norm(x))
        return _stream_conv(self.head_conv, x, feat_cache, feat_idx)


class Decoder3d(Module):
    def __init__(self, dim=128, z_dim=4, dim_mult=(1, 2, 4, 4), num_res_blocks=2,
                 attn_scales=(), temperal_upsample=(False, True, True), dropout=0.0, key=None):
        keys = jax.random.split(key if key is not None else jax.random.PRNGKey(0),
                                len(dim_mult) + 5)
        dims = [dim * u for u in [dim_mult[-1]] + list(dim_mult)[::-1]]
        self.conv1 = CausalConv3d(z_dim, dims[0], 3, padding=1, key=keys[0])
        self.mid_block1 = ResidualBlock(dims[0], dims[0], dropout, key=keys[-4])
        self.mid_attn = AttentionBlock(dims[0], key=keys[-3])
        self.mid_block2 = ResidualBlock(dims[0], dims[0], dropout, key=keys[-2])
        self.upsamples = [
            Up_ResidualBlock(
                in_dim, out_dim, dropout, num_res_blocks + 1,
                temperal_upsample=temperal_upsample[i] if i < len(temperal_upsample) else False,
                up_flag=i != len(dim_mult) - 1,
                key=keys[1 + i],
            )
            for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:]))
        ]
        out_dim = dims[-1]
        self.head_norm = MojoChannelRMSNorm(out_dim, images=False)
        self.head_act = MojoSilu()
        self.head_conv = CausalConv3d(out_dim, 12, 3, padding=1, key=keys[-1])

    def __call__(self, x, feat_cache=None, feat_idx=None, first_chunk=False):
        x = _stream_conv(self.conv1, x, feat_cache, feat_idx)
        x = self.mid_block1(x, feat_cache, feat_idx)
        x = self.mid_attn(x)
        x = self.mid_block2(x, feat_cache, feat_idx)
        for layer in self.upsamples:
            x = layer(x, feat_cache, feat_idx, first_chunk)
        x = self.head_act(self.head_norm(x))
        return _stream_conv(self.head_conv, x, feat_cache, feat_idx)


def _count_causal_convs(mod: Module) -> int:
    count = 0

    def visit(m):
        nonlocal count
        if isinstance(m, CausalConv3d):
            count += 1
        for v in vars(m).values():
            if isinstance(v, Module):
                visit(v)
            elif isinstance(v, list):
                for e in v:
                    if isinstance(e, Module):
                        visit(e)

    visit(mod)
    return count


class WanVAE_(Module):
    def __init__(self, dim=160, dec_dim=256, z_dim=16, dim_mult=(1, 2, 4, 4),
                 num_res_blocks=2, attn_scales=(), temperal_downsample=(True, True, False),
                 dropout=0.0, key=None):
        ks = jax.random.split(key if key is not None else jax.random.PRNGKey(0), 4)
        self.z_dim = z_dim
        self.encoder = Encoder3d(dim, z_dim * 2, dim_mult, num_res_blocks, attn_scales,
                                 temperal_downsample, dropout, key=ks[0])
        self.conv1 = CausalConv3d(z_dim * 2, z_dim * 2, 1, key=ks[1])
        self.conv2 = CausalConv3d(z_dim, z_dim, 1, key=ks[2])
        self.decoder = Decoder3d(dec_dim, z_dim, dim_mult, num_res_blocks, attn_scales,
                                 tuple(temperal_downsample)[::-1], dropout, key=ks[3])

    def encode(self, x: jax.Array, scale=(0.0, 1.0)) -> jax.Array:
        """x (B, 3, T, H, W) -> latent mu (B, z, T', H/16, W/16); frames
        consumed in 1 + 4k chunks with streamed conv caches."""
        x = patchify(x, patch_size=2)
        t = x.shape[2]
        n_chunks = 1 + (t - 1) // 4
        feat_map = [None] * _count_causal_convs(self.encoder)
        outs = []
        for i in range(n_chunks):
            feat_idx = [0]
            chunk = x[:, :, :1] if i == 0 else x[:, :, 1 + 4 * (i - 1) : 1 + 4 * i]
            outs.append(self.encoder(chunk, feat_cache=feat_map, feat_idx=feat_idx))
        out = jnp.concatenate(outs, axis=2)
        mu, log_var = jnp.split(self.conv1(out), 2, axis=1)
        s0, s1 = scale
        if isinstance(s0, jax.Array) and s0.ndim > 0:
            mu = (mu - s0.reshape(1, self.z_dim, 1, 1, 1)) * s1.reshape(1, self.z_dim, 1, 1, 1)
        else:
            mu = (mu - s0) * s1
        return mu

    def decode(self, z: jax.Array, scale=(0.0, 1.0)) -> jax.Array:
        s0, s1 = scale
        if isinstance(s0, jax.Array) and s0.ndim > 0:
            z = z / s1.reshape(1, self.z_dim, 1, 1, 1) + s0.reshape(1, self.z_dim, 1, 1, 1)
        else:
            z = z / s1 + s0
        x = self.conv2(z)
        feat_map = [None] * _count_causal_convs(self.decoder)
        outs = []
        for i in range(z.shape[2]):
            feat_idx = [0]
            outs.append(
                self.decoder(x[:, :, i : i + 1], feat_cache=feat_map, feat_idx=feat_idx,
                             first_chunk=(i == 0))
            )
        out = jnp.concatenate(outs, axis=2)
        return unpatchify(out, patch_size=2)

    def __call__(self, x, scale=(0.0, 1.0)):
        mu = self.encode(x, scale)
        return self.decode(mu, scale), mu

    def reparameterize(self, mu, log_var, key):
        std = jnp.exp(0.5 * log_var)
        return mu + std * jax.random.normal(key, std.shape, std.dtype)


class Wan2_2_VAE:
    """Inference wrapper with the published latent mean/std scaling
    (reference mojo_vae2_2.py:828-985)."""

    def __init__(self, vae: Optional[WanVAE_] = None, z_dim: int = 48, dim: int = 160,
                 dec_dim: int = 256, mean=None, std=None, dtype=jnp.float32, key=None):
        self.dtype = dtype
        self.model = vae or WanVAE_(
            dim=dim, dec_dim=dec_dim, z_dim=z_dim,
            temperal_downsample=(True, True, True), key=key,
        )
        mean = np.zeros(z_dim, np.float32) if mean is None else np.asarray(mean, np.float32)
        std = np.ones(z_dim, np.float32) if std is None else np.asarray(std, np.float32)
        self.mean = jnp.asarray(mean)
        self.std = jnp.asarray(std)
        self.scale = (self.mean, 1.0 / self.std)

    def encode(self, videos: List[jax.Array]) -> List[jax.Array]:
        return [self.model.encode(u[None].astype(self.dtype), self.scale)[0] for u in videos]

    def decode(self, zs: List[jax.Array]) -> List[jax.Array]:
        return [
            jnp.clip(self.model.decode(u[None].astype(self.dtype), self.scale)[0], -1, 1)
            for u in zs
        ]
