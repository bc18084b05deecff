"""On-chip micro-ablations for the DiT denoise step (VERDICT r4 #5).

Three suspects at the (1, 60, 104) latent (L=1560, dim=2048, 16 heads):

1. GridRoPE: the interleaved complex formulation reshapes to
   (L, N, 64, 2) — a 2-wide lane dim, the worst possible TPU tiling —
   and pays f32 complex temporaries.  Candidate: half-split cos/sin FMA
   on contiguous 64-lane halves (exact under a static output-channel
   permutation of the q/k projection weights, which reorders the q·k
   inner product only).
2. QKV projections: three M=1560 gemms vs one fused (2048 -> 6144).
3. The AdaLN modulation chain: norm + scale/shift + gated residual
   per block — how much of the step is non-matmul elementwise.

Run on the chip: python tools/exp_dit_hotspots.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.benchmark.timing import device_time_us

L, N, D = 1560, 16, 128  # DiT 480x832 latent: tokens, heads, head_dim
DIM = N * D


def bench(name, fn, *args, iters=20):
    us = device_time_us(jax.jit(fn), *args, iters=iters)
    print(f"  {name:<44} {us:9.1f} us")
    return us


def main():
    print(f"platform={jax.devices()[0].platform}")
    key = jax.random.PRNGKey(0)
    kx, kf, kw = jax.random.split(key, 3)
    x = jax.random.normal(kx, (1, L, N, D), jnp.bfloat16)
    ang = jax.random.uniform(kf, (L, 1, D // 2), jnp.float32)
    freqs_c = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    print("-- GridRoPE formulations (per q-or-k call; x64 per step) --")

    def rope_complex(x, fc):
        xi = x[0].astype(jnp.float32).reshape(L, N, D // 2, 2)
        xc = jax.lax.complex(xi[..., 0], xi[..., 1])
        r = xc * fc
        return jnp.stack([jnp.real(r), jnp.imag(r)], -1).reshape(1, L, N, D).astype(x.dtype)

    def rope_halves(x, cos, sin):
        # assumes channel-permuted weights: first 64 lanes = real parts
        a = x[..., : D // 2].astype(jnp.float32)
        b = x[..., D // 2 :].astype(jnp.float32)
        return jnp.concatenate([a * cos - b * sin, a * sin + b * cos], -1).astype(x.dtype)

    us_c = bench("interleaved complex (current)", rope_complex, x, freqs_c)
    us_h = bench("half-split cos/sin FMA", rope_halves, x, cos, sin)
    print(f"  -> half-split is {us_c / us_h:.2f}x")

    print("-- QKV projection: 3 gemms vs fused --")
    h = jax.random.normal(kx, (1, L, DIM), jnp.bfloat16)
    w3 = [jax.random.normal(k, (DIM, DIM), jnp.bfloat16) for k in jax.random.split(kw, 3)]
    wf = jnp.concatenate(w3, axis=1)

    def qkv_sep(h, wq, wk, wv):
        return h @ wq, h @ wk, h @ wv

    def qkv_fused(h, wf):
        o = h @ wf
        return o[..., :DIM], o[..., DIM : 2 * DIM], o[..., 2 * DIM :]

    us_s = bench("3 separate (2048->2048) gemms", qkv_sep, h, *w3)
    us_f = bench("1 fused (2048->6144) gemm", qkv_fused, h, wf)
    print(f"  -> fused is {us_s / us_f:.2f}x")

    print("-- AdaLN modulation chain (norm+scale/shift+gate, one block) --")
    e = jax.random.normal(kf, (1, 1, 6, DIM), jnp.float32)
    mod = jax.random.normal(kw, (1, 6, DIM), jnp.float32) / DIM**0.5

    def chain(xx, e, mod):
        e6 = mod[None] + e
        p = [e6[:, :, i, :] for i in range(6)]
        h32 = xx.astype(jnp.float32)
        mu = h32.mean(-1, keepdims=True)
        v = ((h32 - mu) ** 2).mean(-1, keepdims=True)
        n1 = (h32 - mu) * jax.lax.rsqrt(v + 1e-6)
        y = (n1 * (1 + p[1]) + p[0]).astype(xx.dtype)
        xx = xx + y * p[2].astype(xx.dtype)
        n2 = (xx.astype(jnp.float32) - mu) * jax.lax.rsqrt(v + 1e-6)
        y2 = (n2 * (1 + p[4]) + p[3]).astype(xx.dtype)
        return xx + y2 * p[5].astype(xx.dtype)

    bench("modulation chain (x32 per step)", chain, h, e, mod)


if __name__ == "__main__":
    main()
