"""RoPE experiment 4: XLA formulations that actually fuse.

bwprobe: XLA elementwise sustains ~1.5 TB/s r+w on this chip while every
Pallas copy caps at 270-400 GB/s (Mosaic pipelining property).  The
naive jnp rope (f32 upcast + concat(rotate)) measured 43 ms at the big
pair — the upcast+concat materialize.  Try formulations XLA can fuse
into one pass.
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


def split_stack(x, c, s):
    """View D as (2, D/2): no lane-axis concat of full width."""
    h = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :h], xf[..., h:]
    c1, c2 = c[..., :h], c[..., h:]
    s1, s2 = s[..., :h], s[..., h:]
    lo = x1 * c1 - x2 * s1
    hi = x2 * c2 + x1 * s2
    return jnp.concatenate([lo, hi], -1).astype(x.dtype)


def premul_tables(x, c, s):
    """out = x*c + rot(x)*s = x*c + roll(x)*s', s' = sign-fixed sin.
    Precompute s' once (S, D): rolls become XLA dynamic-slices of x."""
    h = x.shape[-1] // 2
    sgn = jnp.concatenate([-jnp.ones((h,)), jnp.ones((h,))]).astype(jnp.float32)
    s2 = s * sgn
    xr = jnp.roll(x, h, axis=-1)
    return (x.astype(jnp.float32) * c + xr.astype(jnp.float32) * s2).astype(x.dtype)


def bf16_tables(x, c, s):
    """Keep EVERYTHING in bf16 (tables pre-cast once): one io-dtype pass."""
    h = x.shape[-1] // 2
    cb = c.astype(jnp.bfloat16)
    sb = s.astype(jnp.bfloat16)
    x1, x2 = x[..., :h], x[..., h:]
    lo = x1 * cb[..., :h] - x2 * sb[..., :h]
    hi = x2 * cb[..., h:] + x1 * sb[..., h:]
    return jnp.concatenate([lo, hi], -1)


def interleave_pack(x, c, s):
    """Reshape D -> (2, h) on a leading axis via transpose-free view:
    out built with stack on axis -2 then reshape."""
    *lead, D = x.shape
    h = D // 2
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :h], xf[..., h:]
    lo = x1 * c[..., :h] - x2 * s[..., :h]
    hi = x2 * c[..., h:] + x1 * s[..., h:]
    out = jnp.stack([lo, hi], axis=-2)  # (..., 2, h)
    return out.reshape(*lead, D).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    S, D = 8192, 128
    cos = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    c4, s4 = cos[None, None], sin[None, None]

    golden = None
    for B in (1, 32):
        q = jnp.asarray(rng.standard_normal((B, 32, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, 8, S, D)), jnp.bfloat16)
        print(f"== B={B}", flush=True)
        for name, fn in (("split_stack", split_stack),
                         ("premul_tables", premul_tables),
                         ("bf16_tables", bf16_tables),
                         ("interleave_pack", interleave_pack)):
            pair = jax.jit(lambda q, k, fn=fn: (fn(q, c4, s4), fn(k, c4, s4)))
            try:
                us = device_time_us(pair, q, k, iters=8)
                print(f"  {name:18s} {us:9.1f} us", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:18s} FAIL {str(e)[:80]}", flush=True)
        if B == 1:
            # parity sanity vs the half-slice definition
            want = split_stack(q, c4, s4)
            for name, fn in (("premul_tables", premul_tables),
                             ("interleave_pack", interleave_pack)):
                got = fn(q, c4, s4)
                err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                            - want.astype(jnp.float32))))
                print(f"  parity {name}: max|d|={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
