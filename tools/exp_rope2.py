"""RoPE experiment 2: XLA-fusion tier vs Pallas kernel vs DMA floor.

Every Pallas variant plateaus at ~2x the HBM roofline (exp_rope.py).
Measure (a) the plain jnp formulation XLA fuses itself, (b) a pure-copy
Pallas kernel with the same blockspec (isolates DMA-vs-compute), at the
published pair shapes (q AND k rotated, bf16, f32 tables).
"""

from __future__ import annotations

import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.benchmark.timing import device_time_us


def xla_rope_pair(q, k, cos, sin):
    def rot(x):
        h = x.shape[-1] // 2
        return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)

    c = cos[None, None].astype(jnp.float32)
    s = sin[None, None].astype(jnp.float32)

    def app(x):
        xf = x.astype(jnp.float32)
        return (xf * c + rot(xf) * s).astype(x.dtype)

    return app(q), app(k)


def xla_rope_pair_halfslice(q, k, cos, sin):
    c = cos[None, None].astype(jnp.float32)
    s = sin[None, None].astype(jnp.float32)

    def app(x):
        xf = x.astype(jnp.float32)
        h = xf.shape[-1] // 2
        xl, xh = xf[..., :h], xf[..., h:]
        lo = xl * c[..., :h] - xh * s[..., :h]
        hi = xh * c[..., h:] + xl * s[..., h:]
        return jnp.concatenate([lo, hi], axis=-1).astype(x.dtype)

    return app(q), app(k)


def _copy_kernel(x_ref, c_ref, s_ref, o_ref):
    o_ref[...] = x_ref[...]


def copy_variant(x, cos, sin, *, blk, hblk):
    B, H, S, D = x.shape
    return pl.pallas_call(
        _copy_kernel,
        grid=(S // blk, H // hblk, B),
        in_specs=[
            pl.BlockSpec((1, hblk, blk, D), lambda j, h, b: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda j, h, b: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda j, h, b: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hblk, blk, D), lambda j, h, b: (b, h, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), x.dtype),
    )(x, cos, sin)


def main():
    BW = 820e9
    rng = np.random.default_rng(0)
    S, D = 8192, 128
    cos = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    for B in (1, 32):
        q = jnp.asarray(rng.standard_normal((B, 32, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, 8, S, D)), jnp.bfloat16)
        pair_bytes = 2 * (q.size + k.size) * 2 + 2 * S * D * 4
        print(f"== B={B} pair roofline {pair_bytes/BW*1e6:.0f} us", flush=True)
        for name, fn in (
            ("xla rot-concat pair", xla_rope_pair),
            ("xla half-slice pair", xla_rope_pair_halfslice),
        ):
            us = device_time_us(jax.jit(fn), q, k, cos, sin)
            print(f"  {name:24s} {us:9.1f} us", flush=True)
        us = device_time_us(
            jax.jit(functools.partial(copy_variant, blk=256, hblk=8)), q, cos, sin)
        print(f"  pallas pure copy (q only) {us:9.1f} us "
              f"(q floor {2*q.size*2/BW*1e6:.0f})", flush=True)
        from mojo_opset_tpu.backends.pallas.kernels.rope import rope_head_first

        us = device_time_us(
            jax.jit(lambda q, k: (rope_head_first(q, cos, sin),
                                  rope_head_first(k, cos, sin))), q, k)
        print(f"  pallas kernel pair        {us:9.1f} us", flush=True)


if __name__ == "__main__":
    main()
