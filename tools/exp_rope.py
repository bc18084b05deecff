"""On-chip experiments for the RoPE head-first kernel (benchmark rows
TTXRoPE (1|32, 32, 8192, 128) — currently 0.32-0.35x vs the 910B).

Variants over (block budget, rotate formulation, compute dtype); prints
µs per variant at the published shapes plus the HBM roofline.
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


def _kernel(x_ref, c_ref, s_ref, o_ref, *, half_slice: bool, f32: bool):
    cdt = jnp.float32 if f32 else x_ref.dtype
    x = x_ref[...].astype(cdt)
    c = c_ref[...].astype(cdt)[None, None]
    s = s_ref[...].astype(cdt)[None, None]
    if half_slice:
        h = x.shape[-1] // 2
        xl, xh = x[..., :h], x[..., h:]
        lo = xl * c[..., :h] - xh * s[..., :h]
        hi = xh * c[..., h:] + xl * s[..., h:]
        o_ref[...] = jnp.concatenate([lo, hi], axis=-1).astype(o_ref.dtype)
    else:
        h = x.shape[-1] // 2
        rot = jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)
        o_ref[...] = (x * c + rot * s).astype(o_ref.dtype)


def rope_variant(x, cos, sin, *, blk, hblk, half_slice, f32):
    B, H, S, D = x.shape
    return pl.pallas_call(
        functools.partial(_kernel, half_slice=half_slice, f32=f32),
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
    BW = 820e9  # v5e HBM bytes/s
    shapes = [(1, 32, 8192, 128), (32, 32, 8192, 128)]
    rng = np.random.default_rng(0)
    for B, H, S, D in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        cos = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
        sin = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
        bytes_rw = 2 * x.size * 2 + 2 * cos.size * 4 * (1 if B == 1 else 1)
        print(f"== ({B},{H},{S},{D}) roofline {bytes_rw/BW*1e6:.0f} us")

        from mojo_opset_tpu.backends.pallas.kernels.rope import rope_head_first
        us = device_time_us(lambda x: rope_head_first(x, cos, sin), x)
        print(f"  current kernel: {us:.1f} us")

        for blk in (128, 256, 512, 1024):
            for hblk in (H,) if H * blk * D * 2 * 4 <= 96 * 2**20 else ():
                for half_slice in (False, True):
                    for f32 in (True, False):
                        if hblk * blk * D * (2 * 2 + (8 if f32 else 4)) > 100 * 2**20:
                            continue
                        try:
                            fn = functools.partial(
                                rope_variant, blk=blk, hblk=hblk,
                                half_slice=half_slice, f32=f32)
                            us = device_time_us(lambda x: fn(x, cos, sin), x)
                            print(f"  blk={blk:5d} hblk={hblk:2d} half={int(half_slice)} "
                                  f"f32={int(f32)}: {us:.1f} us")
                        except Exception as e:  # noqa: BLE001
                            print(f"  blk={blk:5d} hblk={hblk:2d} half={int(half_slice)} "
                                  f"f32={int(f32)}: FAIL {str(e)[:80]}")
        # smaller hblk sweep at the big shape
        for blk, hblk in ((512, 8), (512, 16), (1024, 8), (2048, 8), (1024, 16)):
            if S % blk or H % hblk:
                continue
            try:
                fn = functools.partial(rope_variant, blk=blk, hblk=hblk,
                                       half_slice=True, f32=True)
                us = device_time_us(lambda x: fn(x, cos, sin), x)
                print(f"  blk={blk:5d} hblk={hblk:2d} half=1 f32=1: {us:.1f} us")
            except Exception as e:  # noqa: BLE001
                print(f"  blk={blk:5d} hblk={hblk:2d}: FAIL {str(e)[:80]}")


if __name__ == "__main__":
    main()
