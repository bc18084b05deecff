"""RoPE experiment 3: DMA-pattern isolation via copy kernels.

exp_rope2 showed the rope kernel is within 4% of a PURE COPY with the
same blockspec (16.3 vs 15.6 ms at B=32, floor 5.2 ms): the cost is the
DMA pattern, not compute.  Sweep grid orders / layouts on copy kernels.
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


def _copy4(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def copy_b_fast(x, *, blk, hblk):  # control: current rope grid order
    B, H, S, D = x.shape
    return pl.pallas_call(
        _copy4, grid=(S // blk, H // hblk, B),
        in_specs=[pl.BlockSpec((1, hblk, blk, D), lambda j, h, b: (b, h, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hblk, blk, D), lambda j, h, b: (b, h, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)


def copy_s_fast(x, *, blk, hblk):
    B, H, S, D = x.shape
    return pl.pallas_call(
        _copy4, grid=(B, H // hblk, S // blk),
        in_specs=[pl.BlockSpec((1, hblk, blk, D), lambda b, h, j: (b, h, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hblk, blk, D), lambda b, h, j: (b, h, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)


def _copy3(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def copy_flat_rows(x, *, rows):
    B, H, S, D = x.shape
    xf = x.reshape(B * H * S, D)
    T = xf.shape[0]
    out = pl.pallas_call(
        _copy3, grid=(T // rows,),
        in_specs=[pl.BlockSpec((rows, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), x.dtype))(xf)
    return out.reshape(x.shape)


def copy_flat2d(x, *, cols):
    flat = x.reshape(-1)
    n = flat.shape[0]
    xf = flat.reshape(n // cols, cols)
    out = pl.pallas_call(
        _copy3, grid=(xf.shape[0] // 8,),
        in_specs=[pl.BlockSpec((8, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype))(xf)
    return out.reshape(x.shape)


def main():
    BW = 820e9
    rng = np.random.default_rng(0)
    B, H, S, D = 32, 32, 8192, 128
    x = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    floor = 2 * x.size * 2 / BW * 1e6
    print(f"copy floor {floor:.0f} us ({x.size*2/2**30:.1f} GiB each way)",
          flush=True)
    cases = [
        ("b-fast blk256 hblk8 (ctrl)", functools.partial(copy_b_fast, blk=256, hblk=8)),
        ("s-fast blk256 hblk8", functools.partial(copy_s_fast, blk=256, hblk=8)),
        ("s-fast blk512 hblk4", functools.partial(copy_s_fast, blk=512, hblk=4)),
        ("s-fast blk1024 hblk2", functools.partial(copy_s_fast, blk=1024, hblk=2)),
        ("s-fast blk2048 hblk1", functools.partial(copy_s_fast, blk=2048, hblk=1)),
        ("flat rows=2048", functools.partial(copy_flat_rows, rows=2048)),
        ("flat rows=8192", functools.partial(copy_flat_rows, rows=8192)),
        ("flat2d cols=512x8", functools.partial(copy_flat2d, cols=512 * 8)),
        ("flat2d cols=65536", functools.partial(copy_flat2d, cols=65536)),
    ]
    for name, fn in cases:
        try:
            us = device_time_us(jax.jit(fn), x, iters=4)
            print(f"  {name:28s} {us:10.1f} us  ({2*x.size*2/(us*1e-6)/1e9:5.0f} GB/s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:28s} FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
