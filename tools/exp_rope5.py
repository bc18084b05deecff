"""RoPE experiment 5: can anything lift the Pallas ~275 GB/s DMA cap?

Levers: block size up to 8 MB, input_output_aliasing (in-place rope on a
donated buffer), and their combination — measured on the pure copy and
on the real rope kernel at the big published shape.
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


def copy_rows(x, *, rows, alias=False):
    T, D = x.shape
    kw = dict(input_output_aliases={0: 0}) if alias else {}
    return pl.pallas_call(
        lambda x_ref, o_ref: o_ref.__setitem__((...,), x_ref[...]),
        grid=(T // rows,),
        in_specs=[pl.BlockSpec((rows, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype), **kw)(x)


def _rope_kernel(x_ref, c_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    c = c_ref[...][None]
    s = s_ref[...][None]
    h = x.shape[-1] // 2
    xl, xh = x[..., :h], x[..., h:]
    lo = xl * c[..., :h] - xh * s[..., :h]
    hi = xh * c[..., h:] + xl * s[..., h:]
    o_ref[...] = jnp.concatenate([lo, hi], -1).astype(o_ref.dtype)


def rope4(x, cos, sin, *, blk, hblk, alias=False):
    B, H, S, D = x.shape
    kw = dict(input_output_aliases={0: 0}) if alias else {}
    return pl.pallas_call(
        _rope_kernel,
        grid=(S // blk, H // hblk, B),
        in_specs=[
            pl.BlockSpec((1, hblk, blk, D), lambda j, h, b: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda j, h, b: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda j, h, b: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hblk, blk, D), lambda j, h, b: (b, h, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype), **kw)(x, cos, sin)


def main():
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.standard_normal((32 * 32 * 8192, 128)), jnp.bfloat16)
    GB = 2 * x2.size * 2 / 1e9
    for rows in (8192, 16384, 32768):
        for alias in (False, True):
            fn = jax.jit(functools.partial(copy_rows, rows=rows, alias=alias),
                         donate_argnums=(0,) if alias else ())
            try:
                us = device_time_us(fn, x2, iters=4)
                print(f"copy rows={rows:6d} alias={int(alias)}: {us:9.1f} us "
                      f"({GB/(us*1e-6):5.0f} GB/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"copy rows={rows:6d} alias={int(alias)}: FAIL {str(e)[:90]}",
                      flush=True)

    S, D = 8192, 128
    cos = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((32, 32, S, D)), jnp.bfloat16)
    for alias in (False, True):
        fn = jax.jit(functools.partial(rope4, blk=256, hblk=8, alias=alias),
                     donate_argnums=(0,) if alias else ())
        try:
            us = device_time_us(fn, q, cos, sin, iters=4)
            print(f"rope big alias={int(alias)}: {us:9.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"rope big alias={int(alias)}: FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
