"""Pallas TPU kernel: paged KV-cache store (prefill chunk writes).

Replaces the reference TTX kv_cache store kernels
(backends/ttx/kernels/npu/a2/kv_cache.py).  Prefill writes are
block-contiguous token runs; XLA's row scatter moves them at ~46 GB/s on
v5e.  This kernel pipelines, per (sequence, block) chunk:

  HBM cache block  ─┐
                    ├─ masked merge in VMEM ─→ HBM cache block
  HBM new-KV rows  ─┘

with double-buffered DMA (fetch chunk i+1 while merging chunk i), so the
store runs at copy speed.  Chunk plans ride scalar prefetch; the new-KV
source is padded by one block on each side so every chunk reads a full
``bs``-row window at an arbitrary (untiled, major-dim) offset.

Both cache layouts are supported: NHD (N, bs, Hkv, D) merges directly,
HND (N, Hkv, bs, D) transposes the source window in VMEM.  Decode steps
(one token per sequence) use ``store_paged_kv_decode`` — direct aliased
HBM->HBM row DMAs, no cache copy in either layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.backends.pallas.kernels._compat import mosaic_f16_bitcast


def _store_kernel(
    # scalar prefetch
    blk_ref, src_ref, off_ref, len_ref,
    # inputs
    k_pad_hbm, v_pad_hbm, kc_in, vc_in,
    # outputs (aliased with kc_in / vc_in)
    kc_hbm, vc_hbm,
    # scratch
    kblk, vblk, ksrc, vsrc, fsem, wsem,
    *,
    bs: int,
    nhd: bool,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def start_fetch(ci, slot):
        b = blk_ref[ci]
        s = src_ref[ci] - off_ref[ci] + bs  # padded-window start

        @pl.when(len_ref[ci] > 0)
        def _():
            pltpu.make_async_copy(kc_hbm.at[b], kblk.at[slot], fsem.at[slot, 0]).start()
            pltpu.make_async_copy(vc_hbm.at[b], vblk.at[slot], fsem.at[slot, 1]).start()
            pltpu.make_async_copy(k_pad_hbm.at[pl.ds(s, bs)], ksrc.at[slot], fsem.at[slot, 2]).start()
            pltpu.make_async_copy(v_pad_hbm.at[pl.ds(s, bs)], vsrc.at[slot], fsem.at[slot, 3]).start()

    def wait_fetch(ci, slot):
        b = blk_ref[ci]
        s = src_ref[ci] - off_ref[ci] + bs

        @pl.when(len_ref[ci] > 0)
        def _():
            pltpu.make_async_copy(kc_hbm.at[b], kblk.at[slot], fsem.at[slot, 0]).wait()
            pltpu.make_async_copy(vc_hbm.at[b], vblk.at[slot], fsem.at[slot, 1]).wait()
            pltpu.make_async_copy(k_pad_hbm.at[pl.ds(s, bs)], ksrc.at[slot], fsem.at[slot, 2]).wait()
            pltpu.make_async_copy(v_pad_hbm.at[pl.ds(s, bs)], vsrc.at[slot], fsem.at[slot, 3]).wait()

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        start_fetch(0, 0)

    # before reusing this slot's buffers for the NEXT fetch, its previous
    # write-back must have completed (chunk i-? used slot (i+1)%2 at i-1)
    @pl.when((i + 1 < n))
    def _prefetch():
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i >= 1)
        def _():
            prev = i - 1  # chunk that used slot nxt

            @pl.when(len_ref[prev] > 0)
            def _():
                b = blk_ref[prev]
                pltpu.make_async_copy(kblk.at[nxt], kc_hbm.at[b], wsem.at[nxt, 0]).wait()
                pltpu.make_async_copy(vblk.at[nxt], vc_hbm.at[b], wsem.at[nxt, 1]).wait()

        start_fetch(i + 1, nxt)

    @pl.when(len_ref[i] > 0)
    def _merge():
        wait_fetch(i, slot)
        o, L = off_ref[i], len_ref[i]
        if nhd:
            rows = jax.lax.broadcasted_iota(jnp.int32, (bs, 1, 1), 0)
            keep = (rows >= o) & (rows < o + L)
            kblk[slot] = jnp.where(keep, ksrc[slot], kblk[slot])
            vblk[slot] = jnp.where(keep, vsrc[slot], vblk[slot])
        else:
            # HND block (Hkv, bs, D); src window is (bs, Hkv, D)
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, bs, 1), 1)
            keep = (rows >= o) & (rows < o + L)
            kblk[slot] = jnp.where(keep, jnp.swapaxes(ksrc[slot], 0, 1), kblk[slot])
            vblk[slot] = jnp.where(keep, jnp.swapaxes(vsrc[slot], 0, 1), vblk[slot])
        b = blk_ref[i]
        pltpu.make_async_copy(kblk.at[slot], kc_hbm.at[b], wsem.at[slot, 0]).start()
        pltpu.make_async_copy(vblk.at[slot], vc_hbm.at[b], wsem.at[slot, 1]).start()

    # drain the last two writes at the final step
    @pl.when(i == n - 1)
    def _drain():
        @pl.when(len_ref[i] > 0)
        def _():
            b = blk_ref[i]
            pltpu.make_async_copy(kblk.at[slot], kc_hbm.at[b], wsem.at[slot, 0]).wait()
            pltpu.make_async_copy(vblk.at[slot], vc_hbm.at[b], wsem.at[slot, 1]).wait()

        @pl.when(i >= 1)
        def _():
            prev = i - 1
            other = jax.lax.rem(prev, 2)

            @pl.when(len_ref[prev] > 0)
            def _():
                b = blk_ref[prev]
                pltpu.make_async_copy(kblk.at[other], kc_hbm.at[b], wsem.at[other, 0]).wait()
                pltpu.make_async_copy(vblk.at[other], vc_hbm.at[b], wsem.at[other, 1]).wait()


def _decode_store_kernel(
    # scalar prefetch
    blk_ref, off_ref, valid_ref,
    # inputs
    k_hbm, v_hbm, kc_in, vc_in,
    # outputs (aliased)
    kc_hbm, vc_hbm,
    # scratch
    sem,
    *,
    nhd: bool,
):
    """Decode store: one token per sequence, written straight HBM->HBM.

    Each grid step issues two small DMAs (K and V rows of one token) into
    the aliased cache; NHD dst is contiguous (1, Hkv, D), HND dst is the
    head-strided column (Hkv, 1, D) — both are plain slices the DMA engine
    handles."""
    b = pl.program_id(0)

    @pl.when(valid_ref[b] > 0)
    def _():
        blk, off = blk_ref[b], off_ref[b]
        ksrc = k_hbm.at[b]  # (Hkv, D)
        vsrc = v_hbm.at[b]
        if nhd:
            kdst = kc_hbm.at[blk, off]  # (Hkv, D) contiguous
            vdst = vc_hbm.at[blk, off]
        else:
            kdst = kc_hbm.at[blk, :, off]  # (Hkv, D) head-strided
            vdst = vc_hbm.at[blk, :, off]
        ck = pltpu.make_async_copy(ksrc, kdst, sem.at[0])
        cv = pltpu.make_async_copy(vsrc, vdst, sem.at[1])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()


@functools.partial(jax.jit, static_argnames=("kv_layout", "interpret"))
@mosaic_f16_bitcast
def store_paged_kv_decode(
    key_states: jax.Array,  # (B, Hkv, D)
    value_states: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    dst_block: jax.Array,  # (B,) int32, -1 = skip
    dst_offset: jax.Array,  # (B,)
    kv_layout: str = "HND",
    interpret: bool = False,
):
    B = key_states.shape[0]
    valid = (dst_block >= 0).astype(jnp.int32)
    blk = jnp.clip(dst_block, 0, key_cache.shape[0] - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = pl.pallas_call(
        functools.partial(_decode_store_kernel, nhd=(kv_layout == "NHD")),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(key_cache.shape, key_cache.dtype),
            jax.ShapeDtypeStruct(value_cache.shape, value_cache.dtype),
        ],
        # inputs: (blk, off, valid, k, v, key_cache, value_cache)
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )
    return kernel(
        blk.astype(jnp.int32), dst_offset.astype(jnp.int32), valid,
        key_states.astype(key_cache.dtype), value_states.astype(value_cache.dtype),
        key_cache, value_cache,
    )


@functools.partial(jax.jit, static_argnames=("kv_layout", "interpret"))
@mosaic_f16_bitcast
def store_paged_kv_prefill(
    key_states: jax.Array,  # (T, Hkv, D)
    value_states: jax.Array,
    key_cache: jax.Array,  # (N, bs, Hkv, D) NHD / (N, Hkv, bs, D) HND
    value_cache: jax.Array,
    blk: jax.Array,  # (C,) int32 chunk plan (clipped to valid range)
    src: jax.Array,  # (C,)
    off: jax.Array,  # (C,)
    length: jax.Array,  # (C,)
    kv_layout: str = "NHD",
    interpret: bool = False,
):
    nhd = kv_layout == "NHD"
    if nhd:
        N, bs, Hkv, D = key_cache.shape
    else:
        N, Hkv, bs, D = key_cache.shape
    blk_shape = (2, bs, Hkv, D) if nhd else (2, Hkv, bs, D)
    k_pad = jnp.pad(key_states, ((bs, bs), (0, 0), (0, 0))).astype(key_cache.dtype)
    v_pad = jnp.pad(value_states, ((bs, bs), (0, 0), (0, 0))).astype(value_cache.dtype)
    C = blk.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(C,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM(blk_shape, key_cache.dtype),
            pltpu.VMEM(blk_shape, value_cache.dtype),
            pltpu.VMEM((2, bs, Hkv, D), key_cache.dtype),
            pltpu.VMEM((2, bs, Hkv, D), value_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_store_kernel, bs=bs, nhd=nhd),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(key_cache.shape, key_cache.dtype),
            jax.ShapeDtypeStruct(value_cache.shape, value_cache.dtype),
        ],
        # indices count the scalar-prefetch operands too: inputs are
        # (blk, src, off, len, k_pad, v_pad, key_cache, value_cache)
        input_output_aliases={6: 0, 7: 1},  # caches update in place
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    return kernel(
        blk.astype(jnp.int32), src.astype(jnp.int32),
        off.astype(jnp.int32), length.astype(jnp.int32),
        k_pad, v_pad, key_cache, value_cache,
    )
