"""Pallas TPU kernel: grouped (ragged) matmul for MoE experts.

Replaces the reference TTX ``group_gemm`` Triton kernel family
(backends/ttx/kernels/npu/a2/group_gemm.py) and outperforms
``jax.lax.ragged_dot`` (~63% MXU utilization at the reference's headline
shape; XLA's row gather alone costs ~180 GB/s) by operating directly on
the ragged row layout:

  * the wrapper derives, per M tile, an 8-row-aligned DMA window (Mosaic
    proves dynamic sublane offsets only for multiples of the tiling), the
    owning group and the group's row range as scalar-prefetch arrays;
    each group's windows are anchored at its 8-aligned base so every
    window is EXACTLY ``bm`` rows — no MXU padding waste — at the cost of
    at most one extra window per group;
  * grid (m_tiles_max, n_tiles) with the K loop unrolled INSIDE the
    kernel body (per-grid-step fixed costs were ~25% of runtime when K
    rode the grid): activation window DMA'd once per m tile, K-chunked
    weight slabs double-buffered by global k-step parity, fp32
    accumulator carried through the unrolled loop;
  * a window fully inside its group writes its rows directly (rows of the
    same group computed twice by overlapping windows get identical
    values); windows that straddle a group boundary read-merge-write so
    neighbour groups' rows are preserved — correctness relies on
    ascending grid order, exactly like the varlen prefill kernel;
  * empty groups produce zero tiles; surplus static tiles are skipped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.backends.pallas.kernels._compat import mosaic_f16_compat


def _gmm_kernel_innerk(
    # scalar prefetch
    win_ref, tile_g_ref, tile_lo_ref, tile_hi_ref, tile_flags_ref,
    # inputs
    x_hbm, w_hbm,
    # outputs
    o_hbm,
    # scratch
    xbuf, wbuf, obuf, xsem, osem, wsem, acc_ref, opend,
    *,
    bmw: int, bn: int, bk: int, n_tiles: int, k_chunks: int,
    n_wslots: int = 3,
    trans_weight: bool = False,
):
    """Grouped-matmul kernel; K loop inside the body (see module doc)."""
    t = pl.program_id(0)
    n = pl.program_id(1)
    flags = tile_flags_ref[t]
    g = tile_g_ref[t]
    w0 = pl.multiple_of(win_ref[t], 8)
    # output writes are ASYNC and double-buffered: slot parity follows the
    # global tile index; ``opend[slot]`` (SMEM) marks an outstanding write
    # whose completion must be awaited before obuf[slot] is reused (waits
    # only validate shape, so a dummy same-shape descriptor suffices)
    oslot = jax.lax.rem(t * n_tiles + n, 2)

    def o_wait(slot):
        @pl.when(opend[slot] == 1)
        def _():
            pltpu.make_async_copy(
                obuf.at[slot], o_hbm.at[pl.ds(0, bmw), pl.ds(0, bn)], osem.at[slot]
            ).wait()
            opend[slot] = 0

    @pl.when((t == 0) & (n == 0))
    def _oinit():
        opend[0] = 0
        opend[1] = 0

    def w_dma(gi, ni, ki, s):
        # trans layout (G, N, K): tile rows are K-contiguous (bk·itemsize
        # bursts) instead of the (G, K, N) layout's bn·itemsize rows —
        # the difference between ~1 KB and ~4-8 KB HBM bursts per row.
        if trans_weight:
            src = w_hbm.at[gi, pl.ds(ni * bn, bn), pl.ds(ki * bk, bk)]
        else:
            src = w_hbm.at[gi, pl.ds(ki * bk, bk), pl.ds(ni * bn, bn)]
        return pltpu.make_async_copy(src, wbuf.at[s], wsem.at[s])

    def adv(ti, ni, ki):
        # advance the (tile, n, k-chunk) prefetch cursor by one chunk
        nk = ki + 1
        lk = nk == k_chunks
        nn = jnp.where(lk, ni + 1, ni)
        nk = jnp.where(lk, 0, nk)
        ln = lk & (nn == n_tiles)
        nt = jnp.where(ln, ti + 1, ti)
        nn = jnp.where(ln, 0, nn)
        return nt, nn, nk

    def w_start_at(ti, ni, ki, s):
        # start the weight DMA for chunk (ti, ni, ki) unless it runs off
        # the grid / into surplus flags==0 tiles (which never wait)
        safe = jnp.minimum(ti, pl.num_programs(0) - 1)

        @pl.when((ti < pl.num_programs(0)) & (tile_flags_ref[safe] > 0))
        def _():
            w_dma(tile_g_ref[safe], ni, ki, s).start()

    def x_dma(ki):
        # per-k-chunk x streaming: the n==0 step only needs chunk kc at its
        # kc-th dot, so k_chunks independent copies (own semaphores) let
        # compute start after ~bk·bmw bytes instead of the full bmw×K window
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(w0, bmw), pl.ds(ki * bk, bk)],
            xbuf.at[:, pl.ds(ki * bk, bk)],
            xsem.at[ki],
        )

    @pl.when(flags > 0)
    def _run():
        @pl.when(n == 0)
        def _():
            for ki in range(k_chunks):
                x_dma(ki).start()

        @pl.when((t == 0) & (n == 0))
        def _():
            # bootstrap the 2-deep weight prefetch chain: chunks 0 and 1
            w_dma(g, 0, 0, 0).start()
            t1, n1, k1 = adv(t, n, 0)
            w_start_at(t1, n1, k1, 1)

        aslot = 0  # single acc buffer (double-buffering it overflows VMEM)

        def chunk_dot(kc):
            # slot index follows the GLOBAL k-step index so the cross-step
            # prefetch chain stays consistent for odd k_chunks
            li = (t * n_tiles + n) * k_chunks + kc
            slot = jax.lax.rem(li, n_wslots)
            # prefetch 2 chunks ahead (wrapping across n tiles / m tiles):
            # one-chunk lead (~bk·bn·2/819GB/s of cover) gets swamped when
            # the n==0 step's x window competes for the DMA queue
            t1, n1, k1 = adv(t, n, kc)
            t2, n2, k2 = adv(t1, n1, k1)
            w_start_at(t2, n2, k2, jax.lax.rem(li + 2, n_wslots))

            @pl.when(n == 0)
            def _():
                x_dma(kc).wait()

            w_dma(g, n, kc, slot).wait()
            k_off = pl.multiple_of(kc * bk, bk)
            return jax.lax.dot_general(
                xbuf[:, pl.ds(k_off, bk)], wbuf[slot],
                (((1,), (1,) if trans_weight else (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def body(kc, acc):
            partial = chunk_dot(kc)

            # accumulate straight into the VMEM scratch (a loop carry would
            # stack an extra fp32 tile per unrolled step -> scoped-vmem OOM)
            @pl.when(kc == 0)
            def _():
                acc_ref[aslot] = partial

            @pl.when(kc > 0)
            def _():
                acc_ref[aslot] = acc_ref[aslot] + partial

            return 0

        # the last chunk's add is fused into the output cast instead of a
        # round-trip through acc_ref (saves ~2 VMEM MB of VPU traffic per
        # step and shortens the dot->acc->out dependency chain)
        jax.lax.fori_loop(0, k_chunks - 1, body, 0, unroll=True)
        last = chunk_dot(k_chunks - 1)
        out = acc_ref[aslot] + last if k_chunks > 1 else last
        o_wait(oslot)  # obuf[oslot] may still be draining from 2 tiles ago

        @pl.when(flags == 1)
        def _():
            obuf[oslot] = out.astype(obuf.dtype)

        @pl.when(flags == 2)
        def _():
            # boundary merge reads o_hbm rows an earlier overlapping window
            # may still be writing — drain the other slot too before reading
            o_wait(1 - oslot)
            rd = pltpu.make_async_copy(
                o_hbm.at[pl.ds(w0, bmw), pl.ds(n * bn, bn)], obuf.at[oslot],
                osem.at[oslot],
            )
            rd.start()
            rd.wait()
            row = w0 + jax.lax.broadcasted_iota(jnp.int32, (bmw, 1), 0)
            mine = (row >= tile_lo_ref[t]) & (row < tile_hi_ref[t])
            obuf[oslot] = jnp.where(
                mine, out, obuf[oslot].astype(jnp.float32)
            ).astype(obuf.dtype)

        pltpu.make_async_copy(
            obuf.at[oslot], o_hbm.at[pl.ds(w0, bmw), pl.ds(n * bn, bn)], osem.at[oslot]
        ).start()
        opend[oslot] = 1

    # drain both slots at the final grid step (surplus flags==0 steps run
    # this too, which is harmless)
    @pl.when((t == pl.num_programs(0) - 1) & (n == n_tiles - 1))
    def _drain():
        o_wait(0)
        o_wait(1)


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "interpret", "trans_weight")
)
@mosaic_f16_compat
def grouped_matmul(
    x: jax.Array,  # (M, K) rows sorted by group
    weights: jax.Array,  # (G, K, N); (G, N, K) when trans_weight
    group_sizes: jax.Array,  # (G,) int32
    bm: int = 512,
    bn: int = 512,
    bk: int = 2048,
    interpret: bool = False,
    trans_weight: bool = False,
) -> jax.Array:
    """Ragged grouped matmul; out[r] = x[r] @ weights[group_of(r)].

    ``trans_weight`` reads the (G, N, K) layout directly — K-contiguous
    DMA tiles (long HBM bursts) and no materialized transpose when the
    caller stores weights N-major (as ``nn.Linear``-style checkpoints do).
    """
    M, K = x.shape
    if trans_weight:
        G, N, _ = weights.shape
    else:
        G, _, N = weights.shape
    bm = min(bm, max(8, (M // 8) * 8))
    bn = min(bn, N)
    bk = min(bk, K)
    # dtype-aware VMEM fit: the default blocks are sized for 2-byte IO;
    # fp32 operands (e.g. the f16-compat upcast path) double every scratch
    # buffer and blow the 16 MB scoped-vmem limit.  Shrink bk -> bm -> bn
    # (cheapest reuse loss first) until the scratch estimate fits.
    isz, wisz = x.dtype.itemsize, weights.dtype.itemsize

    def _scratch(bm_, bn_, bk_):
        return bm_ * K * isz + 3 * bn_ * bk_ * wisz + 2 * bm_ * bn_ * isz

    while _scratch(bm, bn, bk) > 13 * 1024 * 1024:
        if bk > 128 and K % (bk // 2) == 0:
            bk //= 2
        elif bm > 8:
            bm = max(8, (bm // 2) // 8 * 8)
        elif bn > 128 and N % (bn // 2) == 0:
            bn //= 2
        else:
            break
    bmw = bm  # window size == tile size (8-aligned anchors, no padding)
    if N % bn or K % bk or bn % 128 or bk % 128 or bm % 8 or M % 8 or M < bmw:
        raise ValueError(f"unsupported gmm geometry M={M} K={K} N={N} bm={bm} bn={bn} bk={bk}")

    counts = group_sizes.astype(jnp.int32)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    # Each group's windows are anchored at its 8-aligned base, so every
    # window is exactly bm rows (no MXU padding waste) and 8-aligned; a
    # group needs at most one extra window vs ceil(count/bm).
    a8 = (offsets[:-1] // 8) * 8
    nt_g = jnp.where(counts > 0, (offsets[1:] - a8 + bm - 1) // bm, 0)
    cum_nt = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(nt_g)])
    T = M // bm + 2 * G  # static bound

    t_ids = jnp.arange(T, dtype=jnp.int32)
    gid = jnp.clip(jnp.searchsorted(cum_nt, t_ids, side="right") - 1, 0, G - 1)
    i_local = t_ids - cum_nt[gid]
    lo, hi = offsets[gid], offsets[gid + 1]
    w0 = jnp.clip(a8[gid] + i_local * bm, 0, M - bm)
    valid = t_ids < cum_nt[G]
    # direct write only when the whole window lies inside the group
    inside = (w0 >= lo) & (w0 + bm <= hi)
    flags = jnp.where(valid, jnp.where(inside, 1, 2), 0).astype(jnp.int32)

    n_tiles = N // bn
    k_chunks = K // bk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(T, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((bmw, K), x.dtype),
            pltpu.VMEM((3, bn, bk) if trans_weight else (3, bk, bn), weights.dtype),
            pltpu.VMEM((2, bmw, bn), x.dtype),
            pltpu.SemaphoreType.DMA((k_chunks,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((1, bmw, bn), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(
            _gmm_kernel_innerk, bmw=bmw, bn=bn, bk=bk, n_tiles=n_tiles,
            k_chunks=k_chunks, trans_weight=trans_weight,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=(M * K + M * N) * x.dtype.itemsize
            + (M // bm + G) * K * N // n_tiles * weights.dtype.itemsize,
            transcendentals=0,
        ),
    )
    return kernel(w0, gid, lo, hi, flags, x, weights)
