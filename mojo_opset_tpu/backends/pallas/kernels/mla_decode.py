"""Pallas TPU kernel: paged MLA decode in the absorbed latent space.

After weight absorption (see backends/xla/operators/mla.py) MLA decode is
multi-query attention over the latent cache: one shared KV "head" of
width r (+ decoupled-rope width dr), H query heads.  That shape is ideal
for the MXU — scores are a single (H, r)·(r, P·bs) dot per super-block —
and HBM-bound like GQA decode, so the kernel reuses the double-buffered
multi-page DMA structure of ``paged_decode.py``:

  * two slabs per super (latent (P·bs, r) + rope (P·bs, dr)), fetched as
    whole pages from the two HBM caches while the previous super's dots
    run; scores = q_latᵀc + q_peᵀpe, two dots, no concat copy;
  * the PV accumulation reuses the LATENT slab (out_lat = p·c), so the
    value side costs zero extra bandwidth — total traffic is
    (r + dr) bytes/position, the information-theoretic minimum;
  * online softmax carries (m, l) per head; the optional attention sink
    folds into l at the end; ``W_uv`` is applied outside the kernel.

Replaces the reference TTX MLA decode kernels
(experimental attention.py:131-231) as the hardware tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojo_opset_tpu.backends.pallas.kernels._compat import mosaic_f16_compat

_NEG = -1e30


def _mla_decode_kernel(
    # scalar prefetch
    seq_lens_ref,  # (B,) int32
    block_tables_ref,  # (B, S*P) int32
    # inputs
    ql_ref,  # (H, r) VMEM — absorbed latent queries (scale folded)
    qp_ref,  # (H, dr) VMEM — rope queries (scale folded)
    c_hbm,  # (N, 1, bs, r) latent cache
    p_hbm,  # (N, 1, bs, dr) rope cache
    # outputs
    o_ref,  # (H, r) VMEM — unnormalized latent accumulator / l
    # scratch
    cbuf,  # (2, P*bs, r)
    pbuf,  # (2, P*bs, dr)
    sems,  # DMA (2, 2, P)
    m_ref,  # (H, 128) f32
    l_ref,  # (H, 128) f32
    acc_ref,  # (H, r) f32
    *,
    block_size: int,
    pages_per_fetch: int,
    sink: bool,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    num_supers = pl.num_programs(1)
    P = pages_per_fetch
    bs = block_size
    seq_len = seq_lens_ref[b]

    def start_fetch(super_idx, slot):
        for p in range(P):
            page_pos = (super_idx * P + p) * bs

            @pl.when(page_pos < seq_len)
            def _():
                blk = block_tables_ref[b, super_idx * P + p]
                blk = jnp.where(blk < 0, 0, blk)
                pltpu.make_async_copy(
                    c_hbm.at[blk, 0], cbuf.at[slot, pl.ds(p * bs, bs), :], sems.at[slot, 0, p]
                ).start()
                pltpu.make_async_copy(
                    p_hbm.at[blk, 0], pbuf.at[slot, pl.ds(p * bs, bs), :], sems.at[slot, 1, p]
                ).start()

    def wait_fetch(super_idx, slot):
        for p in range(P):
            page_pos = (super_idx * P + p) * bs

            @pl.when(page_pos < seq_len)
            def _():
                pltpu.make_async_copy(
                    c_hbm.at[0, 0], cbuf.at[slot, pl.ds(p * bs, bs), :], sems.at[slot, 0, p]
                ).wait()
                pltpu.make_async_copy(
                    p_hbm.at[0, 0], pbuf.at[slot, pl.ds(p * bs, bs), :], sems.at[slot, 1, p]
                ).wait()

    @pl.when(s == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        start_fetch(0, 0)

    slot = jax.lax.rem(s, 2)
    super_start = s * P * bs

    @pl.when(s + 1 < num_supers)
    def _prefetch():
        start_fetch(s + 1, jax.lax.rem(s + 1, 2))

    @pl.when(super_start < seq_len)
    def _compute():
        wait_fetch(s, slot)
        H = ql_ref.shape[0]
        kv_pos = super_start + jax.lax.broadcasted_iota(jnp.int32, (H, P * bs), 1)
        valid = kv_pos < seq_len
        c = cbuf[slot].astype(jnp.float32)  # (P*bs, r)
        pe = pbuf[slot].astype(jnp.float32)
        sc = jax.lax.dot_general(
            ql_ref[...].astype(jnp.float32), c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            qp_ref[...].astype(jnp.float32), pe, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, P*bs)
        sc = jnp.where(valid, sc, _NEG)
        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p_ = jnp.where(valid, jnp.exp(sc - m_new), 0.0)
        l_new = l_ref[:, 0:1] * alpha + jnp.sum(p_, axis=-1, keepdims=True)
        # zero un-DMA'd rows so 0-weight rows can't poison the dot
        # (2-D iota: Mosaic only supports minor-dim insertion on 32-bit)
        col_pos = super_start + jax.lax.broadcasted_iota(
            jnp.int32, (P * bs, 1), 0
        )
        c_safe = jnp.where(col_pos < seq_len, c, 0.0)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p_, c_safe, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(s == num_supers - 1)
    def _finish():
        l = l_ref[:, 0:1]
        out = acc_ref[...] / jnp.maximum(l, 1e-38)
        o_ref[...] = jnp.where(l > 0, out, 0.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pages_per_fetch", "interpret"))
@mosaic_f16_compat
def mla_decode_absorbed(
    q_lat: jax.Array,  # (B, H, r) — scale already folded
    q_pe: jax.Array,  # (B, H, dr)
    c_cache: jax.Array,  # (N, 1, bs, r)
    pe_cache: jax.Array,  # (N, 1, bs, dr)
    total_seq_lens: jax.Array,
    block_tables: jax.Array,
    pages_per_fetch: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Returns the normalized latent attention output (B, H, r) fp32;
    the caller applies W_uv (and the attention sink correction needs the
    plain softmax — handled by the wrapper via l-free formulation: sinks
    are folded by the wrapper using a no-sink kernel pass is NOT possible,
    so the wrapper falls back to the XLA tier when a sink is present)."""
    B, H, r = q_lat.shape
    dr = q_pe.shape[-1]
    N, _, bs, _ = c_cache.shape
    NB = block_tables.shape[1]
    P = max(1, min(pages_per_fetch, NB))
    num_supers = -(-NB // P)
    if num_supers * P != NB:
        block_tables = jnp.pad(
            block_tables, ((0, 0), (0, num_supers * P - NB)), constant_values=-1
        )

    def q_index(b, s, *_):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, num_supers),
        in_specs=[
            pl.BlockSpec((None, H, r), q_index),
            pl.BlockSpec((None, H, dr), q_index),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, H, r), q_index),
        scratch_shapes=[
            pltpu.VMEM((2, P * bs, r), c_cache.dtype),
            pltpu.VMEM((2, P * bs, dr), pe_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, P)),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, r), jnp.float32),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(
            _mla_decode_kernel, block_size=bs, pages_per_fetch=P, sink=False
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, r), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * NB * bs * (r + dr),
            bytes_accessed=B * NB * bs * (r + dr) * c_cache.dtype.itemsize,
            transcendentals=B * H * NB * bs,
        ),
    )
    return kernel(
        total_seq_lens.astype(jnp.int32), block_tables.astype(jnp.int32),
        q_lat, q_pe, c_cache, pe_cache,
    )
