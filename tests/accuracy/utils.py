"""Shared helpers for accuracy tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mojo_opset_tpu.core.registry import BackendNotAvailable
from mojo_opset_tpu.utils.acc import check_tol_diff, tols_for  # noqa: F401


def get_tier(core_cls, tier, *args, **kwargs):
    try:
        impl = core_cls.get_backend_impl(tier, strict=True)
    except BackendNotAvailable:
        pytest.skip(f"{core_cls.__name__} has no '{tier}' backend")
    return impl(*args, **kwargs)


def tiers_of(core_cls):
    """All non-ref tiers registered for this op (each compared vs ref)."""
    return [b for b in core_cls.get_registered_backends() if b != "ref"]


def diff_tiers(core_cls, ctor_args=(), ctor_kwargs=None, call_args=(), call_kwargs=None, **tols):
    """Compare every non-ref tier against the golden ref tier."""
    ctor_kwargs = ctor_kwargs or {}
    call_kwargs = call_kwargs or {}
    ref = core_cls.get_backend_impl("ref")(*ctor_args, **ctor_kwargs)
    others = tiers_of(core_cls)
    if not others:
        pytest.skip(f"{core_cls.__name__} has only the ref tier")
    for tier in others:
        op = core_cls.get_backend_impl(tier)(*ctor_args, **ctor_kwargs)
        op = op.sync_weights_from(ref)
        op.forward_diff_with(ref, *call_args, **call_kwargs, **tols)


def randn(key, shape, dtype=jnp.float32, scale=1.0):
    return (jax.random.normal(jax.random.PRNGKey(key), shape) * scale).astype(dtype)


def make_paged_case(
    key=0,
    batch=3,
    n_blocks=32,
    hq=8,
    hkv=2,
    head_dim=16,
    block_size=4,
    max_blocks=5,
    seq_lens=(7, 1, 13),
    q_lens=None,
    dtype=jnp.float32,
):
    """Build a consistent paged-KV fixture: caches, tables, lens."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    key_cache = jax.random.normal(k1, (n_blocks, hkv, block_size, head_dim), dtype)
    value_cache = jax.random.normal(k2, (n_blocks, hkv, block_size, head_dim), dtype)
    seq_lens = jnp.asarray(seq_lens, jnp.int32)
    rows = []
    next_block = 0
    for sl in np.asarray(seq_lens).tolist():
        nb = -(-max(sl, 0) // block_size)
        row = list(range(next_block, next_block + nb)) + [-1] * (max_blocks - nb)
        next_block += nb
        rows.append(row)
    block_tables = jnp.asarray(rows, jnp.int32)
    out = dict(
        key_cache=key_cache,
        value_cache=value_cache,
        seq_lens=seq_lens,
        block_tables=block_tables,
        hq=hq,
        hkv=hkv,
        head_dim=head_dim,
        block_size=block_size,
    )
    if q_lens is not None:
        q_lens = jnp.asarray(q_lens, jnp.int32)
        cu_q = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(q_lens)]).astype(jnp.int32)
        cu_total = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(seq_lens)]).astype(jnp.int32)
        out.update(q_lens=q_lens, cu_q_lens=cu_q, cu_total_seq_lens=cu_total, total_q=int(cu_q[-1]))
    return out


def seed_split(fast, total):
    """Seed list for property matrices: the first ``fast`` seeds run in the
    default lane, the rest carry the ``slow`` marker (VERDICT r2 #9)."""
    import pytest

    return [*range(fast),
            *[pytest.param(s, marks=pytest.mark.slow) for s in range(fast, total)]]
