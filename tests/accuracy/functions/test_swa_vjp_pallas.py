"""Pallas custom_vjp flash SWA vs autodiff-of-golden.

The hand-written varlen GQA/SWA flash attention fwd+bwd trio
(backends/pallas/kernels/flash_vjp.py) must match the golden's value AND
all three gradients (dq, dk, dv), mirroring the reference's TTX SWA
function pair (backends/ttx/functions/attention.py:57 +
kernels/npu/a2/swa.py).  Interpret mode on CPU by default;
MOJO_TEST_TPU=1 runs real Mosaic.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.functions.attention import MojoSWAFunction

INTERPRET = os.environ.get("MOJO_TEST_TPU", "0") != "1"
if INTERPRET:
    os.environ.setdefault("MOJO_PALLAS_INTERPRET", "1")


def _pack(rng, lens, H, D, dtype):
    T = sum(lens)
    x = jnp.asarray(rng.standard_normal((T, H, D)), dtype)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    return x, cu


def _run(fn_cls, backend, q, k, v, cu_q, cu_k, do, **cfg):
    fn = fn_cls.get_backend_impl(backend, strict=(backend != "ref"))(**cfg)
    y, pull = jax.vjp(lambda q, k, v: fn(q, k, v, cu_q, cu_k), q, k, v)
    return y, pull(do.astype(y.dtype))


CASES = [
    # (q_lens, kv_lens_or_None(=same array), Hq, Hkv, D, causal, lws, gws)
    pytest.param([256], None, 4, 2, 128, True, None, None, id="single-causal-gqa"),
    pytest.param([192, 64, 300], None, 4, 4, 128, True, None, None, id="varlen-mha"),
    pytest.param([200, 312], None, 8, 2, 128, True, 128, None, id="varlen-local-window"),
    pytest.param([200, 312], None, 4, 2, 128, True, None, 64, id="varlen-global-window"),
    pytest.param([130, 382], None, 4, 2, 128, True, 96, 32, id="varlen-both-windows"),
    pytest.param([256, 128], None, 4, 2, 128, False, None, None, id="non-causal"),
    pytest.param([64, 32], [192, 256], 4, 2, 128, True, None, None, id="suffix-q"),
    pytest.param([100], None, 2, 1, 256, True, None, None, id="d256"),
]


@pytest.mark.parametrize("q_lens,kv_lens,Hq,Hkv,D,causal,lws,gws", CASES)
def test_flash_swa_matches_golden_vjp(q_lens, kv_lens, Hq, Hkv, D, causal, lws, gws):
    rng = np.random.default_rng(hash((tuple(q_lens), Hq, D, causal)) % 2**31)
    dtype = jnp.float32
    q, cu_q = _pack(rng, q_lens, Hq, D, dtype)
    if kv_lens is None:
        k, _ = _pack(rng, q_lens, Hkv, D, dtype)
        v, _ = _pack(rng, q_lens, Hkv, D, dtype)
        cu_k = cu_q  # aligned: exercises the diagonal-skip fast path
    else:
        k, cu_k = _pack(rng, kv_lens, Hkv, D, dtype)
        v, _ = _pack(rng, kv_lens, Hkv, D, dtype)
    do = jnp.asarray(rng.standard_normal(q.shape), dtype)

    cfg = dict(is_causal=causal, local_window_size=lws, global_window_size=gws)
    y_p, (dq_p, dk_p, dv_p) = _run(MojoSWAFunction, "pallas", q, k, v, cu_q, cu_k, do, **cfg)
    y_r, (dq_r, dk_r, dv_r) = _run(MojoSWAFunction, "ref", q, k, v, cu_q, cu_k, do, **cfg)

    tol = dict(atol=2e-4, rtol=2e-4)
    for got, want, name in [
        (y_p, y_r, "out"), (dq_p, dq_r, "dq"), (dk_p, dk_r, "dk"), (dv_p, dv_r, "dv")
    ]:
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            err_msg=name, **tol,
        )


def test_flash_swa_bf16_close_to_f32_golden():
    rng = np.random.default_rng(3)
    q_lens = [200, 184]
    q, cu = _pack(rng, q_lens, 4, 128, jnp.float32)
    k, _ = _pack(rng, q_lens, 2, 128, jnp.float32)
    v, _ = _pack(rng, q_lens, 2, 128, jnp.float32)
    do = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    y_r, (dq_r, dk_r, dv_r) = _run(MojoSWAFunction, "ref", q, k, v, cu, cu, do, is_causal=True)
    qb, kb, vb, dob = (x.astype(jnp.bfloat16) for x in (q, k, v, do))
    y_p, (dq_p, dk_p, dv_p) = _run(MojoSWAFunction, "pallas", qb, kb, vb, cu, cu, dob, is_causal=True)
    assert y_p.dtype == jnp.bfloat16 and dq_p.dtype == jnp.bfloat16
    for got, want, name in [
        (y_p, y_r, "out"), (dq_p, dq_r, "dq"), (dk_p, dk_r, "dk"), (dv_p, dv_r, "dv")
    ]:
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=5e-2, err_msg=name,
        )


def test_flash_swa_fully_masked_rows_zero():
    """Suffix-q with a zero-length kv sequence: golden outputs zeros and
    zero grads for those rows; the flash path must agree."""
    rng = np.random.default_rng(9)
    q, cu_q = _pack(rng, [8, 8], 4, 128, jnp.float32)
    kv_cu = jnp.asarray([0, 0, 16], jnp.int32)  # first sequence has NO kv
    k = jnp.asarray(rng.standard_normal((16, 2, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((16, 2, 128)), jnp.float32)
    do = jnp.ones_like(q)
    y_p, (dq_p, _, _) = _run(MojoSWAFunction, "pallas", q, k, v, cu_q, kv_cu, do, is_causal=True)
    y_r, (dq_r, _, _) = _run(MojoSWAFunction, "ref", q, k, v, cu_q, kv_cu, do, is_causal=True)
    np.testing.assert_allclose(np.asarray(y_p[:8]), 0.0)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dq_p), np.asarray(dq_r), atol=2e-4, rtol=2e-4)
