"""Pallas custom_vjp diffusion attention vs autodiff-of-golden.

The streamed-mask flash trio (backends/pallas/kernels/diffusion_vjp.py)
must match the golden's value and dq/dk/dv under arbitrary boolean
masks, mirroring the reference's diffusion-attention kernel family
(backends/ttx/kernels/npu/a2/diffution_attention.py).  Interpret mode on
CPU by default; MOJO_TEST_TPU=1 runs real Mosaic.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mojo_opset_tpu.experimental.functions.diffusion_attention import (
    MojoDiffusionAttentionFunction,
    block_diffusion_mask,
)

INTERPRET = os.environ.get("MOJO_TEST_TPU", "0") != "1"
if INTERPRET:
    os.environ.setdefault("MOJO_PALLAS_INTERPRET", "1")


def _mask(kind, S, rng):
    if kind == "block":
        return block_diffusion_mask(S, 32)
    if kind == "random":
        # random keep-mask; guarantee no fully-empty row via the diagonal
        m = jnp.asarray(rng.random((S, S)) < 0.3)
        return m | jnp.eye(S, dtype=bool)
    if kind == "empty-rows":
        # rows past S//2 attend to nothing: exercises the lse sentinel
        m = block_diffusion_mask(S, 16)
        return m & (jnp.arange(S)[:, None] < S // 2)
    raise AssertionError(kind)


CASES = [
    pytest.param(1, 4, 4, 128, 128, "block", jnp.float32, id="block-mha"),
    pytest.param(2, 4, 2, 96, 128, "random", jnp.float32, id="gqa-random-oddS"),
    pytest.param(1, 2, 1, 64, 128, "empty-rows", jnp.float32, id="empty-rows"),
    pytest.param(1, 4, 2, 128, 128, "block", jnp.bfloat16, id="bf16"),
    pytest.param(1, 2, 2, 80, 256, "random", jnp.float32, id="d256"),
]


@pytest.mark.parametrize("B,Hq,Hkv,S,D,kind,dtype", CASES)
def test_diffusion_attention_vjp_matches_golden(B, Hq, Hkv, S, D, kind, dtype):
    rng = np.random.default_rng(hash((B, Hq, S, kind)) % 2**31)
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), dtype)
    do = jnp.asarray(rng.standard_normal((B, Hq, S, D)), dtype)
    mask = _mask(kind, S, rng)
    scale = 1.0 / np.sqrt(D)

    def run(backend):
        fn = MojoDiffusionAttentionFunction.get_backend_impl(
            backend, strict=(backend != "ref"))()
        y, pull = jax.vjp(
            lambda q, k, v: fn(q, k, v, mask, scale, Hq != Hkv), q, k, v)
        return y, pull(do.astype(y.dtype))

    y_p, g_p = run("pallas")
    y_r, g_r = run("ref")
    # on real hardware the MXU's f32 dots round through bf16 passes;
    # interpret mode is bit-exact f32
    f32_tol = 2e-5 if INTERPRET else 5e-4
    tol = (dict(atol=3e-2, rtol=3e-2) if dtype != jnp.float32
           else dict(atol=f32_tol, rtol=f32_tol))
    # Fully-masked rows: the golden inherits torch-SDPA semantics (softmax
    # over -inf -> NaN, NaN grads); the flash tier defines them as o = 0
    # with zero grads — the useful semantic for block-diffusion training.
    # Compare only rows with at least one kept key; assert the tier is
    # finite and zero on the empty rows.
    nonempty = np.asarray(mask.sum(-1) > 0)  # (S,)
    rows = np.where(nonempty)[0]
    empty = np.where(~nonempty)[0]
    yp, yr = np.asarray(y_p, np.float32), np.asarray(y_r, np.float32)
    np.testing.assert_allclose(yp[:, :, rows], yr[:, :, rows], **tol)
    assert np.all(yp[:, :, empty] == 0)
    for name, gp, gr in zip("dq dk dv".split(), g_p, g_r):
        gp, gr = np.asarray(gp, np.float32), np.asarray(gr, np.float32)
        if name == "dq":
            np.testing.assert_allclose(gp[:, :, rows], gr[:, :, rows],
                                       err_msg=name, **tol)
            assert np.all(gp[:, :, empty] == 0)
        elif empty.size == 0:
            np.testing.assert_allclose(gp, gr, err_msg=name, **tol)


def test_diffusion_additive_mask_falls_back():
    # additive float masks must silently use the golden path
    fn = MojoDiffusionAttentionFunction.get_backend_impl("pallas", strict=True)()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 2, 32, 128)), jnp.float32)
    add = jnp.where(jnp.asarray(rng.random((32, 32)) < 0.5), 0.0, -1e9)
    ref = MojoDiffusionAttentionFunction.get_backend_impl("ref")()
    np.testing.assert_allclose(
        np.asarray(fn(q, q, q, add)), np.asarray(ref(q, q, q, add)),
        atol=1e-5, rtol=1e-5)
