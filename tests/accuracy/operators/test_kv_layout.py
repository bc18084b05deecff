"""NHD cache-layout parity: every tier must match the HND reference.

The TPU-native runtime keeps paged caches in ``NHD`` layout
``(N_blocks, block_size, Hkv, D)`` so decode stores scatter only leading
dims and stay in place under jit (core/operators/attention.py
paged_cache_dims). These tests transpose one fixture between layouts and
require bit-identical math from every (op, tier, layout) combination.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mojo_opset_tpu as m

from ..utils import make_paged_case, randn
# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


@pytest.fixture()
def _force_interpret(monkeypatch):
    import os

    # real Mosaic compile under the on-chip lane (MOJO_TEST_TPU=1)
    if os.environ.get("MOJO_TEST_TPU", "0") != "1":
        monkeypatch.setenv("MOJO_PALLAS_INTERPRET", "1")


def _nhd(cache):
    return jnp.swapaxes(cache, 1, 2)  # (N, Hkv, bs, D) -> (N, bs, Hkv, D)


@pytest.mark.parametrize("tier", ["ref", "xla", "pallas"])
def test_paged_decode_nhd_matches_hnd(tier, _force_interpret):
    case = make_paged_case(seq_lens=(9, 2, 16), head_dim=128)
    q = randn(5, (3, case["hq"], 128))
    want = m.MojoPagedDecodeGQA.get_backend_impl("ref")()(
        q, case["key_cache"], case["value_cache"], case["seq_lens"], case["block_tables"]
    )
    op = m.MojoPagedDecodeGQA.get_backend_impl(tier, strict=True)(kv_layout="NHD")
    got = op(
        q, _nhd(case["key_cache"]), _nhd(case["value_cache"]),
        case["seq_lens"], case["block_tables"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("tier", ["ref", "xla", "pallas"])
def test_paged_prefill_nhd_matches_hnd(tier, _force_interpret):
    case = make_paged_case(seq_lens=(23, 5, 37), q_lens=(23, 5, 20), head_dim=128,
                           block_size=16, max_blocks=4)
    q = randn(7, (case["total_q"], case["hq"], 128))
    want = m.MojoPagedPrefillGQA.get_backend_impl("ref")()(
        q, case["key_cache"], case["value_cache"], case["cu_q_lens"],
        case["block_tables"], None, case["cu_total_seq_lens"],
    )
    op = m.MojoPagedPrefillGQA.get_backend_impl(tier, strict=True)(kv_layout="NHD")
    got = op(
        q, _nhd(case["key_cache"]), _nhd(case["value_cache"]), case["cu_q_lens"],
        case["block_tables"], None, case["cu_total_seq_lens"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("decode", [True, False])
def test_store_paged_kv_nhd_matches_hnd(decode):
    B, Hkv, D, bs, NB = 3, 2, 16, 4, 5
    N = B * NB
    if decode:
        T = B
        ctx = jnp.asarray([5, 1, 9], jnp.int32)
        cu = None
    else:
        T = 10
        ctx = jnp.zeros((B,), jnp.int32)
        cu = jnp.asarray([0, 4, 6, 10], jnp.int32)
    bt = jnp.arange(N, dtype=jnp.int32).reshape(B, NB)
    ks = randn(0, (T, Hkv, D))
    vs = randn(1, (T, Hkv, D))
    kc = randn(2, (N, Hkv, bs, D))
    vc = randn(3, (N, Hkv, bs, D))

    k_h, v_h = m.MojoStorePagedKVCache()(ks, vs, kc, vc, bt, cu, ctx)
    k_n, v_n = m.MojoStorePagedKVCache(kv_layout="NHD")(
        ks, vs, _nhd(kc), _nhd(vc), bt, cu, ctx
    )
    np.testing.assert_array_equal(np.asarray(_nhd(k_n)), np.asarray(k_h))
    np.testing.assert_array_equal(np.asarray(_nhd(v_n)), np.asarray(v_h))


def test_swa_paged_nhd_matches_hnd():
    case = make_paged_case(seq_lens=(9, 2, 16), head_dim=64)
    q = randn(5, (3, case["hq"], 64))
    kw = dict(local_window_size=6, global_window_size=2)
    want = m.MojoPagedDecodeSWA(**kw)(
        q, case["key_cache"], case["value_cache"], case["seq_lens"], case["block_tables"]
    )
    got = m.MojoPagedDecodeSWA(kv_layout="NHD", **kw)(
        q, _nhd(case["key_cache"]), _nhd(case["value_cache"]),
        case["seq_lens"], case["block_tables"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_session_nhd_generation_matches_hnd_session():
    """End-to-end: the same Qwen3 weights must generate identical tokens
    whether the session runs the NHD (TPU-native) or HND (reference)
    cache layout."""
    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
    from mojo_opset_tpu.runtime import PagedAttentionGenerationModel

    outs = {}
    for layout in ("NHD", "HND"):
        cfg = Qwen3Config(
            hidden_size=64, intermediate_size=128, num_attention_heads=4,
            num_key_value_heads=2, num_hidden_layers=2, head_dim=16,
            vocab_size=128, max_position_embeddings=128, dtype=jnp.float32,
            kv_layout=layout,
        )
        model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(7))
        gm = PagedAttentionGenerationModel(model, block_size=16)
        ids = np.arange(10, dtype=np.int32) % cfg.vocab_size
        lens = np.asarray([6, 4], np.int32)
        logits, session = gm(ids, context_input_len=lens)
        toks = [np.asarray(jnp.argmax(logits, -1))]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for _ in range(4):
            logits, session = gm(tok, past_session=session)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            toks.append(np.asarray(tok))
        outs[layout] = np.stack(toks)
    np.testing.assert_array_equal(outs["NHD"], outs["HND"])
