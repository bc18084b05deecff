"""Parallel styles / plan API + distributed checkpoint tests.

Reference analogue: tests/distributed/test_tensor_parallel.py (TP styles,
QKV GQA sharding) and test_paged_gqa_tp.py (sharded save/load).
"""

import numpy as np
import pytest

from .dist_common import run_distributed

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def test_tp_styles_shard_qwen3_and_forward_matches():
    run_distributed("""
    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
    from mojo_opset_tpu.parallel import (
        MojoQKVColwiseParallel, MojoRowwiseParallel, MojoTensorParallel,
        mojo_parallelize_module,
    )
    from mojo_opset_tpu.runtime import PagedAttentionGenerationModel

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("tp",))
    cfg = Qwen3Config(hidden_size=64, intermediate_size=128, num_attention_heads=8,
                      num_key_value_heads=4, num_hidden_layers=2, head_dim=16,
                      vocab_size=128, max_position_embeddings=128, dtype=jnp.float32)
    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(7))
    gm0 = PagedAttentionGenerationModel(model, block_size=16, jit=False)
    ids = np.array([1,2,3,4,5], np.int32)
    lens = np.array([5], np.int32)
    want, _ = gm0(ids, context_input_len=lens)

    plan = {
        "self_attn": MojoQKVColwiseParallel(num_heads=8, num_kv_heads=4),
        "mlp": MojoTensorParallel(),
    }
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        sharded = mojo_parallelize_module(model, mesh, plan)
        # check the q_proj weight actually sharded over tp
        s = sharded.model.layers[0].self_attn.q_proj.weight.sharding
        assert "tp" in str(s.spec) or s.spec == P("tp", None), s
        gm = PagedAttentionGenerationModel(sharded, block_size=16)
        got, _ = gm(ids, context_input_len=lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3)
    print("OK")
    """)


def test_qkv_style_replicates_kv_when_tp_exceeds_kv_heads():
    run_distributed("""
    from mojo_opset_tpu.parallel import MojoQKVColwiseParallel
    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config
    from mojo_opset_tpu.modeling.qwen3.modeling_qwen3 import Qwen3Attention

    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("tp",))
    cfg = Qwen3Config(hidden_size=64, intermediate_size=128, num_attention_heads=8,
                      num_key_value_heads=2, num_hidden_layers=1, head_dim=16,
                      vocab_size=64, dtype=jnp.float32)
    attn = Qwen3Attention(cfg, jax.random.PRNGKey(0))
    style = MojoQKVColwiseParallel(num_heads=8, num_kv_heads=2)
    sharded = style.apply(attn, mesh)
    # tp=8 > kv_heads=2: q sharded, k/v replicated
    q_spec = sharded.q_proj.weight.sharding.spec
    k_spec = sharded.k_proj.weight.sharding.spec
    assert q_spec == P("tp", None), q_spec
    assert k_spec == P() or all(x is None for x in k_spec), k_spec
    print("OK")
    """)


def test_shard_model_rules_and_checkpoint_roundtrip():
    run_distributed("""
    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
    from mojo_opset_tpu.parallel import (
        qwen3_tp_rules, shard_model,
        mojo_parallel_save_state_dict_naive, mojo_parallel_load_state_dict_naive,
        stat_dict_rename_hook,
    )
    import tempfile, os

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(2, 2), ("dp", "tp"))
    cfg = Qwen3Config(hidden_size=32, intermediate_size=64, num_attention_heads=4,
                      num_key_value_heads=2, num_hidden_layers=1, head_dim=8,
                      vocab_size=64, dtype=jnp.float32)
    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(1))
    sharded = shard_model(model, mesh, qwen3_tp_rules("tp"))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pkl")
        mojo_parallel_save_state_dict_naive(sharded, path)
        # perturb then reload
        zeroed = jax.tree_util.tree_map(lambda x: x * 0, model)
        restored = mojo_parallel_load_state_dict_naive(zeroed, path)
        w0 = np.asarray(model.model.layers[0].self_attn.q_proj.weight)
        w1 = np.asarray(restored.model.layers[0].self_attn.q_proj.weight)
        np.testing.assert_allclose(w0, w1)

        # mesh-coordinate rename hook
        hook = stat_dict_rename_hook({"tp": 1})
        assert hook("a.weight") == "a.weight@tp1"
    print("OK")
    """)


def test_tp_generation_fused_matches_single_device():
    """TP-sharded serving smoke test: prefill + fused multi-step greedy
    decode over a 4-way tensor-parallel mesh must produce the same tokens
    as the unsharded model (reference has no TP-serving test; this guards
    the sharded KV-cache + FusedDecode path)."""
    run_distributed("""
    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
    from mojo_opset_tpu.parallel import (
        MojoQKVColwiseParallel, MojoTensorParallel, mojo_parallelize_module,
    )
    from mojo_opset_tpu.runtime import (
        GreedySampler, MojoGenerator, PagedAttentionGenerationModel,
    )

    class Tok:
        eos_token_id = -1

    cfg = Qwen3Config(hidden_size=64, intermediate_size=128, num_attention_heads=8,
                      num_key_value_heads=4, num_hidden_layers=2, head_dim=16,
                      vocab_size=128, max_position_embeddings=128, dtype=jnp.float32)
    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(7))
    ids = np.array([1, 2, 3, 4, 5, 9, 8], np.int32)
    lens = np.array([5, 2], np.int32)

    gm0 = PagedAttentionGenerationModel(model, block_size=16, jit=False)
    gen0 = MojoGenerator(gm0, Tok(), GreedySampler(), max_new_tokens=6)
    want = gen0.generate_from_ids(ids, lens, ignore_eos=True, silent=True)

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("tp",))
    plan = {
        "self_attn": MojoQKVColwiseParallel(num_heads=8, num_kv_heads=4),
        "mlp": MojoTensorParallel(),
    }
    ctx = jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh
    with ctx:
        sharded = mojo_parallelize_module(model, mesh, plan)
        gm = PagedAttentionGenerationModel(sharded, block_size=16)
        gen = MojoGenerator(gm, Tok(), GreedySampler(), max_new_tokens=6)
        got_fused = gen.generate_from_ids(ids, lens, ignore_eos=True, fused_decode=True)
        gm2 = PagedAttentionGenerationModel(sharded, block_size=16)
        gen2 = MojoGenerator(gm2, Tok(), GreedySampler(), max_new_tokens=6)
        got_step = gen2.generate_from_ids(ids, lens, ignore_eos=True, silent=True)

    np.testing.assert_array_equal(np.asarray(got_step), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_fused), np.asarray(want))
    print("OK")
    """, timeout=1200)


def test_registerable_style_dist_info_registry_and_apply():
    """register_dist_info keyed by module class; apply() partitions via
    the registered partition_fn and wraps forward with prepare fns
    (reference mojo_parallel.py:33-144)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from mojo_opset_tpu.parallel import MojoRegisterableParallelStyle
    from mojo_opset_tpu.core.operators import MojoGemm

    class MyStyle(MojoRegisterableParallelStyle):
        pass

    class OtherStyle(MojoRegisterableParallelStyle):
        pass

    calls = {}

    def partition_fn(module, mesh):
        calls["partition"] = True
        return module

    MyStyle.register_dist_info(
        MojoGemm,
        partition_fn=partition_fn,
        desired_input_layouts=P(),
        desired_output_layouts=P(),
    )
    # per-subclass registry isolation (reference __init_subclass__ reset)
    assert OtherStyle.get_dist_info(MojoGemm) is None
    assert MyStyle.get_dist_info(MojoGemm) is not None

    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    gemm = MojoGemm(8, 8, bias=False, key=jax.random.PRNGKey(0), dtype=jnp.float32)
    x = jnp.ones((4, 8), jnp.float32)
    expected = np.asarray(gemm(x))

    wrapped = MyStyle().apply(gemm, mesh)
    assert calls["partition"]
    out = np.asarray(wrapped(x))
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_dynamic_config_allows_extra_fields():
    """MojoDynamicConfig.from_dict tolerates unknown keys (reference
    runtime/config.py:24-28 pydantic extra='allow')."""
    from mojo_opset_tpu.runtime import MojoModelConfig

    cfg = MojoModelConfig.from_dict(
        {"hidden_size": 64, "num_heads": 4, "custom_vendor_field": "abc"}
    )
    assert cfg.hidden_size == 64
    assert cfg.custom_vendor_field == "abc"
    assert cfg.extra_fields() == {"custom_vendor_field": "abc"}


def test_tp_generation_int8_serving_matches_single_device():
    """w8a8 serving model under a 4-way GSPMD TP plan (shard_model +
    qwen3_tp_rules incl. the QuantGemm weight_scale rules): prefill +
    greedy decode must reproduce the unsharded int8 model's tokens."""
    run_distributed("""
    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM, quantize_qwen3
    from mojo_opset_tpu.parallel.plans import qwen3_tp_rules, shard_model
    from mojo_opset_tpu.runtime import (
        GreedySampler, MojoGenerator, PagedAttentionGenerationModel,
    )

    class Tok:
        eos_token_id = -1

    cfg = Qwen3Config(hidden_size=64, intermediate_size=128, num_attention_heads=8,
                      num_key_value_heads=4, num_hidden_layers=2, head_dim=16,
                      vocab_size=128, max_position_embeddings=128, dtype=jnp.float32)
    qm = quantize_qwen3(Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(7)))
    ids = np.array([1, 2, 3, 4, 5, 9, 8], np.int32)
    lens = np.array([5, 2], np.int32)

    gm0 = PagedAttentionGenerationModel(qm, block_size=16, jit=False)
    gen0 = MojoGenerator(gm0, Tok(), GreedySampler(), max_new_tokens=6)
    want = gen0.generate_from_ids(ids, lens, ignore_eos=True, silent=True)

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("tp",))
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        sharded = shard_model(qm, mesh, qwen3_tp_rules(tp_axis="tp"))
        # the int8 weight AND its per-channel scale must both shard
        sq = sharded.model.layers[0].self_attn.q_proj
        assert "tp" in str(sq.weight.sharding.spec)
        assert "tp" in str(sq.weight_scale.sharding.spec)
        gm = PagedAttentionGenerationModel(sharded, block_size=16)
        gen = MojoGenerator(gm, Tok(), GreedySampler(), max_new_tokens=6)
        got = gen.generate_from_ids(ids, lens, ignore_eos=True, silent=True)

    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    print("OK")
    """)


def test_tp_speculative_decoding_matches_single_device():
    """SpeculativeDecoder with a TP-sharded target (GSPMD plan) must stay
    lossless vs the unsharded model's greedy stream."""
    run_distributed("""
    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM, quantize_qwen3
    from mojo_opset_tpu.parallel.plans import qwen3_tp_rules, shard_model
    from mojo_opset_tpu.runtime import PagedAttentionGenerationModel
    from mojo_opset_tpu.runtime.speculative import SpeculativeDecoder

    cfg = Qwen3Config(hidden_size=64, intermediate_size=128, num_attention_heads=8,
                      num_key_value_heads=4, num_hidden_layers=2, head_dim=16,
                      vocab_size=128, max_position_embeddings=256, dtype=jnp.float32)
    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(7))
    ids = np.array([1, 2, 3, 4, 5], np.int32)
    lens = np.array([5], np.int32)
    steps = 8

    # unsharded greedy oracle
    gm0 = PagedAttentionGenerationModel(model, block_size=16, jit=False)
    logits, session = gm0(ids, context_input_len=lens)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    want = [int(tok[0])]
    for _ in range(steps - 1):
        logits, session = gm0(np.asarray(tok, np.int32), session=session)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        want.append(int(tok[0]))

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("tp",))
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        target = shard_model(model, mesh, qwen3_tp_rules(tp_axis="tp"))
        draft = shard_model(quantize_qwen3(model), mesh, qwen3_tp_rules(tp_axis="tp"))
        spec = SpeculativeDecoder(target, draft, k=3, mode="greedy", block_size=16)
        got = spec.generate(ids, lens, max_new_tokens=steps)

    np.testing.assert_array_equal(got[0], np.asarray(want, np.int32))
    print("OK")
    """)


def test_swiglu_parallel_tp4_matches_unsharded():
    """MojoSwiGLUParallel on a real 4-way mesh must preserve the fused
    fc1 gate/up split (the DTensor-style row interleave would corrupt the
    logical value under GSPMD — this pins the plain-spec behavior)."""
    run_distributed("""
    from mojo_opset_tpu.core.operators.mlp import MojoSwiGLUMLP
    from mojo_opset_tpu.parallel import MojoSwiGLUParallel

    mlp = MojoSwiGLUMLP(input_size=64, output_size=64, hidden_size=128, key=jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 64), jnp.float32)
    want = np.asarray(mlp(x))

    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        sharded = MojoSwiGLUParallel().apply(mlp, mesh)
        got = np.asarray(jax.jit(lambda m, a: m(a))(sharded, x))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    print("OK")
    """)
