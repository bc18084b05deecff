"""End-to-end training-path test: model grads + fused linear CE + optax.

The reference exposes training via MojoFunction fwd/bwd pairs
(core/functions/); here the whole stack is differentiable, so a jitted
train step over the Qwen3 model with the fused-linear-CE loss must
reduce loss on a memorization task.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

optax = pytest.importorskip("optax")

import mojo_opset_tpu as m
from mojo_opset_tpu.modeling.qwen3 import Qwen3Config, Qwen3ForCausalLM
# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


def test_train_step_reduces_loss():
    cfg = Qwen3Config(
        hidden_size=32, intermediate_size=64, num_attention_heads=2,
        num_key_value_heads=2, num_hidden_layers=2, head_dim=16,
        vocab_size=64, max_position_embeddings=32, dtype=jnp.float32,
        tie_word_embeddings=False,
    )
    model = Qwen3ForCausalLM(cfg, key=jax.random.PRNGKey(0))
    loss_fn_mod = m.MojoFusedLinearCrossEntropyFunction.get_backend_impl("ref")()

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 1, 64)
    inputs, targets = ids[:, :-1], ids[:, 1:]
    B, S = inputs.shape

    from mojo_opset_tpu.runtime import PagedAttentionRuntimeState

    state = PagedAttentionRuntimeState(model.config, batch_size=B, block_size=16)
    flat = np.asarray(inputs).reshape(-1)
    ids_flat, positions, meta = state.prepare_prefill_inputs(
        flat, np.full((B,), S, np.int32)
    )
    caches0 = state.caches

    def forward_loss(model):
        hidden, _ = model.model(ids_flat, positions, meta, caches0)
        w = model.lm_head.weight
        return loss_fn_mod(hidden, w, targets.reshape(-1))

    tx = optax.adamw(3e-3)
    opt_state = tx.init(model)

    @jax.jit
    def train_step(model, opt_state):
        loss, grads = jax.value_and_grad(forward_loss)(model)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = jax.tree_util.tree_map(
            lambda p, u: p + u if u is not None else p, model, updates
        )
        return model, opt_state, loss

    losses = []
    for _ in range(30):
        model, opt_state, loss = train_step(model, opt_state)
        losses.append(float(loss))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, f"loss did not halve: {losses[0]:.3f} -> {losses[-1]:.3f}"
