"""DiT e2e perf-protocol smoke test (tiny geometry, CPU).

Pins the PerfDiTRunner contract: jitted denoise step runs, records carry
latency + FLOPs fields, and the FLOPs model counts the transformer
matmuls (reference e2e path: examples/dit_inference.py — no built-in
timing there; this protocol is the DiT analogue of PerfMojoGenerator).
"""

import jax
import pytest

from mojo_opset_tpu.benchmark.dit_protocol import PerfDiTRunner, dit_step_flops
from mojo_opset_tpu.modeling.wan2_2 import WanConfig, WanModel

# heavyweight lane (VERDICT r2 #9): run via `pytest -m slow`
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_dit():
    cfg = WanConfig(
        patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=2, num_layers=2,
    )
    return WanModel(cfg, key=jax.random.PRNGKey(0))


def test_protocol_records(tiny_dit):
    runner = PerfDiTRunner(tiny_dit, text_tokens=8)
    records = runner.run(sizes=((1, 8, 8), (2, 8, 8)), steps=2)
    assert len(records) == 2
    for r, size in zip(records, ((1, 8, 8), (2, 8, 8))):
        assert r["latent"] == size
        assert r["denoise_ms"] > 0
        assert r["tflops"] > 0
    # token count follows the patchify grid
    assert records[0]["tokens"] == 1 * 4 * 4
    assert records[1]["tokens"] == 2 * 4 * 4


def test_flops_model_scales(tiny_dit):
    cfg = tiny_dit.cfg
    f1 = dit_step_flops(cfg, seq_len=64, text_len=8)
    f2 = dit_step_flops(cfg, seq_len=128, text_len=8)
    assert f2 > f1 * 2  # quadratic self-attention term dominates growth being > linear
    # hand-check one term: the FFN contribution alone
    ffn_only = 2.0 * cfg.num_layers * 2 * 64 * cfg.dim * cfg.ffn_dim
    assert f1 > ffn_only


def test_denoise_step_moves_latent(tiny_dit):
    """The jitted Euler step changes the latent (model is wired through)."""
    import jax.numpy as jnp

    runner = PerfDiTRunner(tiny_dit, text_tokens=8)
    x, ctx, seq_len = runner._case_inputs((1, 8, 8))
    v = tiny_dit([x], jnp.ones((1,)), [ctx], seq_len=seq_len)[0]
    assert v.shape == (tiny_dit.cfg.out_dim, 1, 8, 8)
    assert float(jnp.abs(v).max()) > 0
