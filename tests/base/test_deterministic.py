"""Deterministic-mode config (reference backends/__init__.py:8-17 and the
MOJO_DETERMINISTIC=1 rerun of the normalization suite, SURVEY §4)."""

import subprocess
import sys

import numpy as np

import jax

from mojo_opset_tpu.backends import enable_deterministic
from mojo_opset_tpu.utils.platform import is_deterministic


def test_is_deterministic_env(monkeypatch):
    monkeypatch.delenv("MOJO_DETERMINISTIC", raising=False)
    assert not is_deterministic()
    monkeypatch.setenv("MOJO_DETERMINISTIC", "1")
    assert is_deterministic()


def test_enable_deterministic_sets_jax_config():
    prev_prec = jax.config.jax_default_matmul_precision
    prev_threefry = jax.config.jax_threefry_partitionable
    try:
        enable_deterministic()
        assert str(jax.config.jax_default_matmul_precision) == "highest"
        assert jax.config.jax_threefry_partitionable
    finally:
        jax.config.update("jax_default_matmul_precision", prev_prec)
        jax.config.update("jax_threefry_partitionable", prev_threefry)


def test_env_var_applies_on_import():
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import mojo_opset_tpu.backends;"
        "print(str(jax.config.jax_default_matmul_precision),"
        "      bool(jax.config.jax_threefry_partitionable))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True,
        env={"MOJO_DETERMINISTIC": "1", "PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0, out.stderr
    assert "highest True" in out.stdout


def test_deterministic_sampling_repeatable(monkeypatch):
    """Ops that draw randomness use explicit keys -> identical reruns."""
    monkeypatch.setenv("MOJO_DETERMINISTIC", "1")
    from mojo_opset_tpu.core.operators.sampling import MojoTopKSampling

    op = MojoTopKSampling(top_k=4)
    logits = jax.random.normal(jax.random.PRNGKey(3), (2, 64))
    _, a = op(logits, key=jax.random.PRNGKey(11))
    _, b = op(logits, key=jax.random.PRNGKey(11))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
