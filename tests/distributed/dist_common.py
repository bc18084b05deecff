"""Subprocess harness for multi-device tests.

The reference fakes multi-node with gloo-on-CPU subprocesses
(tests/dist_common.py:19-81); here we fake a TPU pod with 8 virtual CPU
devices — but the flag must be set before backends initialize, so each
scenario runs in a fresh subprocess.
"""

import os
import subprocess
import sys
import textwrap

PREAMBLE = """
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
import mojo_opset_tpu as m
"""


def run_distributed(code: str, timeout: int = 1200) -> str:
    """Run a code snippet in a subprocess with 8 virtual CPU devices.

    Generous timeout: under pytest-xdist on a small host the subprocess
    competes with every other worker for cores while compiling several
    8-device XLA programs — 300 s flaked on a 1-CPU box."""
    script = PREAMBLE + textwrap.dedent(code)
    env = dict(os.environ)
    env.pop("MOJO_BACKEND", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"distributed subprocess failed (rc={proc.returncode}):\n"
            f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr[-4000:]}"
        )
    return proc.stdout
