"""Measure the accelerated training-function tier vs autodiff-of-golden.

VERDICT r2 item #7: the hand-written Pallas fwd+bwd pairs (flce.py,
rmsnorm_vjp.py) must show a measured speedup over autodiff of the golden
forward — the reference's analogue is the TTX function tier
(reference backends/ttx/functions/ +
kernels/npu/a2/fused_linear_cross_entropy.py).

Times value_and_grad of each tier at a Qwen3-4B-ish training geometry
with the elision-proof chained timer.  Writes a markdown snippet to
stdout for docs/kernels.md.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.benchmark.timing import device_time_us


def bench_flce():
    from mojo_opset_tpu.core.functions.loss import (
        MojoFusedLinearCrossEntropyFunction as F,
    )

    N, H, V = 4096, 2560, 151936  # one Qwen3-4B micro-batch row block
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H)) * 0.05, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((V, H)) * 0.02, jnp.bfloat16)
    t = jnp.asarray(rng.integers(0, V, (N,)), jnp.int32)

    rows = []
    for tier in ("ref", "pallas"):
        fn = F.get_backend_impl(tier, strict=True)(reduction="mean")

        def loss_grad(x, w):
            def scalar(x, w):
                return fn(x, w, t).astype(jnp.float32)

            return jax.value_and_grad(scalar, argnums=(0, 1))(x, w)

        us = device_time_us(loss_grad, x, w)
        flops = 2 * 3 * N * H * V  # fwd + dx + dw matmuls
        rows.append((tier, us, flops / (us * 1e-6) / 1e12))
    return ("FusedLinearCE fwd+bwd", f"N={N} H={H} V={V} bf16", rows)


def bench_rmsnorm():
    from mojo_opset_tpu.core.functions.normalization import MojoRMSNormFunction as F

    T, D = 16384, 2560
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    w = jnp.asarray(rng.uniform(0.5, 1.5, (D,)), jnp.bfloat16)

    rows = []
    for tier in ("ref", "pallas"):
        fn = F.get_backend_impl(tier, strict=True)(eps=1e-6)

        def loss_grad(x, w):
            def scalar(x, w):
                return fn(x, w).astype(jnp.float32).sum()

            return jax.value_and_grad(scalar, argnums=(0, 1))(x, w)

        us = device_time_us(loss_grad, x, w)
        gb = 5 * T * D * 2 / 1e9  # fwd r+w, bwd reads x,dy writes dx
        rows.append((tier, us, gb / (us * 1e-6)))
    return ("RMSNorm fwd+bwd", f"T={T} D={D} bf16", rows)


def bench_rope():
    from mojo_opset_tpu.core.functions.position_embedding import (
        MojoApplyRoPEFunction as F,
    )

    B, Hq, Hk, S, D = 4, 32, 8, 4096, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Hk, S, D)), jnp.bfloat16)
    cos = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)

    rows = []
    for tier in ("ref", "pallas"):
        fn = F.get_backend_impl(tier, strict=True)()

        def loss_grad(q, k):
            def scalar(q, k):
                qr, kr = fn(q, k, cos, sin)
                return (qr.astype(jnp.float32).sum()
                        + kr.astype(jnp.float32).sum())

            return jax.value_and_grad(scalar, argnums=(0, 1))(q, k)

        us = device_time_us(loss_grad, q, k)
        # fwd reads+writes q,k; bwd reads gq,gk writes dq,dk (IO dtype)
        gb = 4 * (q.size + k.size) * 2 / 1e9
        rows.append((tier, us, gb / (us * 1e-6)))
    return ("ApplyRoPE fwd+bwd", f"B={B} Hq={Hq} Hk={Hk} S={S} D={D} bf16", rows)


def main():
    print(f"platform={jax.devices()[0].platform}")
    for name, geo, rows in (bench_flce(), bench_rmsnorm(), bench_rope()):
        (t0, us0, m0), (t1, us1, m1) = rows
        unit = "TFLOP/s" if "CE" in name else "GB/s"
        print(f"\n{name} @ {geo}")
        print(f"  autodiff-of-golden ({t0}): {us0:9.1f} us  ({m0:7.1f} {unit})")
        print(f"  pallas custom_vjp ({t1}):  {us1:9.1f} us  ({m1:7.1f} {unit})")
        print(f"  speedup: {us0 / us1:.2f}x")


if __name__ == "__main__":
    main()
