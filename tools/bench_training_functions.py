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


def bench_swa():
    from mojo_opset_tpu.core.functions.attention import MojoSWAFunction as F

    Hq, Hk, S, D = 16, 4, 8192, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, Hq, D)) * 0.2, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((S, Hk, D)) * 0.2, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((S, Hk, D)) * 0.2, jnp.bfloat16)
    cu = jnp.asarray([0, S], jnp.int32)

    rows = []
    for tier in ("ref", "pallas"):
        fn = F.get_backend_impl(tier, strict=True)(
            is_causal=True, local_window_size=4096)

        def loss_grad(q, k, v):
            def scalar(q, k, v):
                return fn(q, k, v, cu, cu).astype(jnp.float32).sum()

            return jax.value_and_grad(scalar, argnums=(0, 1, 2))(q, k, v)

        us = device_time_us(loss_grad, q, k, v, iters=4)
        flops = 4 * Hq * S * S * D // 2 * 3  # causal fwd + ~2x bwd
        rows.append((tier, us, flops / (us * 1e-6) / 1e12))
    return ("SWA flash fwd+bwd", f"varlen S={S} Hq={Hq} Hk={Hk} D={D} "
            f"causal lws=4096 bf16", rows)


def bench_conv1d():
    from mojo_opset_tpu.core.functions.convolution import (
        MojoCausalConv1dFunction as F,
    )

    B, T, D, W = 8, 8192, 2048, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D, W)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((D,)) * 0.1, jnp.float32)

    rows = []
    for tier in ("ref", "pallas"):
        fn = F.get_backend_impl(tier, strict=True)()

        def loss_grad(x, w, b):
            def scalar(x, w, b):
                out, _ = fn(x, w, b, None, None, False, "silu", None)
                return out.astype(jnp.float32).sum()

            return jax.value_and_grad(scalar, argnums=(0, 1, 2))(x, w, b)

        us = device_time_us(loss_grad, x, w, b)
        gb = 5 * B * T * D * 2 / 1e9  # fwd r+w, bwd reads x,g writes dx
        rows.append((tier, us, gb / (us * 1e-6)))
    return ("CausalConv1d fwd+bwd", f"B={B} T={T} D={D} W={W} silu bf16", rows)


def bench_silu():
    from mojo_opset_tpu.core.functions.activation import MojoSiluFunction as F

    T, D = 32768, 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)

    rows = []
    for tier in ("ref", "pallas"):
        fn = F.get_backend_impl(tier, strict=True)()

        def loss_grad(x):
            def scalar(x):
                return fn(x).astype(jnp.float32).sum()

            return jax.value_and_grad(scalar)(x)

        us = device_time_us(loss_grad, x)
        gb = 4 * T * D * 2 / 1e9
        rows.append((tier, us, gb / (us * 1e-6)))
    return ("SiLU fwd+bwd", f"T={T} D={D} bf16", rows)


def bench_diffusion():
    from mojo_opset_tpu.experimental.functions.diffusion_attention import (
        MojoDiffusionAttentionFunction as F,
        block_diffusion_mask,
    )

    B, H, S, D = 2, 16, 4096, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.2, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.2, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.2, jnp.bfloat16)
    mask = block_diffusion_mask(S, 64)
    scale = 1.0 / np.sqrt(D)

    rows = []
    for tier in ("ref", "pallas"):
        fn = F.get_backend_impl(tier, strict=True)()

        def loss_grad(q, k, v):
            def scalar(q, k, v):
                return fn(q, k, v, mask, scale).astype(jnp.float32).sum()

            return jax.value_and_grad(scalar, argnums=(0, 1, 2))(q, k, v)

        us = device_time_us(loss_grad, q, k, v, iters=4)
        flops = 4 * B * H * S * S * D // 2 * 3  # ~block-causal fwd + 2x bwd
        rows.append((tier, us, flops / (us * 1e-6) / 1e12))
    return ("DiffusionAttention fwd+bwd",
            f"B={B} H={H} S={S} D={D} block=64 bf16", rows)


ALL = ("flce", "rmsnorm", "rope", "swa", "conv1d", "silu", "diffusion")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help=f"comma-separated families from {ALL}")
    sel = ap.parse_args().only
    fams = sel.split(",") if sel else list(ALL)
    print(f"platform={jax.devices()[0].platform}")
    for fam in fams:
        name, geo, rows = globals()[f"bench_{fam}"]()
        (t0, us0, m0), (t1, us1, m1) = rows
        unit = ("TFLOP/s" if any(s in name for s in ("CE", "SWA", "Diffusion"))
                else "GB/s")
        print(f"\n{name} @ {geo}")
        print(f"  autodiff-of-golden ({t0}): {us0:9.1f} us  ({m0:7.1f} {unit})")
        print(f"  pallas custom_vjp ({t1}):  {us1:9.1f} us  ({m1:7.1f} {unit})")
        print(f"  speedup: {us0 / us1:.2f}x")


if __name__ == "__main__":
    main()
