"""Multi-device benchmark launcher.

Parity: reference mojo_opset/benchmark/launch.py:43 (+ runner_common.py) —
orchestrates per-device perf sweeps and merges results.  TPU-native
design: two sweep modes instead of one-process-per-NPU —

* **per-device fan-out**: one subprocess per visible device, each running
  the single-process ``run_perf`` CLI pinned to its device
  (``MOJO_LAUNCH_DEVICE``); results are merged with a ``device`` column.
* **mesh sweep**: the ComputeComm ops (GemmAllReduce / AllGatherGemm /
  GemmReduceScatter / GemmAll2All) are *distributed* ops — their perf is
  only meaningful under a Mesh.  This mode times them inside shard_map
  over an N-device mesh (virtual CPU devices when no multi-chip TPU is
  attached), reporting per-call latency including the collective.

Usage::

    python -m mojo_opset_tpu.benchmark.launch --preset smoke --json out.json
    python -m mojo_opset_tpu.benchmark.launch --mode mesh --num-devices 8
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from typing import List


def _per_device_sweep(args) -> List[dict]:
    """One run_perf subprocess per device; merge JSONs (reference
    launch.py:43 per-rank orchestration)."""
    if args.num_devices:
        # do NOT initialize jax here just to count devices: on a real TPU
        # host libtpu is single-process — a parent holding the devices
        # would starve every child run_perf subprocess
        n = args.num_devices
    else:
        import jax

        n = len(jax.devices())
    results: List[dict] = []
    procs = []
    outs = []
    for dev in range(n):
        out = tempfile.NamedTemporaryFile(suffix=f".dev{dev}.json", delete=False)
        out.close()
        outs.append(out.name)
        cmd = [
            sys.executable, "-m", "mojo_opset_tpu.benchmark.run_perf",
            "--preset", args.preset, "--providers", args.providers,
            "--iters", str(args.iters), "--json", out.name,
        ]
        if args.ops:
            cmd += ["--ops", args.ops]
        env = dict(os.environ, MOJO_LAUNCH_DEVICE=str(dev))
        procs.append(subprocess.Popen(cmd, env=env))
        if args.serial:
            procs[-1].wait()
    for dev, (p, path) in enumerate(zip(procs, outs)):
        rc = p.wait()
        if rc != 0:
            print(f"[launch] device {dev} sweep exited rc={rc}", file=sys.stderr)
            continue
        try:
            with open(path) as f:
                for rec in json.load(f):
                    rec["device"] = dev
                    results.append(rec)
        finally:
            os.unlink(path)
    return results


# -- mesh sweep -----------------------------------------------------------

def _mesh_cases():
    """(op name, M per-shard rows, K, N) — full sizes on accelerators,
    small shapes on a virtual CPU mesh (wiring validation, not perf)."""
    import jax

    big = jax.default_backend() not in ("cpu",)
    m_, k = (4096, 4096) if big else (256, 512)
    return [
        ("GemmAllReduce", m_, k, k),
        ("AllGatherGemm", m_ // 4, k, k),
        ("GemmReduceScatter", m_, k, k),
        ("GemmAll2All", m_ // 4, k, k),
    ]


def _mesh_sweep(args) -> List[dict]:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    import mojo_opset_tpu as m
    from mojo_opset_tpu.benchmark.timing import device_time_us

    n = args.num_devices or len(jax.devices())
    if len(jax.devices()) < n:
        raise SystemExit(
            f"mesh sweep needs {n} devices, have {len(jax.devices())} "
            "(hint: XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu)"
        )
    import numpy as np

    mesh = Mesh(np.asarray(jax.devices()[:n]), axis_names=("tp",))
    dtype = jnp.bfloat16
    results = []
    ops_filter = set(args.ops.split(",")) if args.ops else None
    for name, Mrows, K, N in _mesh_cases():
        if ops_filter and name not in ops_filter:
            continue
        key = jax.random.PRNGKey(0)
        if name == "GemmAllReduce":
            # row-parallel: K sharded; every rank holds (M, K/n) x (K/n, N)
            x = jax.random.normal(key, (Mrows, K), dtype)
            w = jax.random.normal(key, (N, K), dtype)
            op = m.MojoGemmAllReduce(jnp.zeros((N, K // n), dtype), axis_name="tp")

            def run(x, w):
                def inner(xs, ws):
                    return op.replace(weight=ws)(xs)

                return shard_map(
                    inner, mesh=mesh, check_vma=False,
                    in_specs=(P(None, "tp"), P(None, "tp")),
                    out_specs=P(None, None),
                )(x, w)
            flops = 2 * Mrows * K * N
        elif name == "AllGatherGemm":
            # seq-parallel input (M/n per rank), full weight
            x = jax.random.normal(key, (Mrows * n, K), dtype)
            w = jax.random.normal(key, (N, K), dtype)
            op = m.MojoAllGatherGemm(jnp.zeros((N, K), dtype), axis_name="tp")

            def run(x, w):
                def inner(xs, ws):
                    return op.replace(weight=ws)(xs)

                return shard_map(
                    inner, mesh=mesh, check_vma=False,
                    in_specs=(P("tp", None), P(None, None)),
                    out_specs=P(None, None),
                )(x, w)
            flops = 2 * Mrows * n * K * N
        elif name == "GemmReduceScatter":
            x = jax.random.normal(key, (Mrows, K), dtype)
            w = jax.random.normal(key, (N, K), dtype)
            op = m.MojoGemmReduceScatter(jnp.zeros((N, K // n), dtype), axis_name="tp")

            def run(x, w):
                def inner(xs, ws):
                    return op.replace(weight=ws)(xs)

                return shard_map(
                    inner, mesh=mesh, check_vma=False,
                    in_specs=(P(None, "tp"), P(None, "tp")),
                    out_specs=P("tp", None),
                )(x, w)
            flops = 2 * Mrows * K * N
        else:  # GemmAll2All — Ulysses seq<->head switch
            H = n * 4
            x = jax.random.normal(key, (Mrows * n, K), dtype)
            w = jax.random.normal(key, (H * 128, K), dtype)
            op = m.MojoGemmAll2All(
                jnp.zeros((H * 128, K), dtype), axis_name="tp",
                scatter_dim=1, gather_dim=0,
            )

            def run(x, w):
                def inner(xs, ws):
                    # op's all_to_all switches the shard axis: seq-sharded
                    # (M/n, H*128) -> head-sharded (M, H*128/n)
                    return op.replace(weight=ws)(xs)

                return shard_map(
                    inner, mesh=mesh, check_vma=False,
                    in_specs=(P("tp", None), P(None, None)),
                    out_specs=P(None, "tp"),
                )(x, w)
            flops = 2 * Mrows * n * K * H * 128

        us = device_time_us(run, x, w, iters=args.iters)
        rec = {
            "op": name, "case": f"mesh{n}_m{Mrows}_k{K}_n{N}",
            "provider": "shard_map", "devices": n, "us": round(us, 2),
            "tflops": round(flops / (us * 1e-6) / 1e12, 3),
        }
        results.append(rec)
        print(rec)
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="mesh", choices=["device", "mesh", "both"])
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument("--ops", default=None)
    parser.add_argument("--providers", default="ref,xla,pallas")
    parser.add_argument("--preset", default="smoke", choices=["smoke", "full"])
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--serial", action="store_true",
                        help="run per-device sweeps one at a time (single-host CPU)")
    parser.add_argument("--json", default=None)
    args = parser.parse_args(argv)

    results: List[dict] = []
    if args.mode in ("device", "both"):
        results += _per_device_sweep(args)
    if args.mode in ("mesh", "both"):
        results += _mesh_sweep(args)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
