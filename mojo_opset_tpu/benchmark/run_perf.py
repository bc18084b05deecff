"""Per-op benchmark runner CLI.

Parity: reference mojo_opset/benchmark/run_perf.py:38- and
xpu_adapter.py:135-432 (build tensors, bind state onto the op instance,
time, emit a summary table).

Usage::

    python -m mojo_opset_tpu.benchmark.run_perf --ops PagedDecodeGQA \
        --providers ref,xla,pallas --preset smoke [--json out.json]
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

import jax

from mojo_opset_tpu.benchmark.api import (
    PERF_REGISTRY,
    LiteralArg,
    PerfSpec,
    discover_perf_specs,
)
from mojo_opset_tpu.benchmark.timing import (
    device_sync,
    device_time_us,
    profiled_time_us,
)
from mojo_opset_tpu.core.registry import BackendNotAvailable
from mojo_opset_tpu.utils.logging import get_logger, log_table

logger = get_logger(__name__)


def _build_op(spec: PerfSpec, provider: str, workload):
    impl = spec.target.get_backend_impl(provider, strict=True)
    op = impl(**dict(workload.op_kwargs))
    return op


def run_case(spec: PerfSpec, provider: str, case, iters: int = 16,
             validate_only: bool = False) -> Optional[dict]:
    workload = spec.workload_fn(case)
    try:
        op = _build_op(spec, provider, workload)
    except BackendNotAvailable:
        return None

    tensors = {
        name: ts.build(None, idx) for idx, (name, ts) in enumerate(workload.inputs.items())
    }
    # bind state (weights) onto op attributes (reference xpu_adapter.py:301)
    for attr, tensor_name in workload.state.items():
        op = op.replace(**{attr: tensors[tensor_name]})

    def resolve(v):
        if isinstance(v, LiteralArg):
            return v.value
        if isinstance(v, str) and v in tensors:
            return tensors[v]
        return v

    args = tuple(resolve(a) for a in workload.args)
    kwargs = {k: resolve(v) for k, v in workload.kwargs.items()}

    # The op (with its weights) and every array kwarg must enter the timed
    # jit as REAL arguments — closed-over arrays become inline constants,
    # which blow up the remote-compile payload for large weights (HTTP 413)
    # and invite constant folding of the op under test.
    kw_arr = {k: v for k, v in kwargs.items() if isinstance(v, jax.Array)}
    kw_static = {k: v for k, v in kwargs.items() if k not in kw_arr}
    kw_keys = tuple(kw_arr)
    run_fn = workload.run or (lambda op_, *a, **kw: op_(*a, **kw))
    n_pos = len(args)

    def fn(*flat):
        op_ = flat[n_pos]
        kwv = dict(zip(kw_keys, flat[n_pos + 1 :]))
        return run_fn(op_, *flat[:n_pos], **kw_static, **kwv)

    flat_args = (*args, op, *kw_arr.values())

    # correctness guard: one eager call
    out = fn(*flat_args)
    device_sync(out)
    if validate_only:
        return {"op": spec.name, "case": case.id, "provider": provider, "us": -1.0}

    thread_idx = tuple(
        (workload.args.index(name), out_pos) for name, out_pos in workload.thread.items()
    )
    prof = spec.profiling
    us = -1.0
    timing_src = "chain"
    if prof.kernels is not None:
        # profile(kernels=...) selects profiler kernel spans, like the
        # reference's span timing (reference benchmark/xpu_adapter.py:339-373)
        us = profiled_time_us(
            fn, *flat_args, iters=iters,
            kernels=prof.kernels, match=prof.match, reduction=prof.reduction,
        )
        timing_src = "profiler"
    if us < 0:
        us = device_time_us(fn, *flat_args, iters=iters, thread_idx=thread_idx)
        timing_src = "chain"
    rec = {
        "op": spec.name,
        "case": case.id,
        "provider": provider,
        # 3 decimals: device_time_us floors noise-dominated marginals at
        # 1e-3 us, which 2-decimal rounding would collapse to 0
        "us": round(us, 3),
        "timing": timing_src,
    }
    if workload.flops:
        rec["tflops"] = round(workload.flops / (us * 1e-6) / 1e12, 6)
    if workload.read_bytes or workload.write_bytes:
        total = (workload.read_bytes or 0) + (workload.write_bytes or 0)
        # 6 decimals: a tiny op measured under heavy host contention can
        # land far below 0.1 GB/s — coarse rounding collapsed it to 0
        rec["gbps"] = round(total / (us * 1e-6) / 1e9, 6)
    return rec


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ops", default=None, help="comma-separated op names (default all)")
    parser.add_argument("--providers", default="ref,xla,pallas")
    parser.add_argument("--preset", default="smoke", choices=["smoke", "full"])
    parser.add_argument("--iters", type=int, default=16)
    parser.add_argument("--json", default=None)
    parser.add_argument("--package", default="tests.perf_new")
    parser.add_argument("--validate", action="store_true",
                        help="build + run each case once (no timing) — CI workload check")
    args = parser.parse_args(argv)

    # device pinning for the multi-device launcher (benchmark/launch.py):
    # each worker process sweeps on its own device.
    import os

    dev_idx = os.environ.get("MOJO_LAUNCH_DEVICE")
    if dev_idx is not None:
        import contextlib

        ctx = jax.default_device(jax.devices()[int(dev_idx)])
        with contextlib.ExitStack() as stack:
            stack.enter_context(ctx)
            return _run_sweep(args)
    return _run_sweep(args)


def _run_sweep(args):

    discover_perf_specs(args.package)
    ops = args.ops.split(",") if args.ops else list(PERF_REGISTRY)
    providers = args.providers.split(",")

    results = []
    for name in ops:
        spec = PERF_REGISTRY.get(name)
        if spec is None:
            logger.warning("unknown op %s (known: %s)", name, list(PERF_REGISTRY))
            continue
        for case in spec.cases:
            if args.preset == "smoke" and case.tags and "smoke" not in case.tags:
                continue
            for pname in providers:
                provider = next((p for p in spec.providers if p.name == pname), None)
                if provider is None:
                    continue
                if provider.supports is not None and not provider.supports(case):
                    continue
                try:
                    rec = run_case(spec, pname, case, iters=args.iters,
                                   validate_only=args.validate)
                except Exception as exc:
                    logger.warning("%s/%s/%s failed: %r", name, case.id, pname, exc)
                    continue
                if rec is not None:
                    results.append(rec)
                    logger.info("%s", rec)

    log_table(logger, f"{'op':<28} | {'case':<24} | {'provider':<8} | {'us':>10} | {'tflops':>8} | {'GB/s':>8}")
    log_table(logger, "-" * 100)
    for r in results:
        log_table(
            logger,
            f"{r['op']:<28} | {r['case']:<24} | {r['provider']:<8} | "
            f"{r['us']:>10.2f} | {r.get('tflops', ''):>8} | {r.get('gbps', ''):>8}",
        )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
