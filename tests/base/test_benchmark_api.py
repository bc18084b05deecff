"""Benchmark harness unit tests.

Reference analogue: tests/test_benchmark_api.py (405 LoC) — spec
registration, workload validation, provider gating, end-to-end run_case,
and the timing chain's state-threading semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mojo_opset_tpu as m
from mojo_opset_tpu.benchmark.api import (
    PERF_REGISTRY,
    PerfWorkload,
    mojo_perf,
    perf_case,
    perf_provider,
    tensor,
)
from mojo_opset_tpu.benchmark.run_perf import run_case
from mojo_opset_tpu.benchmark.timing import device_time_us


@pytest.fixture(autouse=True)
def _registry_snapshot():
    before = dict(PERF_REGISTRY)
    yield
    PERF_REGISTRY.clear()
    PERF_REGISTRY.update(before)


def _register_rmsnorm_spec(**workload_extra):
    cases = [perf_case("tiny", tags=("smoke",), T=8, D=64),
             perf_case("big", tags=("full",), T=64, D=64)]

    @mojo_perf("UnitTestRMSNorm", m.MojoRMSNorm, cases)
    def wl(case):
        T, D = case.params["T"], case.params["D"]
        return PerfWorkload(
            inputs={"hidden": tensor((T, D), jnp.float32),
                    "weight": tensor((D,), jnp.float32)},
            op_kwargs={"norm_size": D},
            state={"weight": "weight"},
            args=("hidden",),
            read_bytes=T * D * 4, write_bytes=T * D * 4,
            **workload_extra,
        )

    return PERF_REGISTRY["UnitTestRMSNorm"]


def test_mojo_perf_registers_spec_with_cases_and_tags():
    spec = _register_rmsnorm_spec()
    assert spec.name == "UnitTestRMSNorm"
    assert [c.id for c in spec.cases] == ["tiny", "big"]
    assert "smoke" in spec.cases[0].tags
    assert spec.target is m.MojoRMSNorm


def test_workload_validates_unknown_tensor_refs():
    with pytest.raises(Exception):
        PerfWorkload(
            inputs={"x": tensor((4,), jnp.float32)},
            args=("x", "nonexistent"),
        )


def test_workload_default_args_omit_state_and_kwarg_refs():
    wl = PerfWorkload(
        inputs={"x": tensor((4,), jnp.float32),
                "w": tensor((4,), jnp.float32),
                "m_": tensor((4,), jnp.float32)},
        state={"weight": "w"},
        kwargs={"mask": "m_"},
    )
    assert wl.args == ("x",)


def test_tensor_spec_rejects_negative_shape():
    with pytest.raises(ValueError):
        tensor((-1, 4), jnp.float32)


def test_provider_supports_predicate_gates_cases():
    cases = [perf_case("a", tags=("smoke",), big=False),
             perf_case("b", tags=("smoke",), big=True)]

    @mojo_perf("UnitTestGated", m.MojoRMSNorm, cases,
               providers=[perf_provider("ref", supports=lambda c: not c.params["big"])])
    def wl(case):
        return PerfWorkload(
            inputs={"hidden": tensor((4, 8), jnp.float32)},
            op_kwargs={"norm_size": 8}, args=("hidden",),
        )

    spec = PERF_REGISTRY["UnitTestGated"]
    prov = spec.providers[0]
    assert prov.supports(spec.cases[0]) and not prov.supports(spec.cases[1])


def test_run_case_end_to_end_on_cpu():
    spec = _register_rmsnorm_spec()
    rec = run_case(spec, "ref", spec.cases[0], iters=2)
    assert rec["op"] == "UnitTestRMSNorm"
    assert rec["us"] > 0
    assert rec["gbps"] > 0


def test_run_case_returns_none_for_missing_provider():
    spec = _register_rmsnorm_spec()
    assert run_case(spec, "nonexistent_tier", spec.cases[0]) is None


def test_device_time_us_monotone_in_work():
    x_small = jnp.ones((64, 64))
    x_big = jnp.ones((512, 512))
    w_small = jnp.ones((64, 64))
    w_big = jnp.ones((512, 512))
    f = lambda a, b: a @ b
    t_small = device_time_us(f, x_small, w_small, iters=4, repeats=2, warmup=1)
    t_big = device_time_us(f, x_big, w_big, iters=4, repeats=2, warmup=1)
    assert t_big > t_small


def test_threaded_timing_chains_state():
    """thread_idx feeds outputs back as inputs — the chain must actually
    iterate the state op (verified by timing scaling with work), and a
    plain chain must not be used for state-mutating ops."""
    cache = jnp.zeros((256, 256))

    def store(tok, cache):
        return (cache.at[0].add(tok.sum()),)

    tok = jnp.ones((256,))
    us = device_time_us(store, tok, cache, iters=4, repeats=2, warmup=1,
                        thread_idx=((1, 0),))
    assert us > 0


def test_store_kv_descriptor_threads_caches():
    from mojo_opset_tpu.benchmark.api import discover_perf_specs

    discover_perf_specs("tests.perf_new")
    spec = PERF_REGISTRY["StorePagedKVCache"]
    wl = spec.workload_fn(spec.cases[0])
    assert wl.thread == {"key_cache": 0, "value_cache": 1}
    # positions resolve inside args
    for name in wl.thread:
        assert name in wl.args


def test_profile_spec_drives_profiler_span_timing():
    # profile(kernels=...) must switch run_case to profiler-span timing
    # (reference benchmark/xpu_adapter.py:339-373 span-of-spans semantics);
    # platforms that export no matching trace events fall back to the chain
    # timer, recorded in rec["timing"].
    cases = [perf_case("tiny", tags=("smoke",), T=8, D=64)]
    from mojo_opset_tpu.benchmark.api import profile

    @mojo_perf("UnitTestProfiled", m.MojoRMSNorm, cases,
               profiling=profile(kernels=("*",), reduction="sum"))
    def wl(case):
        T, D = case.params["T"], case.params["D"]
        return PerfWorkload(
            inputs={"hidden": tensor((T, D), jnp.float32)},
            op_kwargs={"norm_size": D}, args=("hidden",),
        )

    rec = run_case(PERF_REGISTRY["UnitTestProfiled"], "ref", cases[0], iters=2)
    assert rec["us"] > 0
    assert rec["timing"] in ("profiler", "chain")


def test_profiled_time_us_matches_kernels_on_cpu():
    from mojo_opset_tpu.benchmark.timing import profiled_time_us

    x = jnp.ones((256, 256))
    f = jax.jit(lambda a: a @ a)
    f(x).block_until_ready()
    us = profiled_time_us(f, x, iters=4, kernels=("dot*",), reduction="sum")
    # CPU exports dot_general events; a matmul this size costs real time
    assert us > 0
    none = profiled_time_us(f, x, iters=2, kernels=("no_such_kernel_*",))
    assert none == -1.0
