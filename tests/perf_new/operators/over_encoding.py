"""Perf descriptors: over-tokenized encoding (n-gram hash + NF4 embedding).

Reference: tests/perf_new/operators/over_encoding.py.
"""

import numpy as np
import jax.numpy as jnp

from mojo_opset_tpu.benchmark.api import mojo_perf, perf_case, tensor, PerfWorkload
import mojo_opset_tpu as m


NGRAM_CASES = [
    perf_case("b8_t1024_g2", tags=("smoke",), B=8, T=1024),
]


@mojo_perf("OverEncodingNGram", m.MojoOverEncodingNGram, NGRAM_CASES)
def ngram_workload(case):
    p = case.params
    B, T = p["B"], p["T"]
    V = 32000

    def ids(spec):
        return jnp.asarray(np.random.default_rng(0).integers(0, V, spec.shape), jnp.int32)

    return PerfWorkload(
        inputs={
            "input_ids": tensor((B, T), jnp.int32, creator=ids),
            "oe_history_input": tensor((B, 2), jnp.int32, creator=ids),
        },
        op_kwargs={
            "ori_vocab_size": V,
            "oe_vocab_sizes": [100003, 100019],
            "oe_grams": [2, 3],
        },
        args=("input_ids", "oe_history_input"),
        read_bytes=B * T * 4,
        write_bytes=B * T * 2 * 4,
    )


OE_CASES = [
    perf_case("b4_t512", tags=("smoke",), B=4, T=512),
]


@mojo_perf("OverEncoding", m.MojoOverEncoding, OE_CASES)
def over_encoding_workload(case):
    p = case.params
    B, T = p["B"], p["T"]
    V, D, OED = 32000, 1024, 256

    def ids(spec):
        return jnp.asarray(np.random.default_rng(0).integers(0, V, spec.shape), jnp.int32)

    return PerfWorkload(
        inputs={
            "input_tensor": tensor((B, T), jnp.int32, creator=ids),
            "oe_history_input": tensor((B, 2), jnp.int32, creator=ids),
        },
        op_kwargs={
            "ori_vocab_size": V,
            "ori_embed_dim": D,
            "oe_embed_dim": OED,
            "oe_vocab_sizes": [100003, 100019],
            "oe_grams": [2, 3],
        },
        args=("input_tensor", "oe_history_input"),
        read_bytes=B * T * (D + 2 * OED) * 2,
        write_bytes=B * T * D * 2,
    )


NF4_CASES = [
    perf_case("t8192_d1024_g64", tags=("smoke",), T=8192, V=100003, D=1024, G=64),
]


@mojo_perf("NF4DequantEmbedding", m.MojoNF4DequantEmbedding, NF4_CASES)
def nf4_embedding_workload(case):
    p = case.params
    T, V, D, G = p["T"], p["V"], p["D"], p["G"]

    def ids(spec):
        return jnp.asarray(np.random.default_rng(0).integers(0, V, spec.shape), jnp.int32)

    def qw(spec):
        return jnp.asarray(
            np.random.default_rng(1).integers(-128, 128, spec.shape), jnp.int8
        )

    return PerfWorkload(
        inputs={
            "input": tensor((T,), jnp.int32, creator=ids),
            "qweight": tensor((V, D // 2), jnp.int8, creator=qw),
            "scale": tensor((V, D // G), jnp.float32),
            "mean": tensor((V, D // G), jnp.float32),
        },
        op_kwargs={
            "qweight": jnp.zeros((V, D // 2), jnp.int8),
            "scale": jnp.ones((V, D // G), jnp.float32),
            "mean": jnp.zeros((V, D // G), jnp.float32),
            "group_size": G,
        },
        state={"weight": "qweight", "scale": "scale", "mean": "mean"},
        args=("input",),
        read_bytes=T * D // 2,
        write_bytes=T * D * 2,
    )
