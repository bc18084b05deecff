"""Mosaic dtype compatibility shims for the Pallas kernel tier.

Mosaic (the TPU Pallas compiler) has no ``float16`` type: a kernel whose
input or output buffers are f16 dies at lowering time with ``Unsupported
type in mosaic dialect: 'f16'`` — even when all arithmetic inside the
kernel is fp32.  The reference opset's benchmark table and tolerance
ladder both include fp16 rows (reference mojo_opset/tests/perf/
benchmark.md:4, tests/utils.py:90-94), so the Pallas tier must accept
fp16 rather than hard-crash.

``mosaic_f16_compat`` wraps a public kernel entry point: when any array
argument is float16 it

1. records the output dtypes the kernel *would* produce for the original
   arguments (``jax.eval_shape`` — abstract evaluation only reads the
   ``out_shape`` declaration, nothing is lowered to Mosaic),
2. upcasts every f16 array argument to float32 and runs the kernel
   (statistics inside the kernels are fp32 already, so accuracy only
   improves), and
3. casts each output back to its recorded dtype.

bfloat16/fp32/int8 calls take the zero-cost fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_F16 = jnp.float16


def _is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray)) or hasattr(x, "dtype") and hasattr(x, "shape")


def _has_f16(x) -> bool:
    return _is_array(x) and jnp.dtype(x.dtype) == _F16


def _upcast(x):
    return x.astype(jnp.float32) if _has_f16(x) else x


def mosaic_f16_compat(fn):
    """Make a Pallas kernel wrapper accept float16 despite Mosaic's lack of f16."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        leaves = list(args) + list(kwargs.values())
        if not any(_has_f16(v) for v in jax.tree_util.tree_leaves(leaves)):
            return fn(*args, **kwargs)

        arg_idx = [i for i, a in enumerate(args) if _is_array(a)]
        kw_keys = [k for k, v in kwargs.items() if _is_array(v)]

        def call_with(arrs):
            new_args = list(args)
            new_kwargs = dict(kwargs)
            it = iter(arrs)
            for i in arg_idx:
                new_args[i] = next(it)
            for k in kw_keys:
                new_kwargs[k] = next(it)
            return fn(*new_args, **new_kwargs)

        orig_arrays = [args[i] for i in arg_idx] + [kwargs[k] for k in kw_keys]
        want = jax.eval_shape(call_with, orig_arrays)
        out = call_with([_upcast(a) for a in orig_arrays])
        return jax.tree_util.tree_map(
            lambda o, w: o.astype(w.dtype) if o.dtype != w.dtype else o, out, want
        )

    return wrapper


