"""Pytree-registered module base for the TPU opset.

The reference framework (XPU-Forces/mojo_opset) builds every op on
``torch.nn.Module`` (reference: mojo_opset/core/operator.py:18).  JAX is
functional, so the TPU-native analogue is a *pytree module*: every
``Module`` subclass is automatically registered as a JAX pytree node whose
array-valued attributes (and sub-modules) are dynamic leaves and whose
remaining attributes (ints, floats, strings, ...) are static aux data.

This gives torch-like ergonomics (``op = MojoRMSNorm(4096); y = op(x)``)
while staying fully compatible with ``jax.jit`` / ``jax.grad`` /
``jax.tree_util`` — an op instance can be passed straight through a jit
boundary, sharded with ``jax.device_put``, or donated.

Design rules:
  * array attrs (``jax.Array``/``np.ndarray``) and ``Module`` attrs are leaves;
  * containers (list/tuple/dict) are dynamic iff they contain any leaf;
  * everything else is static and participates in the jit cache key;
  * avoid mixed containers (``[3, jnp.ones(4)]``) — the int would trace.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def is_array(x: Any) -> bool:
    return isinstance(x, (jax.Array, np.ndarray)) or hasattr(x, "__jax_array__")


def _is_dynamic(v: Any) -> bool:
    if is_array(v) or isinstance(v, Module):
        return True
    if isinstance(v, (list, tuple)):
        return any(_is_dynamic(e) for e in v)
    if isinstance(v, dict):
        return any(_is_dynamic(e) for e in v.values())
    return False


def _canonical(v: Any) -> Any:
    """Convert a static value into a hashable canonical form."""
    if isinstance(v, dict):
        return ("__dict__",) + tuple(sorted((k, _canonical(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return ("__seq__", type(v).__name__) + tuple(_canonical(x) for x in v)
    if isinstance(v, set):
        return ("__set__",) + tuple(sorted(map(_canonical, v)))
    try:
        hash(v)
        return v
    except TypeError:
        return ("__repr__", repr(v))


class _Static:
    """Hashable wrapper carrying arbitrary static aux data."""

    __slots__ = ("value", "_canon")

    def __init__(self, value: Any):
        self.value = value
        self._canon = _canonical(value)

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, _Static) and self._canon == other._canon

    def __hash__(self) -> int:
        return hash(self._canon)

    def __repr__(self) -> str:
        return f"_Static({self.value!r})"


def _flatten_module(mod: "Module"):
    dyn_keys, dyn_vals, static_items = [], [], []
    for k in sorted(vars(mod)):
        v = vars(mod)[k]
        if _is_dynamic(v):
            dyn_keys.append(k)
            dyn_vals.append(v)
        else:
            static_items.append((k, v))
    aux = _Static((type(mod), tuple(dyn_keys), tuple(static_items)))
    return dyn_vals, aux


def _flatten_module_with_keys(mod: "Module"):
    children, aux = _flatten_module(mod)
    _, dyn_keys, _ = aux.value
    keyed = [(jax.tree_util.GetAttrKey(k), v) for k, v in zip(dyn_keys, children)]
    return keyed, aux


def _unflatten_module(aux: _Static, children):
    cls, dyn_keys, static_items = aux.value
    mod = object.__new__(cls)
    for k, v in static_items:
        object.__setattr__(mod, k, v)
    for k, v in zip(dyn_keys, children):
        object.__setattr__(mod, k, v)
    return mod


class Module:
    """Base class: every subclass is a registered JAX pytree node."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_with_keys(
            cls,
            _flatten_module_with_keys,
            _unflatten_module,
            flatten_func=_flatten_module,
        )

    # -- functional update helpers ------------------------------------
    def replace(self, **updates: Any) -> "Module":
        """Return a copy of this module with the given attributes replaced."""
        new = object.__new__(type(self))
        for k, v in vars(self).items():
            object.__setattr__(new, k, v)
        for k, v in updates.items():
            if k not in vars(self):
                raise AttributeError(f"{type(self).__name__} has no attribute {k!r}")
            object.__setattr__(new, k, v)
        return new

    def arrays(self) -> dict[str, Any]:
        """All array leaves of this module, keyed by pytree path string."""
        flat, _ = jax.tree_util.tree_flatten_with_path(self)
        return {jax.tree_util.keystr(path): leaf for path, leaf in flat}

    def extra_repr(self) -> str:  # mirrors reference core/operator.py:131
        return ""

    def __repr__(self) -> str:
        inner = self.extra_repr()
        subs = [k for k, v in vars(self).items() if isinstance(v, Module)]
        if subs:
            inner = ", ".join(x for x in [inner, f"submodules={subs}"] if x)
        return f"{type(self).__name__}({inner})"
