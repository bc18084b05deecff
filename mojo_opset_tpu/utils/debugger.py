"""MojoDebugger: rule-driven dual-build precision debugging.

Capability parity with reference mojo_opset/utils/debugger.py:179-808
(docs/debug_suite.md): runtime rules select ops to **dump** (tensors +
stats), **compare** (run a golden shadow instance on identical inputs and
log max_abs / max_rel / cos_sim), or compare with ``replace`` mode
(substitute the golden output downstream for per-layer error isolation).

TPU re-design:
  * interception happens in ``MojoOperator.__call__`` via the global
    ``_DEBUG_HOOKS`` list (eager path — the debug build runs ops eagerly,
    which is the JAX analogue of the reference's eager debug mode; under
    jit the hook is traced through, so dumps become traced constants and
    the debugger warns);
  * the golden shadow is built structurally: tier classes share the
    attribute layout of their core op, so the shadow is the same pytree
    re-tagged with the ``ref`` class — no ctor-args recording or
    ``load_state_dict`` weight sync needed (reference :203-228, :752);
  * the reference's semantic ``layer_idx`` propagation (:406-442) maps to
    occurrence counting: the n-th call of an op name within a step is
    layer n; ``new_step()`` resets counters (wired into GeneratorHook).

Rules (API or env ``MOJO_DEBUG_COMPARE`` / ``MOJO_DEBUG_DUMP``, re-read
every forward): comma-separated ``"<layer>:<op_name>"`` with ``*`` for
all layers or all ops, e.g. ``"3:RMSNorm"``, ``"*:PagedDecodeGQA"``,
``"none:Gelu"`` to disable.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _parse_rules(spec: Optional[str]):
    rules = []
    if not spec:
        return rules
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if ":" in part:
            layer, op = part.split(":", 1)
        else:
            layer, op = "*", part
        rules.append((layer.strip(), op.strip()))
    return rules


def _matches(rules, layer_idx: int, op_name: str) -> bool:
    # "none:<op>" rules veto regardless of ordering (reference semantics:
    # exclusion wins over any positive rule, incl. "*:*").
    for layer, op in rules:
        if layer == "none" and (op == "*" or op == op_name):
            return False
    for layer, op in rules:
        if layer == "none":
            continue
        op_ok = op == "*" or op == op_name
        layer_ok = layer == "*" or (layer.isdigit() and int(layer) == layer_idx)
        if op_ok and layer_ok:
            return True
    return False


class MojoDebugger:
    _enabled = False
    _hook = None

    dump_dir: str = "mojo_debug_dump"
    compare_mode: str = "log"  # "log" | "replace"
    compare_rules: list = []
    dump_rules: list = []
    _call_counts: dict = {}
    _shadow_cache: dict = {}

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def enable(
        cls,
        dump_dir: Optional[str] = None,
        compare: Optional[str] = None,
        dump: Optional[str] = None,
        compare_mode: str = "log",
    ):
        from mojo_opset_tpu.core import operator as op_mod

        if dump_dir is not None:
            cls.dump_dir = dump_dir
        cls.compare_rules = _parse_rules(compare)
        cls.dump_rules = _parse_rules(dump)
        cls.compare_mode = compare_mode
        if not cls._enabled:
            cls._hook = cls._on_call
            op_mod._DEBUG_HOOKS.append(cls._hook)
            cls._enabled = True
        logger.info("MojoDebugger enabled (compare=%s dump=%s mode=%s)",
                    compare, dump, compare_mode)

    @classmethod
    def disable(cls):
        from mojo_opset_tpu.core import operator as op_mod

        if cls._enabled and cls._hook in op_mod._DEBUG_HOOKS:
            op_mod._DEBUG_HOOKS.remove(cls._hook)
        cls._enabled = False
        cls._call_counts.clear()
        cls._shadow_cache.clear()

    @classmethod
    def new_step(cls):
        """Reset per-step occurrence counters (call between forwards)."""
        cls._call_counts.clear()

    @classmethod
    def attach(cls, generator):
        """Wire new_step() into a MojoGenerator's hook bus."""
        from mojo_opset_tpu.runtime.generation import GeneratorHook

        class _StepHook(GeneratorHook):
            # reset before AND after each forward so every prefill/decode
            # step counts its ops from layer 0
            def before_prefill(self, **kw):
                cls.new_step()

            def after_prefill(self, **kw):
                cls.new_step()

            def after_decode_step(self, **kw):
                cls.new_step()

        generator._hooks.append(_StepHook())
        return generator

    # -- shadow construction -------------------------------------------
    @classmethod
    def _shadow_of(cls, op):
        """Golden (ref-tier) twin sharing the op's exact parameters."""
        core = type(op).get_registry().get_core_op_cls()
        ref_cls = type(op).get_registry().get("ref")
        if type(op) is ref_cls:
            return None
        shadow = object.__new__(ref_cls)
        for k, v in vars(op).items():
            object.__setattr__(shadow, k, v)
        return shadow

    # -- the hook -------------------------------------------------------
    @classmethod
    def _on_call(cls, op, args, kwargs):
        try:
            # env rules re-read every forward (reference :509-520)
            env_cmp = os.environ.get("MOJO_DEBUG_COMPARE")
            env_dmp = os.environ.get("MOJO_DEBUG_DUMP")
            compare_rules = cls.compare_rules + _parse_rules(env_cmp)
            dump_rules = cls.dump_rules + _parse_rules(env_dmp)
            if not compare_rules and not dump_rules:
                return NotImplemented

            op_name = type(op).get_registry().operator_name
            layer_idx = cls._call_counts.get(op_name, 0)
            cls._call_counts[op_name] = layer_idx + 1

            do_cmp = _matches(compare_rules, layer_idx, op_name)
            do_dmp = _matches(dump_rules, layer_idx, op_name)
            if not (do_cmp or do_dmp):
                return NotImplemented

            if any(
                isinstance(leaf, jax.core.Tracer)
                for leaf in jax.tree_util.tree_leaves((args, kwargs))
            ):
                logger.warning(
                    "MojoDebugger: %s called under jit tracing; debug actions "
                    "need the eager path — skipping", op_name,
                )
                return NotImplemented

            result = op.forward(*args, **kwargs)

            if do_dmp:
                cls._dump(op_name, layer_idx, args, kwargs, result)

            if do_cmp:
                shadow = cls._shadow_of(op)
                if shadow is None:
                    logger.warning("[debug] %s layer %d: op is already the golden tier",
                                   op_name, layer_idx)
                else:
                    ref_out = shadow.forward(*args, **kwargs)
                    cls._log_compare(op_name, layer_idx, result, ref_out)
                    if cls.compare_mode == "replace":
                        return ref_out
            return result
        except Exception as exc:  # debug must never break the model (:788)
            logger.warning("MojoDebugger error (swallowed): %r", exc)
            return NotImplemented

    # -- actions ---------------------------------------------------------
    @classmethod
    def _dump(cls, op_name, layer_idx, args, kwargs, result):
        rank = int(os.environ.get("LOCAL_RANK", jax.process_index()))
        out_dir = Path(cls.dump_dir) / f"rank{rank}"
        out_dir.mkdir(parents=True, exist_ok=True)
        stamp = f"{op_name}_L{layer_idx}_{int(time.time()*1e3)%10**9}"
        payload = {}
        for i, a in enumerate(args):
            if isinstance(a, (jax.Array, np.ndarray)):
                payload[f"in{i}"] = np.asarray(a)
        for i, leaf in enumerate(jax.tree_util.tree_leaves(result)):
            payload[f"out{i}"] = np.asarray(leaf)
        np.savez(out_dir / f"{stamp}.npz", **payload)
        stats = {
            k: (float(np.mean(np.abs(v))), float(np.max(np.abs(v))))
            for k, v in payload.items()
            if np.issubdtype(v.dtype, np.floating)
        }
        logger.info("[debug dump] %s -> %s stats(mean|max abs)=%s", stamp, out_dir, stats)

    @classmethod
    def _log_compare(cls, op_name, layer_idx, result, ref_out):
        got = jax.tree_util.tree_leaves(result)
        ref = jax.tree_util.tree_leaves(ref_out)
        for i, (g, r) in enumerate(zip(got, ref)):
            g = np.asarray(g, np.float32)
            r = np.asarray(r, np.float32)
            diff = np.abs(g - r)
            max_abs = float(diff.max()) if diff.size else 0.0
            denom = np.maximum(np.abs(r), 1e-12)
            max_rel = float((diff / denom).max()) if diff.size else 0.0
            gf, rf = g.ravel(), r.ravel()
            cos = float(
                np.dot(gf, rf) / (np.linalg.norm(gf) * np.linalg.norm(rf) + 1e-12)
            )
            logger.info(
                "[debug compare] %s layer %d out%d: max_abs=%.3e max_rel=%.3e cos_sim=%.6f",
                op_name, layer_idx, i, max_abs, max_rel, cos,
            )
