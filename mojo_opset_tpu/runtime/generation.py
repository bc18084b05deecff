"""Generation loop: tokenize -> prefill -> sample -> decode, with hooks.

Parity: reference mojo_opset/runtime/generation.py:15-373
(MojoSession/MojoSampler ABCs :15-23, GeneratorHook :26, PerfHook :34,
DumpHook :93, MojoGenerator :109, PerfMojoGenerator :284).

TPU notes: device sync is a scalar host fetch (``device_sync`` — see
benchmark/timing.py; block_until_ready does not reliably wait on the
tunneled-TPU platform); the typewriter
streams through a daemon thread (tokenizer decode off the hot loop); the
device-graph pool maps to jitted step executables (compile_cache.py).
Sampling consumes an explicit PRNG key chain held by the generator.
"""

from __future__ import annotations

import queue
import threading
import time
from abc import ABC, abstractmethod
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mojo_opset_tpu.utils.logging import get_logger, log_table

logger = get_logger(__name__)


class MojoSession(ABC):
    @property
    @abstractmethod
    def kv_cache(self): ...


class MojoSampler(ABC):
    @abstractmethod
    def __call__(self, logits, session=None, key=None): ...


class GreedySampler(MojoSampler):
    def __call__(self, logits, session=None, key=None):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)


class TopKSampler(MojoSampler):
    def __init__(self, top_k: int = 50):
        from mojo_opset_tpu.core.operators.sampling import MojoTopKSampling

        self.op = MojoTopKSampling(top_k=top_k)

    def __call__(self, logits, session=None, key=None):
        _, tokens = self.op(logits, key=key if key is not None else jax.random.PRNGKey(0))
        return tokens[..., 0].astype(jnp.int32)


class GeneratorHook:
    def before_prefill(self, *, input_ids, context_input_len): ...
    def after_prefill(self, *, logits, session): ...
    def before_decode(self): ...
    def after_decode_step(self, *, step, logits, next_token_id): ...
    def after_decode(self, *, decode_steps, generated_ids): ...


class PerfHook(GeneratorHook):
    """Wall-clock phase timer for the generate loop.

    Capability parity with the reference perf hook (reference
    generation.py:34) but built around a named-mark design: each phase
    boundary stamps ``perf_counter`` into ``_marks`` and the whole record
    is derived once at ``after_decode``.  Because jax dispatch is async,
    a boundary that closes device work first fences on the newest array
    it has seen (scalar fetch via ``device_sync`` — ``block_until_ready``
    is unreliable on the tunneled-TPU platform, see benchmark/timing.py).

    ``records`` is the public output: one dict per generate() call with
    keys batch_size / in_tok / prefill_ms / decode_steps /
    decode_total_ms / decode_avg_ms / throughput (tok/s across the
    batch) — the schema ``PerfMojoGenerator`` tabulates.
    """

    def __init__(self, silent: bool = False):
        self.records: List[dict] = []
        self._silent = silent
        self._marks: dict = {}
        self._batch = 0
        self._in_tokens = 0
        self._tail = None  # newest device array seen during decode

    @staticmethod
    def _fence(x) -> None:
        if x is not None:
            from mojo_opset_tpu.benchmark.timing import device_sync

            device_sync(x)

    def _stamp(self, name: str) -> None:
        self._marks[name] = time.perf_counter()

    def before_prefill(self, *, input_ids, context_input_len):
        lens = np.asarray(context_input_len)
        self._batch = int(lens.shape[0])
        self._in_tokens = int(lens.sum())
        self._stamp("prefill")

    def after_prefill(self, *, logits, session):
        self._fence(logits)
        self._stamp("prefill_done")

    def before_decode(self):
        self._stamp("decode")

    def after_decode_step(self, *, step, logits, next_token_id):
        self._tail = next_token_id

    def after_decode(self, *, decode_steps, generated_ids):
        self._fence(self._tail)
        self._stamp("decode_done")
        m = self._marks
        ms = lambda a, b: (m[b] - m[a]) * 1e3  # noqa: E731
        per_step = ms("decode", "decode_done") / decode_steps if decode_steps else 0.0
        rec = {
            "batch_size": self._batch,
            "in_tok": self._in_tokens,
            "prefill_ms": ms("prefill", "prefill_done"),
            "decode_steps": decode_steps,
            "decode_total_ms": ms("decode", "decode_done"),
            "decode_avg_ms": per_step,
            "throughput": self._batch * 1e3 / per_step if per_step else 0.0,
        }
        self.records.append(rec)
        if not self._silent:
            logger.info(
                "[Perf] bs=%(batch_size)d in_tok=%(in_tok)d | "
                "prefill=%(prefill_ms).1fms | decode=%(decode_steps)dsteps "
                "%(decode_total_ms).1fms avg=%(decode_avg_ms).1fms/step "
                "%(throughput).1ftok/s",
                rec,
            )


class DumpHook(GeneratorHook):
    """Persist per-step logits as .npy for offline diffing (capability
    parity: reference generation.py:93)."""

    def __init__(self, dump_dir: str, max_decode_steps: int = 20):
        self._dir = Path(dump_dir)
        self._dir.mkdir(parents=True, exist_ok=True)
        self._budget = max_decode_steps

    def _save(self, stem: str, arr) -> None:
        np.save(self._dir / f"{stem}.npy", np.asarray(arr))

    def after_prefill(self, *, logits, session):
        self._save("prefill_logits", logits)

    def after_decode_step(self, *, step, logits, next_token_id):
        if step <= self._budget:
            self._save(f"decode_step_{step:03d}_logits", logits)


class _Typewriter:
    """Streams decoded text from a daemon thread so tokenizer decode stays
    off the device hot loop (reference uses a multiprocessing Pipe,
    generation.py:136-178)."""

    def __init__(self, tokenizer):
        self._tokenizer = tokenizer
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        full_output = None
        while True:
            item = self._q.get()
            if item is None:
                print("\nGeneration is done.")
                return
            ids = np.concatenate(item, axis=-1)
            texts = [self._tokenizer.decode(row) for row in ids]
            if full_output is None:
                full_output = [f"[{i}] {t}" for i, t in enumerate(texts)]
            else:
                full_output = [a + b for a, b in zip(full_output, texts)]
            print("\033[H\033[0J" + "\n".join(full_output), end="", flush=True)

    def send(self, generated_ids):
        self._q.put([np.asarray(g) for g in generated_ids])

    def close(self):
        self._q.put(None)
        self._thread.join(timeout=5)


class MojoGenerator:
    """Prefill + sampler + decode loop with EOS masking and hook bus
    (reference generation.py:109-281)."""

    def __init__(
        self,
        model,
        tokenizer,
        sampler: MojoSampler,
        max_new_tokens: int = 128,
        enable_typewriter: bool = False,
        typewriter_buffer: int = 4,
        hooks: Optional[List[GeneratorHook]] = None,
        seed: int = 0,
    ):
        self.model = model
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens
        self.sampler = sampler
        self._enable_typewriter = enable_typewriter
        self._typewriter_buffer = typewriter_buffer
        self._hooks = hooks or []
        self._key = jax.random.PRNGKey(seed)

    def _run_hooks(self, method: str, **kwargs):
        for hook in self._hooks:
            getattr(hook, method)(**kwargs)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def __call__(self, prompts, **kwargs):
        encoded = self.tokenizer(prompts, return_tensors=None).input_ids
        context_input_len = np.asarray([len(seq) for seq in encoded], np.int32)
        input_ids = np.concatenate([np.asarray(seq, np.int32) for seq in encoded])
        print(f"Prompt: {prompts}")
        print("-" * 40)
        return self.generate_from_ids(input_ids, context_input_len, **kwargs)

    def generate_from_ids(
        self,
        input_ids,
        context_input_len,
        max_decode_steps: Optional[int] = None,
        ignore_eos: bool = False,
        silent: bool = False,
        fused_decode: bool = False,
    ):
        if fused_decode:
            return self._generate_fused(input_ids, context_input_len, max_decode_steps, ignore_eos)
        return self._generate_stepwise(
            input_ids, context_input_len, max_decode_steps, ignore_eos, silent
        )

    def _generate_fused(self, input_ids, context_input_len, max_decode_steps, ignore_eos):
        """Whole decode window in one XLA executable (FusedDecode); EOS
        masking applied on the host afterwards."""
        from mojo_opset_tpu.runtime.session import FusedDecode

        if max_decode_steps is None:
            max_decode_steps = self.max_new_tokens
        eos_id = getattr(self.tokenizer, "eos_token_id", -1)
        if eos_id is None:
            eos_id = -1

        self._run_hooks("before_prefill", input_ids=input_ids, context_input_len=context_input_len)
        logits, session = self.model(input_ids, context_input_len=context_input_len)
        self._run_hooks("after_prefill", logits=logits, session=session)

        first = self.sampler(logits, session, key=self._next_key())
        self._run_hooks("before_decode")
        method = "greedy" if isinstance(self.sampler, GreedySampler) else "topk"
        fused = FusedDecode(self.model.model, sample_method=method,
                            top_k=getattr(getattr(self.sampler, "op", None), "top_k", 50))
        toks = fused(session, first, max_decode_steps - 1, key=self._next_key())
        out = np.concatenate([np.asarray(first)[None], np.asarray(toks)], axis=0).T  # (B, steps)
        self._run_hooks("after_decode", decode_steps=max_decode_steps - 1, generated_ids=list(out.T))
        if not ignore_eos and eos_id >= 0:
            hit = out == eos_id
            after = np.cumsum(hit, axis=1) > 0
            out = np.where(after, eos_id, out)
        return out

    def _generate_stepwise(
        self,
        input_ids,
        context_input_len,
        max_decode_steps: Optional[int] = None,
        ignore_eos: bool = False,
        silent: bool = False,
    ):
        if max_decode_steps is None:
            max_decode_steps = self.max_new_tokens
        eos_id = getattr(self.tokenizer, "eos_token_id", -1)
        if eos_id is None:
            eos_id = -1

        typewriter = (
            _Typewriter(self.tokenizer) if (self._enable_typewriter and not silent) else None
        )

        self._run_hooks("before_prefill", input_ids=input_ids, context_input_len=context_input_len)
        logits, session = self.model(input_ids, context_input_len=context_input_len)
        if hasattr(session, "pre_allocate"):
            session.pre_allocate(max_decode_steps)
        self._run_hooks("after_prefill", logits=logits, session=session)

        next_token_id = self.sampler(logits, session, key=self._next_key())
        generated_ids = [np.asarray(next_token_id)]
        all_generated = [np.asarray(next_token_id)]

        input_tok = next_token_id
        should_end = np.asarray(next_token_id) == eos_id
        decode_steps = 0

        self._run_hooks("before_decode")
        for step in range(1, max_decode_steps):
            logits, session = self.model(input_tok, session=session)
            next_token_id = self.sampler(logits, session, key=self._next_key())
            decode_steps += 1
            self._run_hooks(
                "after_decode_step", step=step, logits=logits, next_token_id=next_token_id
            )
            next_np = np.asarray(next_token_id)
            prev_end = should_end
            should_end = should_end | (next_np == eos_id)
            if not ignore_eos:
                # sequences that ended EARLIER stay clamped to EOS; the
                # step that produces a sequence's FIRST EOS must still be
                # emitted (breaking before append dropped the final EOS
                # from the last-finishing sequence, making the stepwise
                # and fused paths disagree)
                next_np = np.where(prev_end, eos_id, next_np)
                next_token_id = jnp.asarray(next_np)
            generated_ids.append(next_np)
            all_generated.append(next_np)
            if not ignore_eos and bool(np.all(should_end)):
                break
            input_tok = next_token_id

            if typewriter is not None and len(generated_ids) >= self._typewriter_buffer:
                typewriter.send([g[:, None] if g.ndim == 1 else g for g in generated_ids])
                generated_ids = []

        self._run_hooks("after_decode", decode_steps=decode_steps, generated_ids=all_generated)

        if typewriter is not None:
            if generated_ids:
                typewriter.send([g[:, None] if g.ndim == 1 else g for g in generated_ids])
            typewriter.close()
        return np.stack(all_generated, axis=-1)


class PerfMojoGenerator(MojoGenerator):
    """Built-in perf sweep: prefill latency at seqlen {512..8192} @ bs1 and
    decode throughput at bs {1..24} @ ctx 4000 (reference
    generation.py:284-373 — this defines the e2e benchmark protocol)."""

    PREFILL_SEQLENS = (512, 1024, 2048, 4096, 8192)
    DECODE_BATCH_SIZES = (1, 2, 4, 8, 16, 24)
    DECODE_CONTEXT = 4000

    def __init__(self, *args, **kwargs):
        hooks = kwargs.pop("hooks", None) or []
        self.perf_hook = PerfHook(silent=True)
        hooks.append(self.perf_hook)
        super().__init__(*args, hooks=hooks, **kwargs)

    def _run_perf_case(self, batch_size, seqlen, max_decode_steps):
        vocab_size = 32000
        if hasattr(self.model, "model") and hasattr(self.model.model, "config"):
            vocab_size = getattr(self.model.model.config.model_config, "vocab_size", 32000)
        rng = np.random.default_rng(0)
        input_ids = rng.integers(0, vocab_size, (batch_size * seqlen,)).astype(np.int32)
        context_input_len = np.full((batch_size,), seqlen, np.int32)
        # warm run first: the first call pays XLA compilation (20-100 s on
        # a remote-compile TPU), which must not land in the latency record
        n_before = len(self.perf_hook.records)
        self.generate_from_ids(
            input_ids, context_input_len,
            max_decode_steps=max_decode_steps, ignore_eos=True, silent=True,
        )
        del self.perf_hook.records[n_before:]
        self.generate_from_ids(
            input_ids, context_input_len,
            max_decode_steps=max_decode_steps, ignore_eos=True, silent=True,
        )

    def _run_fused_decode_case(self, batch_size):
        """Time a whole FusedDecode window (warm compile first)."""
        from mojo_opset_tpu.runtime.session import FusedDecode

        vocab_size = 32000
        if hasattr(self.model, "model") and hasattr(self.model.model, "config"):
            vocab_size = getattr(self.model.model.config.model_config, "vocab_size", 32000)
        rng = np.random.default_rng(0)
        seqlen = self.DECODE_CONTEXT
        ids = rng.integers(0, vocab_size, (batch_size * seqlen,)).astype(np.int32)
        lens = np.full((batch_size,), seqlen, np.int32)
        logits, session = self.model(ids, context_input_len=lens)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        steps = self.max_new_tokens
        fused = FusedDecode(self.model.model, sample_method="greedy")
        from mojo_opset_tpu.benchmark.timing import device_sync

        for _ in range(2):  # compile + settle
            toks = fused(session, tok, steps)
            device_sync(toks)
            tok = toks[-1]
        t0 = time.perf_counter()
        toks = fused(session, tok, steps)
        device_sync(toks)
        dt = time.perf_counter() - t0
        return {
            "batch_size": batch_size, "decode_steps": steps,
            "decode_avg_ms": dt / steps * 1e3,
            "throughput": batch_size * steps / dt,
        }

    def __call__(self, prompts=None, prefill_seqlens=None, decode_batch_sizes=None,
                 fused=False):
        logger.info("Starting Prefill Latency Tests...")
        self.perf_hook.records.clear()
        for seqlen in prefill_seqlens or self.PREFILL_SEQLENS:
            self._run_perf_case(batch_size=1, seqlen=seqlen, max_decode_steps=1)
        prefill_records = list(self.perf_hook.records)

        log_table(logger, "=" * 60)
        log_table(logger, f"{'Prefill Latency Tests':^60}")
        log_table(logger, f"{'SeqLen':<15} | {'Batch Size':<15} | {'Prefill Latency (ms)':<20}")
        for r in prefill_records:
            log_table(logger, f"{r['in_tok']:<15} | {r['batch_size']:<15} | {r['prefill_ms']:<20.2f}")

        logger.info("Starting Decode Throughput Tests...")
        self.perf_hook.records.clear()
        for bs in decode_batch_sizes or self.DECODE_BATCH_SIZES:
            self._run_perf_case(
                batch_size=bs, seqlen=self.DECODE_CONTEXT, max_decode_steps=self.max_new_tokens
            )
        decode_records = list(self.perf_hook.records)

        fused_records = []
        if fused:
            logger.info("Starting FUSED Decode Throughput Tests...")
            for bs in decode_batch_sizes or self.DECODE_BATCH_SIZES:
                fused_records.append(self._run_fused_decode_case(bs))
            log_table(logger, "=" * 80)
            log_table(logger, f"{'Fused Decode Throughput (single-executable window)':^80}")
            log_table(logger, f"{'Batch Size':<12} | {'Decode Steps':<15} | "
                              f"{'Avg Latency (ms/step)':<22} | {'Throughput (tok/s)':<20}")
            for r in fused_records:
                log_table(logger, f"{r['batch_size']:<12} | {r['decode_steps']:<15} | "
                                  f"{r['decode_avg_ms']:<22.2f} | {r['throughput']:<20.2f}")

        log_table(logger, "=" * 80)
        log_table(logger, f"{'Decode Throughput Tests (Context Len = %d)' % self.DECODE_CONTEXT:^80}")
        log_table(
            logger,
            f"{'Batch Size':<12} | {'Decode Steps':<15} | {'Avg Latency (ms/step)':<22} | {'Throughput (tok/s)':<20}",
        )
        for r in decode_records:
            log_table(
                logger,
                f"{r['batch_size']:<12} | {r['decode_steps']:<15} | {r['decode_avg_ms']:<22.2f} | {r['throughput']:<20.2f}",
            )
        return {"prefill": prefill_records, "decode": decode_records,
                "fused_decode": fused_records}
