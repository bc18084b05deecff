"""Continuous batching over the paged-KV session.

Slot-level admission/eviction the reference's generator lacks (its
MojoGenerator serves one fixed batch per call): a fixed pool of B slots
decodes in lock-step (one XLA executable per step, shapes never change),
finished sequences release their KV blocks back to the pool
(session.release_sequence — the allocator is host-side), and queued
requests are admitted into free slots with a single mixed prefill whose
``q_lens`` vector is zero everywhere except the admitted slots — the
varlen paged contracts (cu_q_lens) handle zero-length entries natively.

TPU-native consequence: admission never recompiles anything. The decode
step signature is pinned at B, and each distinct admit signature (set of
nonzero q_len buckets) compiles once into the CompiledStepPool.
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.runtime.session import PagedAttentionGenerationModel


class ContinuousBatchingGenerator:
    """Greedy continuous-batching serving loop.

    ``submit(ids)`` enqueues a request and returns its request id;
    ``run()`` drains the queue and returns outputs keyed by request id.
    """

    def __init__(self, model, batch_slots: int = 8, block_size: int = 128,
                 max_new_tokens: int = 64, eos_token_id: Optional[int] = None,
                 pad_token_id: int = 0, decode_window: int = 1,
                 bucket_admits: bool = False,
                 max_prefill_chunk: Optional[int] = None,
                 sampler=None, seed: int = 0,
                 prefix_cache_blocks: int = 0):
        self.gm = PagedAttentionGenerationModel(model, block_size=block_size)
        self.B = batch_slots
        self.block_size = block_size
        self.max_new_tokens = max_new_tokens
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id
        # bucket_admits: pad every admission's TOTAL token count to a
        # bucket so the admit prefill compiles a bounded number of
        # executables (each unique shape is a 20-100 s remote compile
        # through a tunneled chip). Padding lives in a dedicated SCRATCH
        # slot — the real slots' q_lens stay exact, so causal attention
        # and last-token logits are untouched; the scratch slot's garbage
        # KV blocks are released before every admission.
        self.bucket_admits = bool(bucket_admits)
        self._scratch = batch_slots if bucket_admits else None
        self._nslots = batch_slots + (1 if bucket_admits else 0)
        # max_prefill_chunk: admit long prompts in chunks of at most this
        # many tokens (chunked prefill — the paged ops take
        # context_kv_lens > 0 with is_prefill, reference
        # attention.py:315-451). Bounds the latency spike a long prompt
        # inflicts on decoding neighbours.
        self.max_prefill_chunk = max_prefill_chunk
        # per-slot remainder of a partially prefilled prompt
        self._pending: List[Optional[np.ndarray]] = [None] * self.B
        # sampler: any MojoSampler (generation.py); greedy argmax when None.
        # (decode_window fuses greedy sampling into the scan — samplers
        # take the step-by-step path)
        self.sampler = sampler
        self._key = jax.random.PRNGKey(seed)
        if sampler is not None and decode_window > 1:
            raise ValueError("decode_window > 1 currently implies greedy sampling")
        # Automatic prefix caching: when a request completes, the KV
        # blocks fully covered by its PROMPT are donated to a host-side
        # cache keyed by the prompt-token prefix; a later request with a
        # matching block-aligned prefix points its block table at the
        # shared (read-only) blocks and prefills only the suffix — the
        # chunked-prefill contract (context_kv_lens > 0) does the rest.
        # Cache-owned blocks are withheld from the allocator pool up to
        # ``prefix_cache_blocks`` total; 0 disables. Requires greedy
        # sampling (a sampled stream conditioned on a cached prefix is
        # still correct, but cache hits then depend on sampler state —
        # keep it simple and exact).
        self.prefix_cache_blocks = int(prefix_cache_blocks)
        self._prefix_cache: dict = {}  # key: prompt-prefix bytes -> np block ids
        self._prefix_block_ids: set = set()  # cache-owned (withheld from pool)
        self._prefix_owned = 0
        self._slot_shared_blocks: List[int] = [0] * self.B  # leading shared count
        self._slot_prompt: List[Optional[np.ndarray]] = [None] * self.B
        # decode_window > 1: run w lock-step decode steps inside ONE
        # donated-buffer executable (FusedDecode) between admission
        # checks — amortizes the host-dispatch round trip, the dominant
        # serving overhead through a tunneled chip. Finished slots decode
        # garbage for the rest of the window; their output is truncated
        # at EOS and the slot's blocks are reclaimed on re-admission.
        self.decode_window = max(1, int(decode_window))
        self._fused = None
        if self.decode_window > 1:
            from mojo_opset_tpu.runtime.session import FusedDecode

            self._fused = FusedDecode(model, sample_method="greedy")
        self.session = None
        self._queue: deque = deque()
        self._next_id = 0
        # per-slot state (the scratch slot, if any, has no request state)
        self._req_id = [-1] * self.B
        self._out: List[List[int]] = [[] for _ in range(self.B)]
        self._cur = np.full(self._nslots, pad_token_id, np.int32)
        self._results = {}

    def submit(self, ids: Sequence[int]) -> int:
        ids = np.asarray(ids, np.int32).reshape(-1)
        if ids.size == 0:
            # a zero-length admission would read another slot's logits row
            # (lm_head_indices = cu_q_lens[i+1]-1 aliases the neighbour)
            raise ValueError("empty prompt")
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, ids))
        return rid

    # -- internals -----------------------------------------------------------
    def _free_slots(self) -> List[int]:
        return [s for s in range(self.B) if self._req_id[s] < 0]

    def _prefill_call(self, q_lens: np.ndarray, chunks: dict) -> np.ndarray:
        """One mixed varlen prefill; returns per-slot last-token argmax.

        Exact per-slot q_lens: padding a prompt would corrupt causal
        attention (pads are real tokens to the paged kernels). Without
        bucket_admits each distinct signature compiles once into the step
        pool; with it, the TOTAL is padded via the scratch slot so the
        signature set is bounded by the bucket list."""
        if self.bucket_admits:
            from mojo_opset_tpu.runtime.compile_cache import round_up_bucket

            if int(self.session.total_seq_lens[self._scratch]) > 0:
                self.session.release_sequence(self._scratch)
            total = int(q_lens.sum())
            q_lens[self._scratch] = round_up_bucket(total) - total
            chunks[self._scratch] = np.full(
                q_lens[self._scratch], self.pad_token_id, np.int32)
        flat = [chunks[s] for s in range(self._nslots) if q_lens[s]]
        flat = np.concatenate(flat) if flat else np.empty((0,), np.int32)
        logits, self.session = self.gm(flat, context_input_len=q_lens,
                                       session=self.session)
        # lm_head_indices = cu_q_lens[1:]-1 gives one logits row PER SLOT
        # (garbage rows for the zero-length ones — never read)
        return self._sample(logits)

    def _sample(self, logits) -> np.ndarray:
        if self.sampler is None:
            return np.asarray(jnp.argmax(logits, -1), np.int32)
        self._key, sub = jax.random.split(self._key)
        return np.asarray(self.sampler(logits, key=sub), np.int32)

    def _start_slot(self, s: int, tok: int) -> None:
        self._out[s] = [tok]
        self._cur[s] = tok
        self._maybe_finish(s, tok)

    def _admit(self) -> None:
        """Fill free slots from the queue with ONE mixed prefill (long
        prompts enter chunked when max_prefill_chunk is set)."""
        slots = self._free_slots()
        if not slots or not self._queue:
            return
        admitted = []
        for s in slots:
            if not self._queue:
                break
            rid, ids = self._queue.popleft()
            admitted.append((s, rid, ids))
        if not admitted:
            return

        q_lens = np.zeros(self._nslots, np.int32)
        chunks = {}
        for s, _, ids in admitted:
            if int(self.session.total_seq_lens[s]) > 0:
                # reclaim a parked slot's blocks before reuse
                self._release_slot(s)
            self._slot_prompt[s] = ids
            n_tok, shared_ids = self._prefix_lookup(ids)
            if n_tok:
                # point the table head at the shared (read-only) blocks
                # and prefill only the suffix from context = n_tok
                nb = n_tok // self.session.block_size
                self.session.block_tables[s, :nb] = shared_ids[:nb]
                self.session.total_seq_lens[s] = n_tok
                self._slot_shared_blocks[s] = nb
                ids = ids[n_tok:]
            c = self.max_prefill_chunk
            if c is not None and ids.size > c:
                chunks[s], self._pending[s] = ids[:c], ids[c:]
            else:
                chunks[s], self._pending[s] = ids, None
            q_lens[s] = chunks[s].size
        first = self._prefill_call(q_lens, chunks)
        for s, rid, _ids in admitted:
            self._req_id[s] = rid
            if self._pending[s] is None:
                self._start_slot(s, int(first[s]))

    def _continue_prefill(self) -> bool:
        """Advance partially prefilled prompts by one chunk; True if any
        slot is still (or was) mid-prefill this iteration."""
        pend = [s for s in range(self.B) if self._pending[s] is not None]
        if not pend:
            return False
        q_lens = np.zeros(self._nslots, np.int32)
        chunks = {}
        completing = []
        c = self.max_prefill_chunk
        for s in pend:
            ids = self._pending[s]
            if ids.size > c:
                chunks[s], self._pending[s] = ids[:c], ids[c:]
            else:
                chunks[s], self._pending[s] = ids, None
                completing.append(s)
            q_lens[s] = chunks[s].size
        first = self._prefill_call(q_lens, chunks)
        for s in completing:
            self._start_slot(s, int(first[s]))
        return True

    # -- prefix caching -------------------------------------------------------
    def _longest_cached(self, prompt: np.ndarray, n_max: int):
        """Longest cached block-aligned prefix <= n_max tokens.

        The key set is downward-closed (donation inserts every shorter
        full-block prefix), so an ASCENDING scan that stops at the first
        miss is exact and hashes O(hit) bytes instead of O(n^2) on a miss."""
        bs = self.session.block_size
        n, hit = 0, None
        m = bs
        while m <= n_max:
            h = self._prefix_cache.get(prompt[:m].tobytes())
            if h is None:
                break
            n, hit = m, h
            m += bs
        return n, hit

    def _prefix_lookup(self, prompt: np.ndarray):
        """Longest cached block-aligned PROPER prefix (suffix stays >= 1
        token so the admit prefill still produces logits)."""
        if not self.prefix_cache_blocks or self.session is None:
            return 0, None
        bs = self.session.block_size
        return self._longest_cached(prompt, (int(prompt.size) - 1) // bs * bs)

    def _prefix_donate(self, s: int) -> None:
        """Donate a finished slot's full prompt blocks to the cache (they
        are withheld from the pool; the KV content stays on device)."""
        if not self.prefix_cache_blocks:
            return
        prompt = self._slot_prompt[s]
        if prompt is None or self._pending[s] is not None:
            return
        bs = self.session.block_size
        n_full = int(prompt.size) // bs
        # re-check what is cached NOW: another request with the same
        # prompt may have donated since this slot was admitted. Donating
        # duplicate-content blocks would withhold them from the pool
        # while no cache entry references them — a permanent leak.
        m_tok, head = self._longest_cached(prompt, n_full * bs)
        m = m_tok // bs
        if n_full <= m:
            return  # fully cached already; this slot's blocks get freed
        row = self.session.block_tables[s]
        new_ids = [int(row[b]) for b in range(m, n_full)]
        if any(i < 0 for i in new_ids):
            return
        if self._prefix_owned + len(new_ids) > self.prefix_cache_blocks:
            return  # budget exhausted; keep serving uncached
        # chain head uses the CACHED ids (this slot's own head blocks up
        # to m are duplicates and must be released with the slot)
        chain = ([int(b) for b in head[:m]] if head is not None else []) + new_ids
        for nb in range(m + 1, n_full + 1):
            self._prefix_cache[prompt[: nb * bs].tobytes()] = np.asarray(
                chain[:nb], np.int32)
        self._prefix_block_ids.update(new_ids)
        self._prefix_owned += len(new_ids)

    def _release_slot(self, s: int) -> None:
        """Release a REAL slot: scrub cache-owned block ids from the row
        first so release_sequence only frees blocks the slot owns."""
        if self._prefix_block_ids:
            row = self.session.block_tables[s]
            mask = np.isin(row, np.fromiter(self._prefix_block_ids, np.int32))
            row[mask] = -1
        self.session.release_sequence(s)
        self._slot_shared_blocks[s] = 0
        self._slot_prompt[s] = None

    def _maybe_finish(self, s: int, tok: int) -> None:
        done = len(self._out[s]) >= self.max_new_tokens or (
            self.eos_token_id is not None and tok == self.eos_token_id
        )
        if done:
            self._results[self._req_id[s]] = np.asarray(self._out[s], np.int32)
            self._req_id[s] = -1
            self._out[s] = []
            self._prefix_donate(s)
            self._release_slot(s)
            self._cur[s] = self.pad_token_id

    def _active(self) -> List[int]:
        return [s for s in range(self.B) if self._req_id[s] >= 0]

    def _ensure_sessions(self) -> None:
        if self.session is None:
            self.session = self.gm._new_session(
                np.zeros(self._nslots, np.int32), np.ones(self._nslots, np.int32))
            self.session.reset()  # lens back to 0, cache pool kept

    def run(self):
        """Drain the queue; returns {request_id: np.ndarray of new tokens}."""
        self._ensure_sessions()

        while self._queue or self._active():
            self._admit()
            if self._continue_prefill():
                continue  # no decode while any slot is mid-prefill
            if not self._active():
                continue
            if self._fused is not None:
                # bound the window by the tightest remaining budget so no
                # active slot overshoots max_new_tokens
                w = min(
                    self.decode_window,
                    min(self.max_new_tokens - len(self._out[s]) for s in self._active()),
                )
                w = max(w, 1)
                window = np.asarray(
                    self._fused(self.session, jnp.asarray(self._cur), w), np.int32
                )  # (w, B)
                for t in range(w):
                    for s in list(self._active()):
                        tok = int(window[t, s])
                        self._out[s].append(tok)
                        self._cur[s] = tok
                        self._maybe_finish(s, tok)
                continue
            # lock-step decode: parked slots feed pad tokens into slot-
            # local garbage that admission reclaims via release_sequence
            logits, self.session = self.gm(self._cur, session=self.session)
            toks = self._sample(logits)
            for s in self._active():
                tok = int(toks[s])
                self._out[s].append(tok)
                self._cur[s] = tok
                self._maybe_finish(s, tok)
        out, self._results = self._results, {}
        return out


class SpeculativeContinuousBatchingGenerator(ContinuousBatchingGenerator):
    """Continuous batching + speculative decoding: each round advances
    every active slot by 1..k+1 tokens (SpeculativeDecoder.round — fused
    k-step draft + ONE chunked-prefill verify), admission refills freed
    slots on BOTH sessions. Greedy and lossless, like the parts."""

    def __init__(self, model, draft_model, speculative_k: int = 4, **kw):
        kw.pop("decode_window", None)  # the spec round IS the fused window
        # explicit raises (not asserts: kw.pop side effects must survive
        # python -O, or the unsupported kwargs would silently reach the
        # base class and corrupt the slot-count plumbing)
        if kw.pop("bucket_admits", False):
            raise ValueError("bucket_admits is not supported with speculative rounds yet")
        if kw.pop("max_prefill_chunk", None) is not None:
            raise ValueError("chunked-prefill admission is not supported with "
                             "speculative rounds yet")
        if kw.pop("prefix_cache_blocks", 0):
            raise ValueError("prefix caching is not supported with speculative rounds yet")
        if kw.get("sampler") is not None:
            raise ValueError("speculative rounds are greedy-only; a sampler would be "
                             "silently ignored")
        super().__init__(model, **kw)
        from mojo_opset_tpu.runtime.speculative import SpeculativeDecoder

        self.spec = SpeculativeDecoder(
            model, draft_model, k=speculative_k, mode="greedy",
            block_size=self.block_size,
        )
        self.dgm = PagedAttentionGenerationModel(draft_model, block_size=self.block_size)
        self.dsession = None

    def _ensure_sessions(self) -> None:
        super()._ensure_sessions()
        if self.dsession is None:
            self.dsession = self.dgm._new_session(
                np.zeros(self.B, np.int32), np.ones(self.B, np.int32))
            self.dsession.reset()

    def _maybe_finish(self, s: int, tok: int) -> None:
        was_active = self._req_id[s] >= 0
        super()._maybe_finish(s, tok)
        if was_active and self._req_id[s] < 0 and self.dsession is not None:
            self.dsession.release_sequence(s)

    def _admit(self) -> None:
        slots = self._free_slots()
        if not slots or not self._queue:
            return
        admitted = []
        for s in slots:
            if not self._queue:
                break
            rid, ids = self._queue.popleft()
            admitted.append((s, rid, ids))
        if not admitted:
            return

        q_lens = np.zeros(self.B, np.int32)
        chunks = {s: ids for s, _, ids in admitted}
        for s, _, ids in admitted:
            if int(self.session.total_seq_lens[s]) > 0:
                self._release_slot(s)  # base bookkeeping (scrub + state reset)
            if int(self.dsession.total_seq_lens[s]) > 0:
                self.dsession.release_sequence(s)
            q_lens[s] = ids.size
        flat = [chunks[s] for s in range(self.B) if q_lens[s]]
        flat = np.concatenate(flat) if flat else np.empty((0,), np.int32)

        logits, self.session = self.gm(flat, context_input_len=q_lens,
                                       session=self.session)
        _, self.dsession = self.dgm(flat, context_input_len=q_lens,
                                    session=self.dsession)
        first = np.asarray(jnp.argmax(logits, -1), np.int32)
        for s, rid, _ids in admitted:
            self._req_id[s] = rid
            tok = int(first[s])
            self._out[s] = [tok]
            self._cur[s] = tok
            self._maybe_finish(s, tok)

    def run(self):
        self._ensure_sessions()
        while self._queue or self._active():
            self._admit()
            if not self._active():
                continue
            emitted, counts, next_cur = self.spec.round(
                (self.session, self.dsession), jnp.asarray(self._cur))
            next_cur = np.asarray(next_cur, np.int32)
            for s in list(self._active()):
                budget = self.max_new_tokens - len(self._out[s])
                take = int(min(counts[s], budget))
                chunk = emitted[s, :take]
                if self.eos_token_id is not None:
                    hits = np.nonzero(chunk == self.eos_token_id)[0]
                    if hits.size:
                        chunk = chunk[: int(hits[0]) + 1]
                self._out[s].extend(int(t) for t in chunk)
                self._cur[s] = next_cur[s]
                # budget exhausted, explicit EOS, or truncation all end here
                last = int(chunk[-1]) if chunk.size else int(next_cur[s])
                if len(chunk) < int(counts[s]) or len(self._out[s]) >= self.max_new_tokens:
                    # force completion on truncation even without EOS match
                    self._results[self._req_id[s]] = np.asarray(
                        self._out[s][: self.max_new_tokens], np.int32)
                    self._req_id[s] = -1
                    self._out[s] = []
                    self.session.release_sequence(s)
                    self.dsession.release_sequence(s)
                    self._cur[s] = self.pad_token_id
                else:
                    self._maybe_finish(s, last)
        out, self._results = self._results, {}
        return out
