"""Speculative decoding over the paged-KV runtime.

E2e draft-and-verify loop composing ops the reference ships piecemeal
(``MojoRejectSampling`` reference sampling.py:209-253, N-step decode
semantics, MTP flags in MojoRunTimeConfig) but never wires into its
generator. TPU-native design: the draft rounds and the verify step are
each one donated-buffer XLA executable (CompiledStepPool), and all
accept/rollback bookkeeping stays on the host where the block allocator
already lives — rolling back speculated tokens is just rewinding the
per-sequence length (the paged store overwrites the dead slots on the
next round).

Modes:
  * ``greedy`` — draft greedy, target greedy, accept the longest matching
    prefix. LOSSLESS: the emitted stream is bit-identical to vanilla
    greedy decoding of the target model (tested).
  * ``reject`` — stochastic acceptance via ``MojoRejectSampling``
    (target_p/draft_p >= u — the reference op's SIMPLIFIED contract,
    sampling.py:209-253, not full residual-corrected speculative
    sampling), correction token sampled from the target distribution at
    the first rejected position; proposals are the draft's greedy stream
    with their softmax probabilities as draft_p.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.core.operators import MojoRejectSampling
from mojo_opset_tpu.runtime.compile_cache import CompiledStepPool
from mojo_opset_tpu.runtime.session import PagedAttentionRuntimeState


class SpeculativeDecoder:
    """Draft-model speculative decoding; both models share tokenizer and
    vocab. ``k`` draft tokens are proposed per round and verified by ONE
    chunked-prefill forward of the target (q_len = k+1 per sequence)."""

    def __init__(self, target_model, draft_model, k: int = 4,
                 mode: str = "greedy", block_size: int = 128):
        assert mode in ("greedy", "reject")
        self.target = target_model
        self.draft = draft_model
        self.k = int(k)
        self.mode = mode
        self.block_size = block_size
        self.reject_op = MojoRejectSampling()

        def _verify(model, ids, positions, meta, caches):
            # all-position logits: no lm_head_indices
            return model(ids, positions, meta, caches, lm_head_indices=None)

        self._verify_pool = CompiledStepPool(_verify, donate_argnums=(4,))

        def _prefill(model, ids, positions, meta, caches, lm_head_indices):
            return model(ids, positions, meta, caches, lm_head_indices=lm_head_indices)

        self._prefill_pool = CompiledStepPool(_prefill, donate_argnums=(4,))

        def _draft_round(model, first_tokens, caches, lens0, block_tables, k):
            """k+1 greedy draft steps inside one executable; returns k
            proposed tokens (k, B) and their draft probs. The extra step
            stores d_k in the draft cache so an all-accepted round leaves
            the draft ready at context+k+1 (its proposal is discarded)."""
            def step(carry, i):
                tokens, caches = carry
                from mojo_opset_tpu.runtime.session import AttentionMetadata

                meta = AttentionMetadata(
                    q_lens=jnp.ones_like(lens0),
                    cu_q_lens=None,
                    total_seq_lens=lens0 + i + 1,
                    context_kv_lens=lens0 + i,
                    block_tables=block_tables,
                    is_prefill=False,
                )
                logits, caches = model(tokens, lens0 + i, meta, caches, lm_head_indices=None)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                p = jnp.take_along_axis(probs, nxt[:, None], axis=-1)[:, 0]
                return (nxt, caches), (nxt, p)

            (last, caches), (toks, ps) = jax.lax.scan(
                step, (first_tokens, caches), jnp.arange(k + 1, dtype=jnp.int32)
            )
            return toks[:-1], ps[:-1], caches

        self._draft_pool = CompiledStepPool(_draft_round, donate_argnums=(2,),
                                            static_argnums=(5,))
        # cheap-key memos in front of the pools: models are fixed per
        # decoder instance, so only batch/cache/table shapes matter — a
        # full pytree walk of a 4B model costs ~1-5 ms per round
        self._runner_memo = {}

    @staticmethod
    def _cache_sig(caches):
        return (
            tuple((tuple(k.shape), str(k.dtype)) for k in caches.keys),
            tuple(caches.slot_of_layer),
        )

    # -- session plumbing --------------------------------------------------
    def new_sessions(self, batch_size: int):
        t = PagedAttentionRuntimeState.from_model(
            self.target, batch_size, block_size=self.block_size)
        d = PagedAttentionRuntimeState.from_model(
            self.draft, batch_size, block_size=self.block_size)
        return t, d

    def prefill(self, sessions, input_ids, q_lens):
        """Prefill BOTH models on the prompt (pooled executables);
        returns the first target token (greedy) per sequence."""
        tsess, dsess = sessions
        ids, pos, meta = tsess.prepare_prefill_inputs(input_ids, q_lens)
        lm_idx = meta.cu_q_lens[1:] - 1
        runner = self._prefill_pool.get_runner(
            self.target, ids, pos, meta, tsess.caches, lm_idx)
        logits, tsess.caches = runner(self.target, ids, pos, meta, tsess.caches, lm_idx)
        ids_d, pos_d, meta_d = dsess.prepare_prefill_inputs(input_ids, q_lens)
        lm_idx_d = meta_d.cu_q_lens[1:] - 1
        drunner = self._prefill_pool.get_runner(
            self.draft, ids_d, pos_d, meta_d, dsess.caches, lm_idx_d)
        _, dsess.caches = drunner(self.draft, ids_d, pos_d, meta_d, dsess.caches, lm_idx_d)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _rollback(self, session, new_lens: np.ndarray) -> None:
        """Rewind per-sequence lengths after rejecting speculated tokens.
        Blocks stay allocated; the paged store overwrites the dead slots
        at the rewound offsets on the next round. In-place int32 write:
        the native allocator reads this exact buffer through a ctypes
        int32 view (runtime/native/__init__.py:121-132)."""
        session.total_seq_lens[:] = new_lens.astype(np.int32)

    # -- one speculative round ---------------------------------------------
    def round(self, sessions, cur_tokens, key: Optional[jax.Array] = None):
        """Advance every sequence by 1..k+1 tokens.

        Returns ``(emitted (B, k+1) int32, counts (B,) how many of the
        k+1 slots are real, next_cur_tokens (B,))``. ``cur_tokens`` is the
        last emitted token per sequence (not yet in either KV cache).
        """
        tsess, dsess = sessions
        B = dsess.batch_size
        k = self.k

        # ---- draft k greedy tokens in one fused executable ----
        lens0 = dsess.total_seq_lens.copy()
        dsess._reserve(np.full(B, k + 1, np.int32))
        bt = jnp.asarray(dsess.block_tables, jnp.int32)
        l0 = jnp.asarray(lens0, jnp.int32)
        dkey = ("draft", k, B, int(bt.shape[1]), self._cache_sig(dsess.caches))
        runner = self._runner_memo.get(dkey)
        if runner is None:
            runner = self._draft_pool.get_runner(
                self.draft, cur_tokens, dsess.caches, l0, bt, k)
            self._runner_memo[dkey] = runner
        d_toks, d_ps, dsess.caches = runner(
            self.draft, cur_tokens, dsess.caches, l0, bt, k)
        d_toks = jnp.swapaxes(d_toks, 0, 1)  # (B, k)
        d_ps = jnp.swapaxes(d_ps, 0, 1)

        # ---- ONE target verify forward over [cur, d_1..d_k] ----
        d_np = np.asarray(d_toks)
        cur_np = np.asarray(cur_tokens).reshape(B, 1)
        window = np.concatenate([cur_np, d_np], axis=1)  # (B, k+1)
        ids, pos, meta = tsess.prepare_prefill_inputs(
            window.reshape(-1), np.full(B, k + 1, np.int32))
        vkey = ("verify", k, B, int(meta.block_tables.shape[1]),
                self._cache_sig(tsess.caches))
        vrunner = self._runner_memo.get(vkey)
        if vrunner is None:
            vrunner = self._verify_pool.get_runner(self.target, ids, pos, meta, tsess.caches)
            self._runner_memo[vkey] = vrunner
        logits, tsess.caches = vrunner(self.target, ids, pos, meta, tsess.caches)
        logits = logits.reshape(B, k + 1, -1)  # (B, k+1, V)

        if self.mode == "greedy":
            t_argmax = np.asarray(jnp.argmax(logits, axis=-1), np.int32)  # (B, k+1)
            # accepted = longest prefix where draft token == target argmax
            match = (d_np == t_argmax[:, :k])
            m = np.where(match.all(1), k, match.argmin(1)).astype(np.int64)  # (B,)
            next_cur = t_argmax[np.arange(B), m]  # correction or bonus
        else:
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            _, accepted = self.reject_op(probs, d_toks, d_ps, key=key)
            m = np.asarray(accepted, np.int64)
            # correction/bonus: sample target distribution at position m
            sub = jax.random.split(key, 2)[1] if key is not None else jax.random.PRNGKey(0)
            pick = jax.random.categorical(
                sub, jnp.log(jnp.clip(probs, 1e-20, None)), axis=-1)  # (B, k+1)
            next_cur = np.asarray(pick, np.int32)[np.arange(B), m]

        # emitted this round: the m accepted draft tokens + the correction
        emitted = np.concatenate([d_np, next_cur[:, None].astype(np.int32)], axis=1)
        for b in range(B):
            emitted[b, int(m[b])] = next_cur[b]
        counts = m + 1  # m drafts + 1 correction/bonus token

        # ---- rollback: both caches keep exactly context+1+m valid rows ----
        new_lens = lens0 + 1 + m
        self._rollback(tsess, new_lens)
        self._rollback(dsess, new_lens)
        return emitted, counts.astype(np.int64), jnp.asarray(next_cur, jnp.int32)

    # -- fused window: R rounds in ONE executable ----------------------------
    def _fused_window_fn(self, target, draft, cur, t_caches, d_caches,
                         lens0, t_bt, d_bt, k, rounds):
        """R speculative rounds entirely on device (greedy mode).

        The unfused ``round()`` pays several host<->device transfers per
        round (draft tokens out, verify logits out, metadata rebuild in)
        — ~2 RTTs/round, which on a tunneled TPU (~30 ms RTT) dwarfs the
        compute.  Here the per-sequence lengths live on device and the
        draft scan, target verify, acceptance and length bookkeeping all
        run inside one ``lax.scan`` over rounds; the host sees only the
        final ``(emitted, counts)`` buffers.  Blocks for the worst case
        (rounds*(k+1) tokens/seq) are pre-reserved by the caller.
        """
        from mojo_opset_tpu.runtime.session import AttentionMetadata

        B = cur.shape[0]
        ones = jnp.ones((B,), jnp.int32)

        def one_round(carry, _):
            cur, t_caches, d_caches, lens = carry

            def dstep(c, i):
                tok, dc = c
                meta = AttentionMetadata(
                    q_lens=ones, cu_q_lens=None,
                    total_seq_lens=lens + i + 1, context_kv_lens=lens + i,
                    block_tables=d_bt, is_prefill=False,
                )
                logits, dc = draft(tok, lens + i, meta, dc, lm_head_indices=None)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, dc), nxt

            # k+1 draft steps: the extra step stores d_k's KV so an
            # all-accepted round leaves the draft ready at context+k+1
            (_, d_caches), d_toks = jax.lax.scan(
                dstep, (cur, d_caches), jnp.arange(k + 1, dtype=jnp.int32))
            d_bt_toks = jnp.swapaxes(d_toks[:k], 0, 1)  # (B, k)

            # ONE chunked-prefill verify over [cur, d_1..d_k] per sequence
            window = jnp.concatenate([cur[:, None], d_bt_toks], axis=1)
            ids = window.reshape(-1)
            pos = (lens[:, None] + jnp.arange(k + 1, dtype=jnp.int32)).reshape(-1)
            cu = jnp.arange(B + 1, dtype=jnp.int32) * (k + 1)
            meta = AttentionMetadata(
                q_lens=jnp.full((B,), k + 1, jnp.int32), cu_q_lens=cu,
                total_seq_lens=lens + k + 1, context_kv_lens=lens,
                block_tables=t_bt, is_prefill=True,
            )
            logits, t_caches = target(ids, pos, meta, t_caches, lm_head_indices=None)
            t_arg = jnp.argmax(logits.reshape(B, k + 1, -1), axis=-1).astype(jnp.int32)

            match = d_bt_toks == t_arg[:, :k]
            m = jnp.where(match.all(axis=1), k, jnp.argmin(match, axis=1)).astype(jnp.int32)
            next_cur = jnp.take_along_axis(t_arg, m[:, None], axis=1)[:, 0]
            cols = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
            emitted = jnp.where(
                cols == m[:, None], next_cur[:, None],
                jnp.concatenate([d_bt_toks, jnp.zeros((B, 1), jnp.int32)], axis=1))
            return (next_cur, t_caches, d_caches, lens + 1 + m), (emitted, m + 1)

        (cur, t_caches, d_caches, lens), (emit, counts) = jax.lax.scan(
            one_round, (cur, t_caches, d_caches, lens0), None, length=rounds)
        return emit, counts, cur, lens, t_caches, d_caches

    def fused_window(self, sessions, cur_tokens, rounds: int):
        """Run ``rounds`` greedy speculative rounds in one executable.

        Returns ``(emitted (rounds, B, k+1) np.int32, counts (rounds, B)
        np.int64, next_cur (B,) device)``; both sessions' lengths are
        synced from the device afterwards (one transfer per window)."""
        assert self.mode == "greedy", "fused windows support greedy mode only"
        tsess, dsess = sessions
        B, k = dsess.batch_size, self.k
        # worst case both caches advance rounds*(k+1) tokens/seq
        budget = np.full(B, rounds * (k + 1), np.int32)
        lens0 = tsess.total_seq_lens.copy()
        tsess._reserve(budget)
        dsess._reserve(budget)
        t_bt = jnp.asarray(tsess.block_tables, jnp.int32)
        d_bt = jnp.asarray(dsess.block_tables, jnp.int32)
        l0 = jnp.asarray(lens0, jnp.int32)

        fkey = ("fused", rounds, k, B, int(t_bt.shape[1]), int(d_bt.shape[1]),
                self._cache_sig(tsess.caches), self._cache_sig(dsess.caches))
        runner = self._runner_memo.get(fkey)
        if runner is None:
            runner = jax.jit(self._fused_window_fn, static_argnums=(8, 9),
                             donate_argnums=(3, 4))
            self._runner_memo[fkey] = runner
        emit, counts, next_cur, lens, tsess.caches, dsess.caches = runner(
            self.target, self.draft, cur_tokens, tsess.caches, dsess.caches,
            l0, t_bt, d_bt, k, rounds)
        lens_np = np.asarray(lens, np.int32)
        self._rollback(tsess, lens_np)
        self._rollback(dsess, lens_np)
        return np.asarray(emit, np.int32), np.asarray(counts, np.int64), next_cur

    def generate_fused(self, input_ids, q_lens, max_new_tokens: int,
                       eos_token_id: Optional[int] = None,
                       rounds_per_window: Optional[int] = None):
        """Greedy speculative generate using fused windows.

        Emits the same stream as :meth:`generate` (both are lossless vs
        vanilla greedy target decoding — tested); the host touches the
        device once per window instead of twice per round."""
        q_lens = np.asarray(q_lens, np.int32)
        B = q_lens.size
        sessions = self.new_sessions(B)
        cur = self.prefill(sessions, input_ids, q_lens)

        out = np.zeros((B, max_new_tokens), np.int32)
        filled = np.zeros(B, np.int64)
        done = np.zeros(B, bool)
        out[:, 0] = np.asarray(cur)
        filled[:] = 1
        if eos_token_id is not None:
            done |= out[:, 0] == eos_token_id
        # first window sized for full acceptance (k+1 tokens/round); if
        # acceptance ran lower, top up with small fixed-size windows so at
        # most two window shapes ever compile
        if rounds_per_window is None:
            rounds_per_window = max(1, -(-(int(max_new_tokens) - 1) // (self.k + 1)))
        topup = min(4, rounds_per_window)
        rounds, first = 0, True
        while ((filled < max_new_tokens) & ~done).any():
            w = rounds_per_window if first else topup
            first = False
            emitted, counts, cur = self.fused_window(sessions, cur, w)
            rounds += w
            for r in range(w):
                for b in range(B):
                    if done[b] or filled[b] >= max_new_tokens:
                        continue
                    take = int(min(counts[r, b], max_new_tokens - filled[b]))
                    chunk = emitted[r, b, :take]
                    if eos_token_id is not None:
                        hits = np.nonzero(chunk == eos_token_id)[0]
                        if hits.size:
                            take = int(hits[0]) + 1
                            chunk = chunk[:take]
                            done[b] = True
                    out[b, filled[b]:filled[b] + take] = chunk
                    filled[b] += take
        if eos_token_id is not None:
            for b in range(B):
                if done[b] and filled[b] < max_new_tokens:
                    out[b, filled[b]:] = eos_token_id
        self.last_rounds = rounds
        return out

    # -- full generate loop --------------------------------------------------
    def generate(self, input_ids, q_lens, max_new_tokens: int,
                 key: Optional[jax.Array] = None,
                 eos_token_id: Optional[int] = None):
        """Greedy/speculative generate; returns (B, max_new_tokens) ids.

        With ``eos_token_id``, everything after a sequence's first EOS is
        clamped to EOS (batch-serving semantics, matching
        MojoGenerator's masking — generation.py EOS handling)."""
        q_lens = np.asarray(q_lens, np.int32)
        B = q_lens.size
        if self.mode == "reject" and key is None:
            # each round must draw fresh acceptance/correction randomness;
            # without a seed every round would reuse PRNGKey(0)
            key = jax.random.PRNGKey(0)
        sessions = self.new_sessions(B)
        cur = self.prefill(sessions, input_ids, q_lens)

        out = np.zeros((B, max_new_tokens), np.int32)
        filled = np.zeros(B, np.int64)
        done = np.zeros(B, bool)
        # first token comes straight from the prefill
        out[:, 0] = np.asarray(cur)
        filled[:] = 1
        if eos_token_id is not None:
            done |= out[:, 0] == eos_token_id
        rounds = 0
        while ((filled < max_new_tokens) & ~done).any():
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            emitted, counts, cur = self.round(sessions, cur, key=sub)
            for b in range(B):
                if done[b]:
                    continue
                take = int(min(counts[b], max_new_tokens - filled[b]))
                chunk = emitted[b, :take]
                if eos_token_id is not None:
                    hits = np.nonzero(chunk == eos_token_id)[0]
                    if hits.size:
                        take = int(hits[0]) + 1
                        chunk = chunk[:take]
                        done[b] = True
                out[b, filled[b]:filled[b] + take] = chunk
                filled[b] += take
            rounds += 1
        if eos_token_id is not None:
            for b in range(B):
                if done[b] and filled[b] < max_new_tokens:
                    out[b, filled[b]:] = eos_token_id
        self.last_rounds = rounds
        return out
