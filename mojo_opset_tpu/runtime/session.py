"""Paged-attention runtime session.

Parity: reference mojo_opset/runtime/runtime.py:17-271
(AttentionMetadata :18, PagedAttentionRuntimeState :29,
PagedAttentionGenerationModel :231).

TPU-native design:
  * the block allocator (free stack, block tables, sequence lengths) is
    host-side numpy — allocation is control flow and must not trace;
  * the per-layer KV cache arrays are device-side pytree leaves updated
    *functionally* by jitted step functions (donate the caches and XLA
    updates them in place — the analogue of torch's mutation);
  * KV-mirror cross-layer sharing (reference runtime.py:63-80) maps layers
    to shared cache *slots*: mirrored layers read and write the same
    physical buffers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mojo_opset_tpu.runtime.config import MojoConfig
from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclass
class AttentionMetadata:
    """Device-side attention metadata for one step (a pytree).

    ``context_kv_lens`` (lengths before this step's tokens) replaces the
    reference's eager ``chunk_metadata`` plan — the jittable store op
    derives per-token destinations from it (kv_cache.py).
    """

    q_lens: jax.Array
    cu_q_lens: Optional[jax.Array]
    total_seq_lens: jax.Array
    context_kv_lens: jax.Array
    block_tables: jax.Array
    is_prefill: bool

    def tree_flatten(self):
        return (
            (self.q_lens, self.cu_q_lens, self.total_seq_lens, self.context_kv_lens, self.block_tables),
            self.is_prefill,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, is_prefill=aux)


jax.tree_util.register_pytree_node(
    AttentionMetadata,
    AttentionMetadata.tree_flatten,
    lambda aux, children: AttentionMetadata.tree_unflatten(aux, children),
)


class KVCaches:
    """Per-layer paged K/V cache arrays with KV-mirror slot sharing.

    Acts as a list-like view: ``caches.key(layer)`` / ``caches.value(layer)``
    resolve through the slot map; functional updates go through
    ``caches.update(layer, new_k, new_v)`` which returns a new KVCaches.
    Registered as a pytree so it can cross jit boundaries (and be donated).
    """

    def __init__(self, keys: List[jax.Array], values: List[jax.Array], slot_of_layer: List[int],
                 key_scales: List[jax.Array] = (), value_scales: List[jax.Array] = ()):
        self.keys = list(keys)
        self.values = list(values)
        self.slot_of_layer = list(slot_of_layer)
        # per-slot (Hkv, D) fp32 channel scales — populated only for int8
        # (C8) caches; prefill self-calibrates them (amax/127 + headroom)
        self.key_scales = list(key_scales)
        self.value_scales = list(value_scales)

    @classmethod
    def create(
        cls,
        num_layers: int,
        cache_shape: Tuple[int, int, int, int],
        dtype,
        kv_mirror_layers: List[int] = (),
        kv_mirror_imitated_layers: List[int] = (),
    ) -> "KVCaches":
        mirror_map = {
            mirror - 1: imitated - 1
            for mirror, imitated in zip(kv_mirror_layers, kv_mirror_imitated_layers)
        }
        slot_of_layer: List[int] = [-1] * num_layers
        keys, values = [], []
        for layer_idx in range(num_layers):
            if layer_idx in mirror_map:
                src = mirror_map[layer_idx]
                if slot_of_layer[src] < 0:
                    raise ValueError(
                        f"Source layer {src + 1} for mirror layer {layer_idx + 1} must exist first."
                    )
                slot_of_layer[layer_idx] = slot_of_layer[src]
                continue
            slot_of_layer[layer_idx] = len(keys)
            keys.append(jnp.zeros(cache_shape, dtype))
            values.append(jnp.zeros(cache_shape, dtype))
        if jnp.dtype(dtype) == jnp.int8:
            # HND int8 cache: (N, Hkv, bs, D) -> channel scales (Hkv, D)
            n_kv, head_dim = cache_shape[1], cache_shape[3]
            key_scales = [jnp.zeros((n_kv, head_dim), jnp.float32) for _ in keys]
            value_scales = [jnp.zeros((n_kv, head_dim), jnp.float32) for _ in keys]
            return cls(keys, values, slot_of_layer, key_scales, value_scales)
        return cls(keys, values, slot_of_layer)

    def key(self, layer_idx: int) -> jax.Array:
        return self.keys[self.slot_of_layer[layer_idx]]

    def value(self, layer_idx: int) -> jax.Array:
        return self.values[self.slot_of_layer[layer_idx]]

    def update(self, layer_idx: int, new_key: jax.Array, new_value: jax.Array) -> "KVCaches":
        slot = self.slot_of_layer[layer_idx]
        keys = list(self.keys)
        values = list(self.values)
        keys[slot] = new_key
        values[slot] = new_value
        return KVCaches(keys, values, self.slot_of_layer, self.key_scales, self.value_scales)

    def key_scale(self, layer_idx: int) -> jax.Array:
        return self.key_scales[self.slot_of_layer[layer_idx]]

    def value_scale(self, layer_idx: int) -> jax.Array:
        return self.value_scales[self.slot_of_layer[layer_idx]]

    def update_scales(self, layer_idx: int, new_ks: jax.Array, new_vs: jax.Array) -> "KVCaches":
        slot = self.slot_of_layer[layer_idx]
        key_scales = list(self.key_scales)
        value_scales = list(self.value_scales)
        key_scales[slot] = new_ks
        value_scales[slot] = new_vs
        return KVCaches(self.keys, self.values, self.slot_of_layer, key_scales, value_scales)

    @property
    def num_layers(self) -> int:
        return len(self.slot_of_layer)

    def tree_flatten(self):
        return (self.keys, self.values, self.key_scales, self.value_scales), tuple(self.slot_of_layer)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], list(aux), children[2], children[3])


jax.tree_util.register_pytree_node(
    KVCaches, KVCaches.tree_flatten, lambda aux, c: KVCaches.tree_unflatten(aux, c)
)


class PagedAttentionRuntimeState:
    """Session: host-side block allocator + device-side cache pytree."""

    def __init__(
        self,
        config: MojoConfig,
        batch_size: int,
        dtype=None,
        block_size: int = 128,
        max_blocks_per_seq: Optional[int] = None,
    ):
        mc = config.model_config
        self.config = config
        self.batch_size = batch_size
        self.num_layers = mc.num_layers
        self.dtype = dtype or mc.dtype
        self.block_size = block_size
        self.num_kv_heads = mc.local_num_kv_heads
        self.head_dim = mc.head_dim

        self.max_blocks_per_seq = max_blocks_per_seq or (
            (mc.max_position_embeddings + block_size - 1) // block_size
        )
        total_blocks = batch_size * self.max_blocks_per_seq

        # host-side allocator state; the C++ allocator (runtime/native/)
        # shares these numpy buffers zero-copy and is used when available
        self.block_tables = np.full((batch_size, self.max_blocks_per_seq), -1, np.int32)
        self.total_seq_lens = np.zeros((batch_size,), np.int32)
        self.free_blocks = np.arange(total_blocks, dtype=np.int32)
        self.num_free_blocks = total_blocks
        self._native = None
        try:
            from mojo_opset_tpu.runtime.native import NativeBlockAllocator, native_available

            if native_available():
                self._native = NativeBlockAllocator(
                    batch_size, self.max_blocks_per_seq, total_blocks, block_size
                )
        except Exception:
            self._native = None

        self.kv_layout = getattr(mc, "kv_layout", "HND") or "HND"
        if getattr(mc, "kv_cache_quant", False):
            self.dtype = jnp.int8
        if jnp.dtype(self.dtype) == jnp.int8:
            # the C8 store/dequant contract layout — also covers an int8
            # dtype passed directly: KVCaches.create derives the (Hkv, D)
            # channel-scale shape from HND cache dims
            self.kv_layout = "HND"
        if self.kv_layout == "NHD":
            # TPU-native layout: token rows contiguous -> in-place stores
            cache_shape = (total_blocks, block_size, self.num_kv_heads, self.head_dim)
        else:
            cache_shape = (total_blocks, self.num_kv_heads, block_size, self.head_dim)
        self.caches = KVCaches.create(
            self.num_layers,
            cache_shape,
            self.dtype,
            getattr(mc, "kv_mirror_layers", []),
            getattr(mc, "kv_mirror_imitated_layers", []),
        )

    # compat: reference exposes the session itself as .kv_cache
    @property
    def kv_cache(self):
        return self

    @classmethod
    def from_model(cls, model, batch_size: int, *, block_size: int = 128, dtype=None, **kw):
        return cls(model.config, batch_size, dtype=dtype, block_size=block_size, **kw)

    # -- allocator ------------------------------------------------------
    def _allocate_blocks(self, num_blocks: int) -> np.ndarray:
        if num_blocks > self.num_free_blocks:
            raise ValueError("PagedAttentionRuntimeState: Out of paged KV cache memory.")
        allocated = self.free_blocks[self.num_free_blocks - num_blocks : self.num_free_blocks]
        self.num_free_blocks -= num_blocks
        return allocated

    def free_block_count(self) -> int:
        if self._native is not None:
            return self._native.num_free_blocks
        return self.num_free_blocks

    def _normalize_q_lens(self, q_lens) -> np.ndarray:
        if q_lens is None:
            return np.ones(self.batch_size, np.int32)
        return np.asarray(q_lens, np.int32)

    def _reserve(self, q_lens: np.ndarray) -> np.ndarray:
        if self._native is not None:
            return self._native.reserve(q_lens, self.total_seq_lens, self.block_tables)
        previous = self.total_seq_lens.copy()
        for batch_idx in range(self.batch_size):
            context_len = int(previous[batch_idx])
            append_len = int(q_lens[batch_idx])
            old_blocks = -(-context_len // self.block_size)
            new_blocks = -(-(context_len + append_len) // self.block_size)
            for b in range(old_blocks, new_blocks):
                # a valid entry here is a block this sequence still owns
                # from a reserve that was rolled back (speculative rewind)
                # — reuse it instead of dropping it (that would leak)
                if self.block_tables[batch_idx, b] < 0:
                    self.block_tables[batch_idx, b] = self._allocate_blocks(1)[0]
        self.total_seq_lens = previous + q_lens
        return previous

    def reset(self) -> None:
        """Release every sequence, KEEPING the cache arrays.

        Serving reuses the session's pre-allocated cache pool across
        requests (continuous batching); tearing down and re-creating the
        device cache arrays per request costs ~100 ms of host dispatch at
        4B scale through a tunneled device."""
        for batch_idx in range(self.batch_size):
            if int(self.total_seq_lens[batch_idx]) > 0:
                self.release_sequence(batch_idx)

    def release_sequence(self, batch_idx: int) -> None:
        """Return a finished sequence's blocks to the pool (continuous
        batching slot reuse).

        Frees EVERY valid row entry, not just ceil(len/block_size):
        speculative decoding rewinds total_seq_lens after rejecting
        drafted tokens, which can leave reserved blocks beyond the
        rewound length — slicing by the length would leak them."""
        if self._native is not None:
            self._native.release(batch_idx, self.total_seq_lens, self.block_tables)
            return
        row = self.block_tables[batch_idx]
        valid = row[row >= 0]
        self.free_blocks[self.num_free_blocks : self.num_free_blocks + valid.size] = valid[::-1]
        self.num_free_blocks += valid.size
        self.block_tables[batch_idx, :] = -1
        self.total_seq_lens[batch_idx] = 0

    def _build_positions(self, context_kv_lens: np.ndarray, q_lens: np.ndarray) -> np.ndarray:
        positions = []
        for batch_idx in range(self.batch_size):
            start = int(context_kv_lens[batch_idx])
            query_len = int(q_lens[batch_idx])
            if query_len <= 0:
                continue
            positions.append(np.arange(start, start + query_len, dtype=np.int32))
        if not positions:
            return np.empty((0,), np.int32)
        return np.concatenate(positions)

    def _metadata(self, cu_q_lens, context_kv_lens, q_lens) -> AttentionMetadata:
        return AttentionMetadata(
            q_lens=jnp.asarray(q_lens, jnp.int32),
            cu_q_lens=None if cu_q_lens is None else jnp.asarray(cu_q_lens, jnp.int32),
            total_seq_lens=jnp.asarray(self.total_seq_lens, jnp.int32),
            context_kv_lens=jnp.asarray(context_kv_lens, jnp.int32),
            block_tables=jnp.asarray(self.block_tables, jnp.int32),
            is_prefill=cu_q_lens is not None,
        )

    # -- step input preparation ------------------------------------------
    def prepare_prefill_inputs(self, input_ids, q_lens):
        input_ids = np.asarray(input_ids).reshape(-1).astype(np.int32)
        q_lens = self._normalize_q_lens(q_lens)
        if int(q_lens.sum()) != input_ids.size:
            raise ValueError(
                "Prefill input_ids length must match the sum of q_lens: "
                f"{input_ids.size} != {int(q_lens.sum())}"
            )
        context_kv_lens = self._reserve(q_lens)
        positions = self._build_positions(context_kv_lens, q_lens)
        cu_q_lens = np.concatenate([[0], np.cumsum(q_lens)]).astype(np.int32)
        meta = self._metadata(cu_q_lens, context_kv_lens, q_lens)
        return jnp.asarray(input_ids), jnp.asarray(positions), meta

    def prepare_decode_inputs(self, input_ids):
        input_ids = np.asarray(input_ids).reshape(-1).astype(np.int32)
        if input_ids.size != self.batch_size:
            raise ValueError(
                f"Decode input_ids must provide exactly one token per sequence: "
                f"{input_ids.size} != {self.batch_size}"
            )
        q_lens = np.ones(self.batch_size, np.int32)
        positions = self.total_seq_lens.copy()
        context_kv_lens = self._reserve(q_lens)
        meta = self._metadata(None, context_kv_lens, q_lens)
        return jnp.asarray(input_ids), jnp.asarray(positions), meta


class PagedAttentionGenerationModel:
    """Wraps a model for session-managed paged generation.

    Prefill computes ``lm_head_indices = cu_q_lens[1:] - 1`` so only the
    last token of each sequence hits the LM head (reference
    runtime.py:263-266).  Model calls are functional over the cache pytree:
    ``model(input_ids, positions, metadata, caches, lm_head_indices)``
    returns ``(logits, new_caches)`` and the session stores the new caches.
    """

    def __init__(
        self,
        model,
        *,
        block_size: int = 128,
        session_cls=PagedAttentionRuntimeState,
        jit: bool = True,
    ):
        self.model = model
        self.block_size = block_size
        self.session_cls = session_cls
        self._jit = jit
        if jit:
            # The compiled-step pool is the device-graph capture/replay
            # analogue (reference compile/device_graph.py:48-105): one XLA
            # executable per step signature, KV caches donated so the
            # update is in-place.
            from mojo_opset_tpu.runtime.compile_cache import CompiledStepPool

            def _step(model, ids, positions, meta, caches, lm_head_indices):
                return model(ids, positions, meta, caches, lm_head_indices=lm_head_indices)

            self._pool = CompiledStepPool(_step, donate_argnums=(4,))
            # cheap-key memo over the pool: the pool's full signature walk
            # flattens the whole model pytree (~1-5 ms at 4B scale), which
            # serializes with dispatch on every step
            self._runner_memo = {}
        else:
            self._pool = None

    def _new_session(self, input_ids, context_input_len):
        batch_size = (
            int(np.asarray(context_input_len).size)
            if context_input_len is not None
            else int(np.asarray(input_ids).size)
        )
        return self.session_cls.from_model(self.model, batch_size, block_size=self.block_size)

    def __call__(self, input_ids, context_input_len=None, session=None, **kwargs):
        if session is None:
            session = self._new_session(input_ids, context_input_len)

        if context_input_len is not None:
            ids, positions, meta = session.prepare_prefill_inputs(input_ids, context_input_len)
            lm_head_indices = meta.cu_q_lens[1:] - 1
        else:
            ids, positions, meta = session.prepare_decode_inputs(input_ids)
            lm_head_indices = None

        if self._pool is not None:
            cache_sig = tuple(
                (tuple(k.shape), str(k.dtype)) for k in session.caches.keys
            ) + (tuple(session.caches.slot_of_layer),)
            fast_key = (
                int(ids.shape[0]), bool(meta.is_prefill),
                None if lm_head_indices is None else int(lm_head_indices.shape[0]),
                int(meta.block_tables.shape[1]), cache_sig,
            )
            runner = self._runner_memo.get(fast_key)
            if runner is None:
                runner = self._pool.get_runner(
                    self.model, ids, positions, meta, session.caches, lm_head_indices
                )
                self._runner_memo[fast_key] = runner
            logits, new_caches = runner(self.model, ids, positions, meta, session.caches, lm_head_indices)
        else:
            logits, new_caches = self.model(
                ids, positions, meta, session.caches, lm_head_indices=lm_head_indices
            )
        session.caches = new_caches
        return logits, session


def _sample_tokens(logits: jax.Array, method: str, key, top_k: int = 50) -> jax.Array:
    if method == "greedy":
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if method == "topk":
        vals, idx = jax.lax.top_k(logits.astype(jnp.float32), top_k)
        choice = jax.random.categorical(key, vals)
        return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
    raise ValueError(f"unknown sample method {method!r}")


class FusedDecode:
    """Multi-token decode fused into one XLA executable.

    Token-by-token decode pays one host<->device round trip per token
    (sampling + metadata rebuild).  This pre-reserves KV blocks for
    ``n_steps`` on the host, then runs the whole window — model forward,
    on-device sampling, metadata increments — inside a single
    ``lax.scan`` (donated caches).  EOS handling happens on the host
    afterwards, matching batch-serving semantics.
    """

    def __init__(self, model, sample_method: str = "greedy", top_k: int = 50):
        self.model = model
        self.sample_method = sample_method
        self.top_k = top_k
        from mojo_opset_tpu.runtime.compile_cache import CompiledStepPool

        def _run(model, first_tokens, caches, lens0, block_tables, key, n_steps):
            def step(carry, i):
                tokens, caches, key = carry
                meta = AttentionMetadata(
                    q_lens=jnp.ones_like(lens0),
                    cu_q_lens=None,
                    total_seq_lens=lens0 + i + 1,
                    context_kv_lens=lens0 + i,
                    block_tables=block_tables,
                    is_prefill=False,
                )
                logits, caches = model(tokens, lens0 + i, meta, caches, lm_head_indices=None)
                key, sub = jax.random.split(key)
                next_tokens = _sample_tokens(logits, self.sample_method, sub, self.top_k)
                return (next_tokens, caches, key), next_tokens

            (last, caches, _), toks = jax.lax.scan(
                step, (first_tokens, caches, key), jnp.arange(n_steps, dtype=jnp.int32)
            )
            return toks, caches

        self._pool = CompiledStepPool(_run, donate_argnums=(2,))
        self._n_steps_cache = {}

    def __call__(self, session: PagedAttentionRuntimeState, first_tokens, n_steps: int,
                 key=None):
        """Returns (tokens (n_steps, B) int32); session caches/lens update."""
        lens0 = session.total_seq_lens.copy()
        for _ in range(n_steps):
            session._reserve(np.ones(session.batch_size, np.int32))
        bt = jnp.asarray(session.block_tables, jnp.int32)
        lens0_j = jnp.asarray(lens0, jnp.int32)
        if key is None:
            key = jax.random.PRNGKey(0)
        first = jnp.asarray(first_tokens, jnp.int32).reshape(-1)

        import functools

        # cheap key: model is fixed per FusedDecode instance, so only the
        # step count / batch / cache signature matter — a full pytree walk
        # of a 4B-param model costs ~1-5 ms and would serialize with
        # dispatch on every fused window
        sig = (
            n_steps,
            int(first.shape[0]),
            int(bt.shape[1]),
            tuple((tuple(k.shape), str(k.dtype)) for k in session.caches.keys),
            tuple(session.caches.slot_of_layer),
        )
        if sig not in self._n_steps_cache:
            fn = functools.partial(self._pool._step_fn, n_steps=n_steps)
            self._n_steps_cache[sig] = jax.jit(fn, donate_argnums=(2,))
        toks, new_caches = self._n_steps_cache[sig](
            self.model, first, session.caches, lens0_j, bt, key
        )
        session.caches = new_caches
        return toks
