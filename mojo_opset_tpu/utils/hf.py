"""HuggingFace checkpoint interop.

Parity: reference mojo_opset/utils/hf_utils.py:38-343
(``build_model_from_hf`` :110 — config + meta model + sharded-safetensors
load :288; renaming/converter pipeline :176-287).

TPU re-design: models are pytrees, so "load_state_dict" is a functional
leaf replacement keyed by normalized dotted names; our modules are named
after the HF layout (model.layers.N.self_attn.q_proj.weight ...) so most
weights map 1:1, with converter hooks for the rest.  RoPE tables and
workspace buffers are excluded like the reference's post hooks
(core/operators/position_embedding.py:22-30).
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)

# buffers never loaded from checkpoints (reference load-state post hooks)
IGNORED_SUFFIXES = ("inv_freq", "cos", "sin", "codebook", "oe_vocab_sizes",
                    "oe_grams", "oe_vocab_offsets")


def normalize_path(keystr_path: str) -> str:
    """jax keystr ``.model.layers[0].self_attn...`` -> ``model.layers.0.self_attn...``"""
    s = keystr_path
    s = s.replace("']['", ".").replace("['", ".").replace("']", "")
    s = re.sub(r"\[(\d+)\]", r".\1", s)
    s = s.replace("..", ".")
    return s.strip(".")


def state_dict_of(model) -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(model)
    return {
        normalize_path(jax.tree_util.keystr(p)): np.asarray(jax.device_get(l))
        for p, l in flat
    }


def load_state_dict(
    model,
    weights: Dict[str, np.ndarray],
    rename_hooks: Optional[List[Callable[[str], Optional[str]]]] = None,
    converters: Optional[Dict[str, Callable[[np.ndarray], np.ndarray]]] = None,
    strict: bool = True,
):
    """Return a copy of ``model`` with leaves replaced from ``weights``.

    ``rename_hooks``: functions mapping a model path to the checkpoint key
    (first non-None wins).  ``converters``: {path-regex: fn(array)} applied
    to the loaded tensor (transpose/fuse/split transformations —
    reference hf_utils.py:176-287 converter pipeline).
    """
    rename_hooks = rename_hooks or []
    converters = converters or {}
    flat, treedef = jax.tree_util.tree_flatten_with_path(model)
    new_leaves, missing, used = [], [], set()
    for p, leaf in flat:
        path = normalize_path(jax.tree_util.keystr(p))
        if path.split(".")[-1] in IGNORED_SUFFIXES:
            new_leaves.append(leaf)
            continue
        key = None
        for hook in rename_hooks:
            key = hook(path)
            if key is not None:
                break
        if key is None:
            key = path
        if key in weights:
            val = weights[key]
            for pattern, fn in converters.items():
                if re.fullmatch(pattern, path):
                    val = fn(val)
            if tuple(val.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch for {path}: checkpoint {val.shape} vs model {leaf.shape}"
                )
            sharding = getattr(leaf, "sharding", None)
            arr = jnp.asarray(val, dtype=leaf.dtype)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            new_leaves.append(arr)
            used.add(key)
        else:
            missing.append(path)
            new_leaves.append(leaf)
    unexpected = [k for k in weights if k not in used]
    if missing and strict:
        raise KeyError(f"missing weights: {missing[:10]} (+{max(0, len(missing)-10)} more)")
    if missing:
        logger.warning("load_state_dict: %d params kept their init values", len(missing))
    if unexpected:
        logger.debug("load_state_dict: %d unused checkpoint tensors", len(unexpected))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_sharded_safetensors(checkpoint_dir: str) -> Dict[str, np.ndarray]:
    """Load a HF sharded-safetensors checkpoint directory
    (model.safetensors.index.json + shards, or a single file)."""
    from safetensors import safe_open

    index_path = os.path.join(checkpoint_dir, "model.safetensors.index.json")
    weights: Dict[str, np.ndarray] = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
        for shard in shards:
            with safe_open(os.path.join(checkpoint_dir, shard), framework="np") as f:
                for k in f.keys():
                    weights[k] = f.get_tensor(k)
    else:
        single = os.path.join(checkpoint_dir, "model.safetensors")
        if not os.path.exists(single):
            raise FileNotFoundError(f"no safetensors checkpoint under {checkpoint_dir}")
        with safe_open(single, framework="np") as f:
            for k in f.keys():
                weights[k] = f.get_tensor(k)
    logger.info("loaded %d tensors from %s", len(weights), checkpoint_dir)
    return weights


def strip_prefix_hook(prefix: str) -> Callable[[str], Optional[str]]:
    """Common HF rename: model path 'model.layers...' == checkpoint key;
    some checkpoints store everything under an extra prefix."""

    def hook(path: str) -> Optional[str]:
        return prefix + path

    return hook


def build_model_from_hf(
    model_ctor: Callable[..., object],
    checkpoint_dir: str,
    config_translate: Optional[Callable[[dict], object]] = None,
    rename_hooks: Optional[List[Callable[[str], Optional[str]]]] = None,
    converters: Optional[Dict[str, Callable]] = None,
    strict: bool = False,
    preprocess: Optional[Callable[[Dict[str, np.ndarray], dict], Dict[str, np.ndarray]]] = None,
    **ctor_kwargs,
):
    """Build a model from an HF checkpoint directory: read config.json,
    translate it, construct the (randomly-initialized) model, then load
    the sharded safetensors functionally (the reference's meta-model +
    assign-load flow, hf_utils.py:110-175)."""
    cfg_path = os.path.join(checkpoint_dir, "config.json")
    cfg_dict = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg_dict = json.load(f)
    if config_translate is not None:
        config = config_translate(cfg_dict)
        model = model_ctor(config, **ctor_kwargs)
    else:
        model = model_ctor(**ctor_kwargs)
    weights = load_sharded_safetensors(checkpoint_dir)
    if preprocess is not None:
        weights = preprocess(weights, cfg_dict)
    return load_state_dict(model, weights, rename_hooks, converters, strict=strict)


# -- model-specific config translators ---------------------------------


def qwen3_config_from_hf(cfg: dict):
    from mojo_opset_tpu.modeling.qwen3 import Qwen3Config

    return Qwen3Config(
        hidden_size=cfg.get("hidden_size", 4096),
        intermediate_size=cfg.get("intermediate_size", 11008),
        num_attention_heads=cfg.get("num_attention_heads", 32),
        num_key_value_heads=cfg.get("num_key_value_heads", 8),
        num_hidden_layers=cfg.get("num_hidden_layers", 32),
        head_dim=cfg.get("head_dim", cfg.get("hidden_size", 4096) // cfg.get("num_attention_heads", 32)),
        vocab_size=cfg.get("vocab_size", 151936),
        max_position_embeddings=cfg.get("max_position_embeddings", 8192),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 10000.0),
        attention_bias=cfg.get("attention_bias", False),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        dtype=_dtype_from_hf(cfg.get("torch_dtype") or cfg.get("dtype")),
    )


def _dtype_from_hf(name):
    import jax.numpy as jnp

    return {
        "float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16,
    }.get(name, jnp.bfloat16)


def seed_oss_config_from_hf(cfg: dict):
    from mojo_opset_tpu.modeling.seed_oss import SeedOssConfig

    return SeedOssConfig(
        hidden_size=cfg.get("hidden_size", 4096),
        intermediate_size=cfg.get("intermediate_size", 11008),
        num_attention_heads=cfg.get("num_attention_heads", 32),
        num_key_value_heads=cfg.get("num_key_value_heads", 8),
        num_hidden_layers=cfg.get("num_hidden_layers", 32),
        head_dim=cfg.get("head_dim", 128),
        vocab_size=cfg.get("vocab_size", 100352),
        max_position_embeddings=cfg.get("max_position_embeddings", 8192),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 1e7),
        attention_bias=cfg.get("attention_bias", True),
        attention_out_bias=cfg.get("attention_out_bias", False),
        mlp_bias=cfg.get("mlp_bias", False),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        dtype=_dtype_from_hf(cfg.get("torch_dtype") or cfg.get("dtype")),
    )


def qwen3_moe_config_from_hf(cfg: dict):
    from mojo_opset_tpu.modeling.qwen3 import Qwen3MoeConfig

    return Qwen3MoeConfig(
        hidden_size=cfg.get("hidden_size", 2048),
        intermediate_size=cfg.get("intermediate_size", 6144),
        num_attention_heads=cfg.get("num_attention_heads", 32),
        num_key_value_heads=cfg.get("num_key_value_heads", 4),
        num_hidden_layers=cfg.get("num_hidden_layers", 48),
        head_dim=cfg.get("head_dim", 128),
        vocab_size=cfg.get("vocab_size", 151936),
        max_position_embeddings=cfg.get("max_position_embeddings", 40960),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 10000.0),
        attention_bias=cfg.get("attention_bias", False),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        num_experts=cfg.get("num_experts", 128),
        num_experts_per_tok=cfg.get("num_experts_per_tok", 8),
        moe_intermediate_size=cfg.get("moe_intermediate_size", 768),
        dtype=_dtype_from_hf(cfg.get("torch_dtype") or cfg.get("dtype")),
    )


def stack_hf_moe_experts(weights: Dict[str, np.ndarray], num_experts: int) -> Dict[str, np.ndarray]:
    """Synthesize the fused expert tensors this framework stores from HF's
    per-expert Linear weights:

      mlp.experts.{e}.gate_proj/up_proj (I, H) -> mlp.experts.up_proj_weight (E, 2I, H)
      mlp.experts.{e}.down_proj (H, I)         -> mlp.experts.down_proj_weight (E, H, I)
      mlp.gate.weight (E, H)                   -> mlp.gating.gate_weight (H, E)

    The per-expert keys are consumed (removed) so they do not show up as
    unexpected leftovers."""
    out = dict(weights)
    prefixes = sorted(
        {k.rsplit(".experts.", 1)[0] for k in weights if ".experts." in k and ".gate_proj." in k}
    )
    for p in prefixes:
        gates, ups, downs = [], [], []
        for e in range(num_experts):
            gates.append(out.pop(f"{p}.experts.{e}.gate_proj.weight"))
            ups.append(out.pop(f"{p}.experts.{e}.up_proj.weight"))
            downs.append(out.pop(f"{p}.experts.{e}.down_proj.weight"))
        out[f"{p}.experts.up_proj_weight"] = np.stack(
            [np.concatenate([g, u], axis=0) for g, u in zip(gates, ups)]
        )
        out[f"{p}.experts.down_proj_weight"] = np.stack(downs)
        gate_w = out.pop(f"{p}.gate.weight", None)
        if gate_w is not None:
            out[f"{p}.gating.gate_weight"] = gate_w.T
    return out


def deepseek_v3_config_from_hf(cfg: dict):
    from mojo_opset_tpu.modeling.deepseekv3 import DeepseekV3Config

    return DeepseekV3Config(
        hidden_size=cfg.get("hidden_size", 7168),
        intermediate_size=cfg.get("intermediate_size", 18432),
        moe_intermediate_size=cfg.get("moe_intermediate_size", 2048),
        num_attention_heads=cfg.get("num_attention_heads", 128),
        num_hidden_layers=cfg.get("num_hidden_layers", 61),
        vocab_size=cfg.get("vocab_size", 129280),
        max_position_embeddings=cfg.get("max_position_embeddings", 4096),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 10000.0),
        q_lora_rank=cfg.get("q_lora_rank", 1536),
        kv_lora_rank=cfg.get("kv_lora_rank", 512),
        qk_rope_head_dim=cfg.get("qk_rope_head_dim", 64),
        qk_nope_head_dim=cfg.get("qk_nope_head_dim", 128),
        v_head_dim=cfg.get("v_head_dim", 128),
        n_routed_experts=cfg.get("n_routed_experts", 256),
        n_shared_experts=cfg.get("n_shared_experts", 1),
        num_experts_per_tok=cfg.get("num_experts_per_tok", 8),
        first_k_dense_replace=cfg.get("first_k_dense_replace", 3),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        dtype=_dtype_from_hf(cfg.get("torch_dtype") or cfg.get("dtype")),
    )


def _deinterleave_rows(w: np.ndarray) -> np.ndarray:
    """Reorder rope rows [x0,x1,...] -> [x0,x2,...,x1,x3,...]
    (the activation permute HF's apply_rotary_pos_emb_interleave performs,
    folded into the producing weight so plain rotate-half RoPE matches)."""
    d = w.shape[0]
    return np.concatenate([w[0::2], w[1::2]], axis=0)


def deepseek_v3_interleave_converters(hf_cfg: dict):
    """Converters for checkpoints with ``rope_interleave=True`` (the
    DeepSeek-V3 default): de-interleave the weight rows that produce
    q_pe / k_pe so the model's rotate-half RoPE reproduces HF's
    interleaved application exactly."""
    dn = hf_cfg.get("qk_nope_head_dim", 128)
    dr = hf_cfg.get("qk_rope_head_dim", 64)
    dqk = dn + dr

    def fix_q(w: np.ndarray) -> np.ndarray:
        # (H*dqk, rank): permute the rope rows of each head
        H = w.shape[0] // dqk
        w = w.reshape(H, dqk, -1).copy()
        w[:, dn:] = np.concatenate([w[:, dn::2], w[:, dn + 1 :: 2]], axis=1)
        return w.reshape(H * dqk, -1)

    def fix_kv_a(w: np.ndarray) -> np.ndarray:
        # (kv_lora_rank + dr, hidden): permute the trailing rope rows
        w = w.copy()
        w[-dr:] = _deinterleave_rows(w[-dr:])
        return w

    return {
        r"model\.layers\.\d+\.self_attn\.(q_b_proj|q_proj)\.weight": fix_q,
        r"model\.layers\.\d+\.self_attn\.kv_a_proj_with_mqa\.weight": fix_kv_a,
    }
