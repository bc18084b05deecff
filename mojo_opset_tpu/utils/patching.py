"""Model patching: route HF-ecosystem models through Mojo ops.

Parity: reference mojo_opset/utils/patching.py:1-160
(apply_mojo_to_qwen3 replaces transformers' Qwen3 internals with Mojo ops
pre-instantiation; apply_mojo_to_wan2_2 likewise).

TPU re-design: the reference swaps torch modules inside the HF package;
the JAX-native equivalent is a *checkpoint-level* patch — HF weights load
into our Mojo-op models (same module names) so examples can switch an HF
model for the Mojo version with one call.
"""

from __future__ import annotations

from typing import Optional

import jax

from mojo_opset_tpu.utils.hf import (
    build_model_from_hf,
    load_state_dict,
    qwen3_config_from_hf,
)
from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def apply_mojo_to_qwen3(checkpoint_dir: str, key: Optional[jax.Array] = None, **kwargs):
    """Build the Mojo-op Qwen3ForCausalLM from an HF Qwen3 checkpoint
    (the analogue of patching transformers' modeling_qwen3 —
    reference patching.py:1-81)."""
    from mojo_opset_tpu.modeling.qwen3 import Qwen3ForCausalLM

    return build_model_from_hf(
        Qwen3ForCausalLM, checkpoint_dir, config_translate=qwen3_config_from_hf,
        key=key, **kwargs,
    )


def apply_mojo_to_seed_oss(checkpoint_dir: str, key: Optional[jax.Array] = None, **kwargs):
    """Build the Mojo-op SeedOssForCausalLM from an HF Seed-OSS checkpoint."""
    from mojo_opset_tpu.modeling.seed_oss import SeedOssForCausalLM
    from mojo_opset_tpu.utils.hf import seed_oss_config_from_hf

    def model_prefix_hook(path: str) -> Optional[str]:
        return path if path.startswith("lm_head.") else f"model.{path}"

    return build_model_from_hf(
        SeedOssForCausalLM, checkpoint_dir,
        config_translate=seed_oss_config_from_hf,
        rename_hooks=[model_prefix_hook],
        key=key, **kwargs,
    )


def apply_mojo_to_qwen3_moe(checkpoint_dir: str, key: Optional[jax.Array] = None, **kwargs):
    """Build the Mojo-op Qwen3MoeForCausalLM from an HF Qwen3-MoE
    checkpoint, stacking the per-expert Linear weights into the fused
    ``(E, 2I, H)`` / ``(E, H, I)`` expert tensors."""
    from mojo_opset_tpu.modeling.qwen3 import Qwen3MoeForCausalLM
    from mojo_opset_tpu.utils.hf import qwen3_moe_config_from_hf, stack_hf_moe_experts

    def model_prefix_hook(path: str) -> Optional[str]:
        # this model's pytree has no `model.` wrapper module; the
        # checkpoint stores everything but lm_head under one
        return path if path.startswith("lm_head.") else f"model.{path}"

    return build_model_from_hf(
        Qwen3MoeForCausalLM, checkpoint_dir,
        config_translate=qwen3_moe_config_from_hf,
        preprocess=lambda w, cfg: stack_hf_moe_experts(w, cfg.get("num_experts", 128)),
        rename_hooks=[model_prefix_hook],
        key=key, **kwargs,
    )


def apply_mojo_to_deepseek_v3(checkpoint_dir: str, key: Optional[jax.Array] = None, **kwargs):
    """Build the Mojo-op DeepseekV3ForCausalLM from an HF DeepSeek-V3
    checkpoint.  Handles (a) the kv_b_proj decompression weight living
    inside the MLA ops (shared by prefill/decode), and (b) HF's
    ``rope_interleave=True`` convention by de-interleaving the q_pe/k_pe
    producing rows at load time."""
    import json
    import os
    import re

    from mojo_opset_tpu.modeling.deepseekv3 import DeepseekV3ForCausalLM
    from mojo_opset_tpu.utils.hf import (
        deepseek_v3_config_from_hf,
        deepseek_v3_interleave_converters,
    )

    cfg_path = os.path.join(checkpoint_dir, "config.json")
    hf_cfg = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            hf_cfg = json.load(f)

    def kv_b_hook(path: str) -> Optional[str]:
        m = re.fullmatch(
            r"(model\.layers\.\d+\.self_attn)\.(attn_prefill|attn_decode)\.kv_b_proj", path
        )
        return f"{m.group(1)}.kv_b_proj.weight" if m else None

    converters = (
        deepseek_v3_interleave_converters(hf_cfg)
        if hf_cfg.get("rope_interleave", True)
        else None
    )
    return build_model_from_hf(
        DeepseekV3ForCausalLM, checkpoint_dir,
        config_translate=deepseek_v3_config_from_hf,
        rename_hooks=[kv_b_hook], converters=converters,
        key=key, **kwargs,
    )


def apply_mojo_to_wan2_2(dit_state: dict, config=None, key: Optional[jax.Array] = None):
    """Load a Wan2.2 DiT state dict into the Mojo-op WanModel
    (reference patching.py:136-160)."""
    from mojo_opset_tpu.modeling.wan2_2 import WanConfig, WanModel

    model = WanModel(config or WanConfig(), key=key)
    return load_state_dict(model, dit_state, strict=False)
