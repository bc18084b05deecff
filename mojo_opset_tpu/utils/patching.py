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


def wan_dit_rename_hook(path: str) -> Optional[str]:
    """Map WanModel pytree paths to official Wan2.2 DiT state-dict keys
    (reference mojo_wan_model.py:208-316 module naming: nn.Sequential
    embeddings, ``ffn.{0,2}`` MLPs)."""
    import re

    rules = (
        (r"patch_(weight|bias)", r"patch_embedding.\1"),
        (r"text_in\.(weight|bias)", r"text_embedding.0.\1"),
        (r"text_out\.(weight|bias)", r"text_embedding.2.\1"),
        (r"time_in\.(weight|bias)", r"time_embedding.0.\1"),
        (r"time_out\.(weight|bias)", r"time_embedding.2.\1"),
        (r"time_proj\.(weight|bias)", r"time_projection.1.\1"),
        (r"(blocks\.\d+)\.ffn_in\.(weight|bias)", r"\1.ffn.0.\2"),
        (r"(blocks\.\d+)\.ffn_out\.(weight|bias)", r"\1.ffn.2.\2"),
    )
    for pat, sub in rules:
        if re.fullmatch(pat, path):
            return re.sub(pat, sub, path)
    return None


def apply_mojo_to_wan2_2(dit_state: dict, config=None, key: Optional[jax.Array] = None):
    """Load a Wan2.2 DiT state dict (official module naming) into the
    Mojo-op WanModel (reference patching.py:136-160)."""
    from mojo_opset_tpu.modeling.wan2_2 import WanConfig, WanModel

    model = WanModel(config or WanConfig(), key=key)
    return load_state_dict(
        model, dit_state, rename_hooks=[wan_dit_rename_hook], strict=False
    )


def wan_vae_rename_hook(path: str) -> Optional[str]:
    """Map WanVAE_ pytree paths to official Wan2.2 VAE state-dict keys
    (reference mojo_vae2_2.py:444-727 naming: ``middle``/``head``
    nn.Sequentials, ResidualBlock ``residual.{0,2,3,6}``, Down/Up
    ``downsamples``/``upsamples`` lists with the trailing Resample)."""
    import re

    # ResidualBlock internals (applied after structural renames below)
    rb = (
        (r"norm1\.weight$", "residual.0.weight"),
        (r"conv1\.(weight|bias)$", r"residual.2.\1"),
        (r"norm2\.weight$", "residual.3.weight"),
        (r"conv2\.(weight|bias)$", r"residual.6.\1"),
        (r"shortcut\.(weight|bias)$", r"shortcut.\1"),
    )

    def rb_sub(rest: str) -> Optional[str]:
        for pat, sub in rb:
            if re.fullmatch(pat, rest):
                return re.sub(pat, sub, rest)
        return None

    m = re.fullmatch(r"(encoder|decoder)\.mid_block([12])\.(.+)", path)
    if m:
        rest = rb_sub(m.group(3))
        idx = {"1": 0, "2": 2}[m.group(2)]
        return f"{m.group(1)}.middle.{idx}.{rest}" if rest else None
    m = re.fullmatch(r"(encoder|decoder)\.mid_attn\.(.+)", path)
    if m:
        return f"{m.group(1)}.middle.1.{m.group(2)}"
    m = re.fullmatch(r"(encoder|decoder)\.head_norm\.weight", path)
    if m:
        return f"{m.group(1)}.head.0.weight"
    m = re.fullmatch(r"(encoder|decoder)\.head_conv\.(weight|bias)", path)
    if m:
        return f"{m.group(1)}.head.2.{m.group(2)}"
    m = re.fullmatch(
        r"encoder\.downsamples\.(\d+)\.blocks\.(\d+)\.(.+)", path
    )
    if m:
        rest = rb_sub(m.group(3))
        return (
            f"encoder.downsamples.{m.group(1)}.downsamples.{m.group(2)}.{rest}"
            if rest else None
        )
    m = re.fullmatch(r"decoder\.upsamples\.(\d+)\.blocks\.(\d+)\.(.+)", path)
    if m:
        rest = rb_sub(m.group(3))
        return (
            f"decoder.upsamples.{m.group(1)}.upsamples.{m.group(2)}.{rest}"
            if rest else None
        )
    # Resample sits at the end of each stage's Sequential; its index is the
    # stage's block count, which load-time can't see — emit a wildcard the
    # loader resolves (see apply_mojo_to_wan2_2_vae).
    m = re.fullmatch(
        r"(encoder\.downsamples|decoder\.upsamples)\.(\d+)\.resample\."
        r"(conv\.(?:weight|bias)|time_conv\.(?:weight|bias))", path
    )
    if m:
        seq = "downsamples" if m.group(1).startswith("encoder") else "upsamples"
        leaf = m.group(3).replace("conv.", "resample.1.", 1) if m.group(3).startswith("conv.") else m.group(3)
        return f"{m.group(1)}.{m.group(2)}.{seq}.<last>.{leaf}"
    return None


def apply_mojo_to_wan2_2_vae(vae_state: dict, vae=None, key: Optional[jax.Array] = None,
                             **vae_kwargs):
    """Load a Wan2.2 causal-VAE state dict (official naming; ``.gamma``
    norm keys accepted) into the Mojo-op WanVAE_
    (reference mojo_vae2_2.py:795-806 gamma->weight rename)."""
    import re

    from mojo_opset_tpu.modeling.wan2_2 import WanVAE_

    model = vae if vae is not None else WanVAE_(key=key, **vae_kwargs)
    state = {}
    for k, v in vae_state.items():
        if k.endswith(".gamma"):
            k = k[: -len(".gamma")] + ".weight"
        state[k] = v
    # resolve the <last> wildcard: the Resample module is the highest index
    # in each stage's Sequential
    last_idx = {}
    for k in state:
        m = re.match(r"((?:encoder\.downsamples|decoder\.upsamples)\.\d+\.(?:downsamples|upsamples))\.(\d+)\.", k)
        if m:
            last_idx[m.group(1)] = max(last_idx.get(m.group(1), 0), int(m.group(2)))

    def hook(path: str) -> Optional[str]:
        key_ = wan_vae_rename_hook(path)
        if key_ is not None and ".<last>." in key_:
            prefix = key_.split(".<last>.")[0]
            key_ = key_.replace("<last>", str(last_idx.get(prefix, 0)))
        return key_

    return load_state_dict(model, state, rename_hooks=[hook], strict=False)
