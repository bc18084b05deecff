"""Runtime configuration objects.

Parity: reference mojo_opset/runtime/config.py:24-201
(MojoModelConfig :30, MojoRunTimeConfig :82, AFDRole :104,
MojoParallelConfig :114, MojoConfig :197) — re-expressed as plain
dataclasses (no pydantic dependency); dtypes are jnp dtypes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum, auto
from typing import Any, List, Optional

import jax.numpy as jnp

_DTYPE_MAPPING = {
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
}


def _as_dtype(value):
    if isinstance(value, str):
        if value not in _DTYPE_MAPPING:
            raise ValueError(f"unsupported dtype: {value}")
        return _DTYPE_MAPPING[value]
    return value


class MojoDynamicConfig:
    """Config base allowing extra/dynamic fields (reference
    runtime/config.py:24-28, pydantic ``extra="allow"``).  Dataclass
    subclasses gain tolerant construction via :meth:`from_dict` — unknown
    keys become plain attributes instead of raising."""

    @classmethod
    def from_dict(cls, values: dict):
        import dataclasses

        known = {f.name for f in dataclasses.fields(cls)} if dataclasses.is_dataclass(cls) else set()
        obj = cls(**{k: v for k, v in values.items() if k in known})
        for k, v in values.items():
            if k not in known:
                setattr(obj, k, v)
        return obj

    def extra_fields(self) -> dict:
        import dataclasses

        known = {f.name for f in dataclasses.fields(self)} if dataclasses.is_dataclass(self) else set()
        return {k: v for k, v in self.__dict__.items() if k not in known}


@dataclass
class MojoModelConfig(MojoDynamicConfig):
    hidden_size: int = 0
    embed_dim: int = 0
    head_dim: int = 0
    num_heads: int = 0
    num_kv_heads: int = 0
    num_layers: int = 0

    vocab_size: int = 0
    max_position_embeddings: int = 2048

    model_name: str = ""
    dtype: Any = jnp.bfloat16

    # cross-layer KV cache sharing (1-indexed layer lists, reference
    # runtime/runtime.py:63-80)
    kv_mirror_layers: List[int] = field(default_factory=list)
    kv_mirror_imitated_layers: List[int] = field(default_factory=list)

    # paged-cache physical layout: "NHD" (N, bs, Hkv, D) is the TPU-native
    # in-place-update layout; "HND" (N, Hkv, bs, D) is the reference shape
    # (see core/operators/attention.py paged_cache_dims)
    kv_layout: str = "NHD"

    # int8 (C8) KV cache with per-channel scales (reference
    # experimental/operators/kv_cache.py:109 + kv-dequant attention);
    # halves the decode-step cache traffic. Requires HND layout.
    kv_cache_quant: bool = False

    rope_theta: float = 10000.0
    rope_mode: str = ""
    rope_scale: int = 1
    rope_percentage: float = 1.0

    rms_norm_eps: float = 1e-6
    intermediate_size: int = 0

    has_context_layernorm: bool = True
    has_k_layernorm: bool = True
    use_rmsnorm: bool = True
    residual_post_ln_layers: List[int] = field(default_factory=list)

    has_attn_bias: bool = False
    gqa_weights_layout: str = "AABB"
    q_head_times: int = 1

    moe_expert_num: int = 0
    moe_topk: int = 0
    share_expert_num: int = 0
    moe_ffn_internal_dim: int = 0
    moe_ffn_has_bias: bool = False
    is_exp_moe: bool = False

    has_mlp_gate: bool = True
    tie_word_embeddings: bool = False
    is_meta: bool = False

    extra: dict = field(default_factory=dict)

    def __post_init__(self):
        self.dtype = _as_dtype(self.dtype)

    @property
    def local_num_kv_heads(self) -> int:
        return self.extra.get("local_num_kv_heads", self.num_kv_heads)


@dataclass
class MojoRunTimeConfig:
    preshard_only: bool = False
    is_deterministic: bool = False

    use_device_graph: bool = False  # -> AOT-compiled decode executables
    use_paged_attention: bool = False
    use_mtp: bool = False
    mtp_draft_recurrent: bool = False

    max_batch_size: int = 16
    max_length: int = 2048
    max_total_tokens: int = 0
    max_num_pred_tokens: int = -1

    num_pages: int = 32
    page_block_size: int = 256

    vanilla_checkpoint_path: Optional[str] = None
    preshard_checkpoint_path: Optional[str] = None


class AFDRole(Enum):
    """Attention-FFN disaggregation role."""

    ATTN = auto()
    FFN = auto()

    def __str__(self):
        return self.name


@dataclass
class MojoParallelConfig:
    """Distributed parallelism configuration (mesh-axis sizes).

    On TPU these map onto a ``jax.sharding.Mesh``: TP/SP ride ICI axes,
    DP typically the DCN axis; AFD splits the device set into an
    attention group (DP x SP x TP x PP) and an FFN group (EP x TP x PP).
    """

    AFD_ENABLED: bool = False
    AFD_ROLE: AFDRole = AFDRole.FFN

    PP_SIZE: int = 1

    ATTN_DP_SIZE: int = 1
    ATTN_SP_SIZE: int = 1
    ATTN_TP_SIZE: int = 1
    ATTN_PP_SIZE: int = 1  # AFD_ATTN only

    FFN_EP_SIZE: int = 1
    FFN_TP_SIZE: int = 1
    FFN_PP_SIZE: int = 1  # AFD_FFN only

    USE_ULISSES: bool = True

    def __post_init__(self):
        sizes = (
            self.PP_SIZE, self.ATTN_DP_SIZE, self.ATTN_SP_SIZE, self.ATTN_TP_SIZE,
            self.ATTN_PP_SIZE, self.FFN_EP_SIZE, self.FFN_TP_SIZE, self.FFN_PP_SIZE,
        )
        if any(s <= 0 for s in sizes):
            raise ValueError("All parallel sizes must be positive integers")

    @property
    def world_size(self) -> int:
        if not self.AFD_ENABLED:
            return self.ATTN_DP_SIZE * self.ATTN_SP_SIZE * self.ATTN_TP_SIZE * self.PP_SIZE
        return (
            self.ATTN_DP_SIZE * self.ATTN_SP_SIZE * self.ATTN_TP_SIZE * self.ATTN_PP_SIZE
            + self.FFN_EP_SIZE * self.FFN_TP_SIZE * self.FFN_PP_SIZE
        )

    @property
    def attn_world_size(self) -> int:
        if not self.AFD_ENABLED:
            raise ValueError("ATTN world size is not defined when AFD is disabled")
        return self.ATTN_DP_SIZE * self.ATTN_SP_SIZE * self.ATTN_TP_SIZE * self.ATTN_PP_SIZE

    @property
    def ffn_world_size(self) -> int:
        if not self.AFD_ENABLED:
            raise ValueError("FFN world size is not defined when AFD is disabled")
        return self.FFN_EP_SIZE * self.FFN_TP_SIZE * self.FFN_PP_SIZE


@dataclass
class MojoConfig:
    model_config: Optional[MojoModelConfig] = None
    parallel_config: MojoParallelConfig = field(default_factory=MojoParallelConfig)
    runtime_config: MojoRunTimeConfig = field(default_factory=MojoRunTimeConfig)
