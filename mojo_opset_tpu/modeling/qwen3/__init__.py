from mojo_opset_tpu.modeling.qwen3.modeling_qwen3 import (
    Qwen3Attention,
    Qwen3Config,
    Qwen3DecoderLayer,
    Qwen3ForCausalLM,
    Qwen3MLP,
    Qwen3Model,
)
from mojo_opset_tpu.modeling.qwen3.modeling_qwen3_moe import (
    MojoQwen3MoeBlock,
    Qwen3MoeConfig,
    Qwen3MoeDecoderLayer,
    Qwen3MoeForCausalLM,
)
from mojo_opset_tpu.modeling.qwen3.quantize import quantize_qwen3, quantize_qwen3_moe
