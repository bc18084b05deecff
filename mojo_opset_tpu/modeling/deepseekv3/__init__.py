from mojo_opset_tpu.modeling.deepseekv3.modeling_deepseek_v3 import (
    DeepseekV3Attention,
    DeepseekV3Config,
    DeepseekV3DecoderLayer,
    DeepseekV3ForCausalLM,
    DeepseekV3MLP,
    DeepseekV3MoE,
    DeepseekV3Model,
    MLARuntimeState,
)
from mojo_opset_tpu.modeling.deepseekv3.quantize import quantize_deepseek_v3
