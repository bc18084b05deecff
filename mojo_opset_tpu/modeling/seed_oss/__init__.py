from mojo_opset_tpu.modeling.seed_oss.modeling_seed_oss import (
    SeedOssConfig,
    SeedOssForCausalLM,
)
from mojo_opset_tpu.modeling.seed_oss.quantize import quantize_seed_oss
