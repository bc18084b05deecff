from mojo_opset_tpu.modeling.seed_oss.modeling_seed_oss import (
    SeedOssConfig,
    SeedOssForCausalLM,
)
