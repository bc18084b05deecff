from mojo_opset_tpu.experimental.functions.diffusion_attention import (
    MojoDiffusionAttentionFunction,
    block_diffusion_mask,
    mojo_diffusion_attention,
)
