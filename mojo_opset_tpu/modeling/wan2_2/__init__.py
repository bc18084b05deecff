from mojo_opset_tpu.modeling.wan2_2.modeling_t5 import (
    T5CrossAttention,
    T5Decoder,
    T5Encoder,
    T5EncoderModel,
    T5Model,
    T5SelfAttention,
    umt5_xxl_encoder,
)
from mojo_opset_tpu.modeling.wan2_2.modeling_vae import (
    Wan2_2_VAE,
    WanVAE_,
)
from mojo_opset_tpu.modeling.wan2_2.modeling_wan import (
    WanAttentionBlock,
    WanConfig,
    WanModel,
)
