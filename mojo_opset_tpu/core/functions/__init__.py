from mojo_opset_tpu.core.functions.activation import MojoSiluFunction
from mojo_opset_tpu.core.functions.attention import MojoSWAFunction
from mojo_opset_tpu.core.functions.convolution import MojoCausalConv1dFunction
from mojo_opset_tpu.core.functions.loss import (
    MojoFusedLinearCrossEntropyFunction,
    MojoFusedLinearCrossEntropyLoss,
    fused_linear_cross_entropy,
)
from mojo_opset_tpu.core.functions.normalization import MojoRMSNormFunction
from mojo_opset_tpu.core.functions.position_embedding import MojoApplyRoPEFunction
