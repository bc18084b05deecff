from mojo_opset_tpu.core.functions.loss import (
    MojoFusedLinearCrossEntropyFunction,
    MojoFusedLinearCrossEntropyLoss,
    fused_linear_cross_entropy,
)
