import mojo_opset_tpu.backends.pallas.functions.activation  # noqa: F401
import mojo_opset_tpu.backends.pallas.functions.attention  # noqa: F401
import mojo_opset_tpu.backends.pallas.functions.convolution  # noqa: F401
import mojo_opset_tpu.backends.pallas.functions.diffusion_attention  # noqa: F401
import mojo_opset_tpu.backends.pallas.functions.loss  # noqa: F401
import mojo_opset_tpu.backends.pallas.functions.normalization  # noqa: F401
import mojo_opset_tpu.backends.pallas.functions.position_embedding  # noqa: F401
