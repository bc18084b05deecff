import mojo_opset_tpu.backends.pallas.operators.attention  # noqa: F401
import mojo_opset_tpu.backends.pallas.operators.gemm  # noqa: F401
import mojo_opset_tpu.backends.pallas.operators.moe  # noqa: F401
import mojo_opset_tpu.backends.pallas.operators.normalization  # noqa: F401
import mojo_opset_tpu.backends.pallas.operators.mla  # noqa: F401
import mojo_opset_tpu.backends.pallas.operators.position_embedding  # noqa: F401
