import mojo_opset_tpu.backends.xla.operators.attention  # noqa: F401
import mojo_opset_tpu.backends.xla.operators.gemm  # noqa: F401
import mojo_opset_tpu.backends.xla.operators.moe  # noqa: F401
import mojo_opset_tpu.backends.xla.operators.compute_with_comm  # noqa: F401
import mojo_opset_tpu.backends.xla.operators.kv_cache  # noqa: F401
import mojo_opset_tpu.backends.xla.operators.sampling  # noqa: F401
import mojo_opset_tpu.backends.xla.operators.mla  # noqa: F401
