import mojo_opset_tpu.backends.pallas.operators  # noqa: F401
import mojo_opset_tpu.backends.pallas.functions  # noqa: F401
