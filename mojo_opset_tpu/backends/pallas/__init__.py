import mojo_opset_tpu.backends.pallas.operators  # noqa: F401
