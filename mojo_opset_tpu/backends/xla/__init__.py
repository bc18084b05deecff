import mojo_opset_tpu.backends.xla.operators  # noqa: F401
