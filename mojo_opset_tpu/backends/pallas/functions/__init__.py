import mojo_opset_tpu.backends.pallas.functions.loss  # noqa: F401
