from mojo_opset_tpu.experimental.operators import *  # noqa: F401,F403
