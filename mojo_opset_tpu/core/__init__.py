from mojo_opset_tpu.core.function import MojoFunction
from mojo_opset_tpu.core.module import Module
from mojo_opset_tpu.core.operator import MojoOperator
from mojo_opset_tpu.core.registry import BackendNotAvailable, MojoBackendRegistry
