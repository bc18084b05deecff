from mojo_opset_tpu.runtime.compile_cache import CompiledStepPool, round_up_bucket
from mojo_opset_tpu.runtime.config import (
    AFDRole,
    MojoConfig,
    MojoDynamicConfig,
    MojoModelConfig,
    MojoParallelConfig,
    MojoRunTimeConfig,
)
from mojo_opset_tpu.runtime.generation import (
    DumpHook,
    GeneratorHook,
    GreedySampler,
    MojoGenerator,
    MojoSampler,
    MojoSession,
    PerfHook,
    PerfMojoGenerator,
    TopKSampler,
)
from mojo_opset_tpu.runtime.session import (
    AttentionMetadata,
    KVCaches,
    PagedAttentionGenerationModel,
    PagedAttentionRuntimeState,
)
from mojo_opset_tpu.runtime.comm_context import MojoComputeCommContext, MojoSymmetricMemoryManager
from mojo_opset_tpu.runtime.parallel import (
    dp_allreduce,
    dp_gather,
    dp_scatter,
    merge_group_and_share_ffn,
)
from mojo_opset_tpu.runtime.speculative import SpeculativeDecoder
from mojo_opset_tpu.runtime.continuous import (
    ContinuousBatchingGenerator,
    SpeculativeContinuousBatchingGenerator,
)
