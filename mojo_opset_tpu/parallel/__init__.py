from mojo_opset_tpu.parallel.checkpoint import (
    mojo_parallel_load_state_dict_naive,
    mojo_parallel_save_state_dict_naive,
    stat_dict_rename_hook,
    state_dict,
)
from mojo_opset_tpu.parallel.mesh import build_mesh, local_mesh_for_role, mesh_from_parallel_config
from mojo_opset_tpu.parallel.plans import ShardRule, moe_ep_rules, qwen3_tp_rules, shard_model
from mojo_opset_tpu.parallel.styles import (
    MojoColwiseParallel,
    MojoDataParallel,
    MojoDistributedModule,
    MojoExpertParallel,
    MojoParallelStyle,
    MojoQKVColwiseParallel,
    MojoRegisterableParallelStyle,
    MojoRowwiseParallel,
    MojoSwiGLUParallel,
    MojoTensorParallel,
    mojo_parallelize_module,
)
