from mojo_opset_tpu.parallel.mesh import build_mesh, mesh_from_parallel_config
from mojo_opset_tpu.parallel.plans import (
    ShardRule,
    qwen3_tp_rules,
    shard_model,
)
