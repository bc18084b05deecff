from mojo_opset_tpu.core.operators.activation import MojoGelu, MojoSilu, MojoSwiGLU
from mojo_opset_tpu.core.operators.attention import (
    MojoDecodeGQA,
    MojoPagedDecodeGQA,
    MojoPagedDecodeSWA,
    MojoPagedPrefillGQA,
    MojoPagedPrefillSWA,
    MojoPrefillGQA,
    MojoSdpa,
    MojoSWA,
)
from mojo_opset_tpu.core.operators.compute_with_comm import (
    MojoAll2AllQuantGemm,
    MojoAllGatherGemm,
    MojoGemmAll2All,
    MojoGemmAllReduce,
    MojoGemmReduceScatter,
    MojoQuantGemmAll2All,
)
from mojo_opset_tpu.core.operators.embedding import MojoEmbedding, MojoParallelEmbedding
from mojo_opset_tpu.core.operators.gemm import MojoGemm, MojoGroupGemm, MojoQuantGemm
from mojo_opset_tpu.core.operators.kv_cache import (
    MojoStorePagedKVCache,
    build_paged_kv_chunk_metadata,
    build_paged_kv_token_indices,
)
from mojo_opset_tpu.core.operators.mlp import MojoSwiGLUMLP
from mojo_opset_tpu.core.operators.moe import (
    MojoExperts,
    MojoMoE,
    MojoMoECombine,
    MojoMoEDispatch,
    MojoMoEGating,
    MojoQuantExperts,
    MojoQuantMoE,
    count_expert_tokens,
    unpack_int4,
)
from mojo_opset_tpu.core.operators.normalization import (
    MojoGroupRMSNorm,
    MojoLayerNorm,
    MojoLayerNormQuant,
    MojoResidualAddLayerNorm,
    MojoResidualAddLayerNormQuant,
    MojoResidualAddRMSNorm,
    MojoResidualAddRMSNormQuant,
    MojoRMSNorm,
    MojoRMSNormQuant,
)
from mojo_opset_tpu.core.operators.position_embedding import (
    MojoApplyRoPE,
    MojoApplyVisionRoPE2D,
    MojoMRoPE,
    MojoRotaryEmbedding,
    MojoVisionRotaryEmbedding2D,
)
from mojo_opset_tpu.core.operators.quantize import (
    MojoDequant,
    MojoDequantSwiGLUQuant,
    MojoDynamicQuant,
    MojoMoEDynamicQuant,
    MojoStaticQuant,
)
from mojo_opset_tpu.core.operators.sampling import (
    MojoApplyPenaltiesTempurate,
    MojoJoinProbRejectSampling,
    MojoRejectSampling,
    MojoTopKSampling,
    MojoTopPFilter,
    MojoTopPSampling,
)
from mojo_opset_tpu.core.operators.convolution import MojoCausalConv1dUpdateState, causal_conv1d
from mojo_opset_tpu.core.operators.over_encoding import (
    MojoNF4DequantEmbedding,
    MojoOverEncoding,
    MojoOverEncodingNGram,
    dequantize_nf4_rows,
    n_gram_ids,
    unpack_nf4_int8_to_uint4,
)
