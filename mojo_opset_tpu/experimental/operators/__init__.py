from mojo_opset_tpu.experimental.operators.activation import MojoRotateActivation
from mojo_opset_tpu.experimental.operators.attention_gate import MojoFusedAttnOutputGate
from mojo_opset_tpu.experimental.operators.gemm import MojoQuantBatchGemmReduceSum
from mojo_opset_tpu.experimental.operators.indexer import MojoIndexer, MojoLightningIndexer
from mojo_opset_tpu.experimental.operators.kv_cache import (
    MojoDequantFromPagedKVCache,
    MojoStoreLowrank,
    MojoStorePagedKVCacheC8,
    MojoStorePagedMLAKVCache,
)
from mojo_opset_tpu.experimental.operators.kv_quant_attention import (
    MojoPagedDecodeGQAWithKVDequant,
    MojoPagedDecodeNstepSWA,
    MojoPagedDecodeSWAWithKVDequant,
    MojoPagedPrefillGQAWithKVDequant,
    MojoPagedPrefillSWAWithKVDequant,
)
from mojo_opset_tpu.experimental.operators.mla import (
    MojoDecodeMLA,
    MojoPagedDecodeMLA,
    MojoPagedPrefillMLA,
    MojoPrefillMLA,
)
from mojo_opset_tpu.experimental.operators.moe import (
    MojoFusedSwiGLUMoEScaleDynamicQuantize,
    MojoMoEInitRoutingDynamicQuant,
)
from mojo_opset_tpu.experimental.operators.normalization import (
    MojoChannelRMSNorm,
    MojoGroupLayerNorm,
    MojoGroupRMSNormInplace,
    MojoRMSNormInplace,
)
from mojo_opset_tpu.experimental.operators.nsa import (
    MojoDecodeNSA,
    MojoPagedDecodeNSA,
    MojoPagedPrefillNSA,
    MojoPrefillNSA,
)
from mojo_opset_tpu.experimental.operators.position_embedding import (
    MojoGridRoPE,
    MojoMRoPEInplace,
    MojoRelativeEmbedding,
)
from mojo_opset_tpu.experimental.operators.sage import MojoPagedPrefillSageGQA
