from fp8_quantization_tpu.ops.pallas.qmatmul import (  # noqa: F401
    FusedQuantMatmulConfig, fused_quant_matmul)
