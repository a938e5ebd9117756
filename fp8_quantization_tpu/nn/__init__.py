from fp8_quantization_tpu.nn.config import LayerQuantConfig, make_layer_config  # noqa: F401
from fp8_quantization_tpu.nn.bake import bake_weights  # noqa: F401
from fp8_quantization_tpu.nn.layers import (  # noqa: F401
    QuantConv, QuantConv1d, QuantConvTranspose, QuantLayerNorm, QuantLinear,
    QuantizedActivation)
from fp8_quantization_tpu.nn.quantizers import Quantizer  # noqa: F401
