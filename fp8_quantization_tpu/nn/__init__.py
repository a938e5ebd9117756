from fp8_quantization_tpu.nn.config import LayerQuantConfig, make_layer_config  # noqa: F401
from fp8_quantization_tpu.nn.layers import (  # noqa: F401
    QuantConv, QuantLayerNorm, QuantLinear, QuantizedActivation)
from fp8_quantization_tpu.nn.quantizers import Quantizer  # noqa: F401
