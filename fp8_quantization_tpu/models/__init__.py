"""Model registry.  Reference: models/__init__.py:10-13 (QuantArchitectures)."""

from fp8_quantization_tpu.models.mobilenet_v2 import (  # noqa: F401
    QuantizedMobileNetV2, mobilenetv2_quantized)
from fp8_quantization_tpu.models.resnet import (  # noqa: F401
    QuantizedResNet, resnet18_quantized, resnet50_quantized)

QUANT_ARCHITECTURES = {
    "mobilenet_v2_quantized": mobilenetv2_quantized,
    "resnet18_quantized": resnet18_quantized,
    "resnet50_quantized": resnet50_quantized,
}
