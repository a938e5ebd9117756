"""Model registry.  Reference: models/__init__.py:10-13 (QuantArchitectures)."""

from fp8_quantization_tpu.models.mobilenet_v2 import (  # noqa: F401
    QuantizedMobileNetV2, mobilenetv2_quantized)
from fp8_quantization_tpu.models.resnet import (  # noqa: F401
    QuantizedResNet, resnet18_quantized, resnet50_quantized)
from fp8_quantization_tpu.models.vit import (  # noqa: F401
    QuantizedViT, vit_small_quantized)

QUANT_ARCHITECTURES = {
    "mobilenet_v2_quantized": mobilenetv2_quantized,
    "resnet18_quantized": resnet18_quantized,
    "resnet50_quantized": resnet50_quantized,
    # capability extension beyond the reference zoo (models/vit.py)
    "vit_small_quantized": vit_small_quantized,
}
