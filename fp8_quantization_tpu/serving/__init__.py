from fp8_quantization_tpu.serving.export import (  # noqa: F401
    export_quantized_model, load_exported)
