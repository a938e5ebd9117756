from fp8_quantization_tpu.ops import fp8, quantizer, rounding, uniform  # noqa: F401
