from fp8_quantization_tpu.analytical import distributions, grid, quant_error  # noqa: F401
