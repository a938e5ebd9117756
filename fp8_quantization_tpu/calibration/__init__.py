from fp8_quantization_tpu.calibration import estimators  # noqa: F401
