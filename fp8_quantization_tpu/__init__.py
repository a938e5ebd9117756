"""fp8_quantization_tpu — TPU-native FP8 quantized-inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Qualcomm-AI-research/FP8-quantization ("FP8 Quantization: The Power of the
Exponent", NeurIPS 2022).  Quantizers are pure functions over explicit qparam
pytrees, range estimation is a functional fold over calibration batches, and
the fake-quant round-trip is fused into the conv/linear compute path (XLA
fusion + Pallas kernels), sharded over device meshes with pjit.

Layer map (ours vs reference):
  ops/         quantizer numerics + Pallas kernels   (ref: quantization/quantizers/)
  calibration/ range estimators as functional folds  (ref: quantization/range_estimators.py)
  nn/          quantized Flax layers + configs       (ref: hijacker.py, autoquant_utils.py)
  models/      ResNet-18/50, MobileNetV2             (ref: models/)
  analytical/  expected-MSE / SQNR subsystem         (ref: quant_error_estimator.py, utils/distributions.py)
  parallel/    mesh + sharding + collective reductions (new, TPU-first)
  training/    QAT loop, optimizers, BN re-estimation (ref: utils/qat_utils.py, supervised_driver.py)
  data/        input pipelines                        (ref: utils/imagenet_dataloaders.py)
"""

__version__ = "0.1.0"
