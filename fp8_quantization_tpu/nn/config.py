"""Layer/model-level quantization configuration.

Typed replacement for the reference's kwargs plumbing
(quantization/base_quantized_classes.py:47-100 QuantizedModule.__init__ and
utils/click_options.py:477-510 quant_params_dict): one frozen dataclass pair
(weight/act quantizer spec + range-estimator spec) carried statically by every
quantized layer.  The reference's `fp8_kwargs` NameError risk
(click_options.py:504-508) is structurally impossible here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from fp8_quantization_tpu.calibration.estimators import EstimatorSpec, RangeEstimators
from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec


@dataclasses.dataclass(frozen=True)
class LayerQuantConfig:
    """Everything a quantized layer needs to know, statically.

    Reference defaults: weight range method current_minmax, act range method
    running_minmax (base_quantized_classes.py:52-53); output (not input)
    activation quantization (hijacker.py:70-86, quantize_input=False).
    """

    weight_quant: QuantizerSpec = QuantizerSpec(method=QMethod.symmetric_uniform)
    act_quant: QuantizerSpec = QuantizerSpec(method=QMethod.asymmetric_uniform)
    weight_range: EstimatorSpec = EstimatorSpec(kind=RangeEstimators.current_minmax)
    act_range: EstimatorSpec = EstimatorSpec(kind=RangeEstimators.running_minmax)
    quantize_input: bool = False
    quant_w: bool = True      # per-layer _quant_w toggle (:86-87)
    quant_a: bool = True      # per-layer _quant_a toggle
    # 'fp32_after': conv on quantized weights, BN in fp32 afterwards
    #   (bit-parity with the reference's BNFusedHijacker, quantized_folded_bn.py:39-48)
    # 'folded': BN scale folded into per-channel weight scale at prepare time
    #   (the paper's deployment assumption; changes numerics)
    bn_mode: str = "fp32_after"
    # Compute engine (nn/layers.py):
    # 'parity' — fp32 matmul on fake-quantized operands (reference semantics)
    # 'bf16'   — normalized-grid operands on the MXU in bf16 (exact grids,
    #            2x fp32 issue rate), channel factors folded post-matmul
    # 'pallas' — fused quant+matmul+epilogue kernel for linear/1x1-conv in
    #            fixed mode (ops/pallas/qmatmul.py); 'bf16' path elsewhere
    engine: str = "parity"
    # Factored fast path only (nn/factored.py): let convs/matmuls whose
    # output is immediately re-quantized onto an <=8-bit grid store their
    # result in bfloat16 (fp32 MXU accumulation; ~2^-9 store rounding, far
    # below the quantizer's step) — halves the epilogue's HBM traffic.
    conv_out_bf16: bool = False
    # pallas engine + INT configs (int_sym weights, int_asym input quant):
    # run the fused kernel's native s8 x s8 -> s32 MXU datapath (v5e rates
    # int8 at ~2x the bf16 peak) instead of upconverting the integer
    # operands to bf16.  Integer accumulation is exact; parity pinned by
    # tests/test_pallas_qmatmul.py::test_int8_native_mxu_datapath.
    int8_mxu: bool = False
    # Deployment assertion for the s8 datapath: the weight grids are SIGNED
    # (the overwhelmingly common case — symmetric weights with both signs),
    # made STATIC so the zero-point algebra's s_w-rowsum term is elided at
    # trace time.  XLA cannot dead-code it when signedness is traced: the
    # rowsum lowers to a cross-lane VPU reduce that measured ~0.8 ms/block
    # on the batch-128 ViT (12.8 of the step's 38 ms) even though s_w == 0.
    # nn/bake.bake_int8_weights VALIDATES the claim against the concrete
    # baked signedness and raises if any layer's grid is unsigned.
    int8_assume_signed: bool = False

    def replace(self, **kw) -> "LayerQuantConfig":
        return dataclasses.replace(self, **kw)

    def with_weight_bits(self, n_bits: int) -> "LayerQuantConfig":
        return self.replace(weight_quant=self.weight_quant.replace(n_bits=n_bits))

    def with_act_bits(self, n_bits: int) -> "LayerQuantConfig":
        return self.replace(act_quant=self.act_quant.replace(n_bits=n_bits))

    def fp32_acts(self) -> "LayerQuantConfig":
        """Reference FP32Acts replacement (base_quantized_classes.py:176-181)."""
        return self.replace(quant_a=False)


def make_layer_config(
    qmethod: str | QMethod = QMethod.fp_quantizer,
    act_qmethod: str | QMethod | None = None,
    n_bits: int = 8,
    n_bits_act: Optional[int] = None,
    per_channel_weights: bool = False,
    scale_domain: str = "linear",
    weight_range_method: str | RangeEstimators = RangeEstimators.current_minmax,
    act_range_method: str | RangeEstimators = RangeEstimators.running_minmax,
    percentile: Optional[float] = None,
    act_momentum: Optional[float] = None,
    num_candidates: Optional[int] = None,
    act_num_candidates: Optional[int] = None,
    quantize_input: bool = False,
    grad_scaling: bool = False,
    # FP8 options (fp8_options, click_options.py:443-474)
    fp8_maxval: Optional[float] = None,
    fp8_mantissa_bits: int = 4,
    fp8_set_maxval: bool = False,
    fp8_learn_maxval: bool = False,
    fp8_learn_mantissa_bits: bool = False,
    fp8_mse_include_mantissa_bits: bool = True,  # CLI default (click_options.py:452-456)
    fp8_allow_unsigned: bool = False,
    bn_mode: str = "fp32_after",
    engine: str = "parity",
    grad_estimator: str = "ste",
    conv_out_bf16: bool = False,
    deploy_cast_quant: bool = False,
    deploy_act_f8: bool = False,
    int8_mxu: bool = False,
    int8_assume_signed: bool = False,
    deploy_cast_ieee: bool = False,
) -> LayerQuantConfig:
    """Build a LayerQuantConfig from reference-style flag values.

    Mirrors quant_params_dict (click_options.py:477-510): the same qmethod and
    fp8 kwargs feed both weight and act quantizers; range methods differ.
    """
    qmethod = QMethod(qmethod)
    act_qmethod = QMethod(act_qmethod) if act_qmethod else qmethod

    def _qspec(method: QMethod, bits: int, per_channel: bool) -> QuantizerSpec:
        return QuantizerSpec(
            method=method, n_bits=bits, per_channel=per_channel,
            scale_domain=scale_domain, grad_scaling=grad_scaling,
            mantissa_bits=fp8_mantissa_bits, maxval=fp8_maxval,
            set_maxval=fp8_set_maxval, learn_maxval=fp8_learn_maxval,
            learn_mantissa_bits=fp8_learn_mantissa_bits,
            mse_include_mantissa_bits=fp8_mse_include_mantissa_bits,
            allow_unsigned=fp8_allow_unsigned,
            cast_fastpath=deploy_cast_quant,
            grad_estimator=grad_estimator)

    weight_range = EstimatorSpec(kind=RangeEstimators(weight_range_method),
                                 percentile=percentile,
                                 num_candidates=num_candidates)
    act_kwargs = {}
    if act_momentum is not None:
        act_kwargs["momentum"] = act_momentum
    # --act-num-candidates falls back to --num-candidates (the reference
    # wires act_range_options["num_candidates"] from config.quant.num_candidates
    # even when act_num_candidates is given, click_options.py:487-488; we keep
    # the flag pair but make the act-specific value actually win).
    act_range = EstimatorSpec(kind=RangeEstimators(act_range_method),
                              percentile=percentile,
                              num_candidates=act_num_candidates or num_candidates,
                              **act_kwargs)

    act_spec = _qspec(act_qmethod, n_bits_act or n_bits, False)
    if deploy_cast_ieee:
        # pure-saturating-cast rounding for ACTIVATION quantizers (weight
        # chains leave the step via baking): same values as deploy_act_f8,
        # bf16 storage — the no-select epilogue MobileNetV2's depthwise
        # fusions need (RESULTS.md round 4)
        act_spec = act_spec.replace(cast_fastpath=True,
                                    cast_ieee_subnorm=True)
    if deploy_act_f8:
        # IEEE-f8 activation storage (ops/fp8.fp8_quantize_cast store_f8):
        # halves inter-layer activation HBM traffic; rides the cast fastpath.
        act_spec = act_spec.replace(cast_fastpath=True, store_f8=True)
    return LayerQuantConfig(
        weight_quant=_qspec(qmethod, n_bits, per_channel_weights),
        act_quant=act_spec,
        weight_range=weight_range, act_range=act_range,
        quantize_input=quantize_input, bn_mode=bn_mode, engine=engine,
        conv_out_bf16=conv_out_bf16, int8_mxu=int8_mxu,
        int8_assume_signed=int8_assume_signed)
