"""Quantized model zoo: build, calibrate, evaluate, convert."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.calibration.calibrate import calibrate, evaluate
from fp8_quantization_tpu.calibration.estimators import RangeEstimators
from fp8_quantization_tpu.models import (
    mobilenetv2_quantized, resnet18_quantized, resnet50_quantized)
from fp8_quantization_tpu.nn.config import make_layer_config
from tests._tiny import japply

BASE_FP8 = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_mantissa_bits=4,
    fp8_set_maxval=True, weight_range_method="current_minmax",
    act_range_method="allminmax")

BASE_INT8 = make_layer_config(
    qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
    per_channel_weights=True, weight_range_method="current_minmax",
    act_range_method="allminmax")


def _rand_images(n, size, seed=0):
    return jnp.asarray(np.random.RandomState(seed).normal(0, 1, (n, size, size, 3)),
                       jnp.float32)


def _small_resnet(base, quant_setup=None, num_classes=5, bottleneck=False):
    """1-block-per-stage ResNet: same layer kinds/presets, ~4x faster compile."""
    from fp8_quantization_tpu.models.resnet import (
        QuantizedResNet, resnet_configs)

    return QuantizedResNet(stage_sizes=(1, 1, 1, 1), bottleneck=bottleneck,
                           num_classes=num_classes,
                           **resnet_configs(base, quant_setup))


SMALL_MBV2 = ((1, 8, 1, 1), (6, 12, 2, 2))  # reduced settings for fast tests


@pytest.mark.parametrize("base", [BASE_FP8, BASE_INT8], ids=["fp8", "int8"])
def test_resnet18_calibrate_and_eval(base):
    model = _small_resnet(base, num_classes=10)
    x = _rand_images(2, 32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    assert "quant" in variables and "batch_stats" in variables

    # calibrate on two batches, then frozen eval
    variables = calibrate(model, variables, [_rand_images(2, 32, s) for s in (1, 2)])
    y1 = japply(model, variables, x, mode="fixed")
    y2 = japply(model, variables, x, mode="fixed")
    assert y1.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))  # deterministic

    # quantized forward differs from fp32 forward
    y_fp = japply(model, variables, x, mode="fixed", quant_w=False, quant_a=False)
    assert not np.allclose(np.asarray(y1), np.asarray(y_fp))


def test_resnet18_calibration_initializes_ranges():
    model = _small_resnet(BASE_FP8, num_classes=10)
    x = _rand_images(2, 32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    quant = variables["quant"]
    # stem weight quantizer got per-channel maxvals from data
    stem_q = quant["stem"]["weight_q"]["q"]
    assert stem_q["maxval"].shape == (64,)
    assert bool(stem_q["initialized"])
    kernel = variables["params"]["stem"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(stem_q["maxval"]),
        np.max(np.abs(np.asarray(kernel)), axis=(0, 1, 2)), rtol=1e-6)


def test_resnet50_builds():
    # bottleneck topology, 1 block per stage (full resnet50 covered by bench)
    model = _small_resnet(BASE_FP8, num_classes=7, bottleneck=True)
    x = _rand_images(1, 32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = japply(model, variables, x, mode="fixed")
    assert y.shape == (1, 7)


def test_mobilenet_v2_calibrate_and_eval():
    model = mobilenetv2_quantized(BASE_FP8, num_classes=10, settings=SMALL_MBV2)
    x = _rand_images(2, 32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    y = japply(model, variables, x, mode="fixed")
    assert y.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("setup", ["all", "FP_logits", "fc4", "LSQ", "LSQ_paper"])
def test_resnet_quant_setups(setup):
    model = _small_resnet(BASE_FP8, quant_setup=setup)
    x = _rand_images(1, 32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = japply(model, variables, x, mode="fixed")
    assert y.shape == (1, 5)


@pytest.mark.parametrize("setup", ["all", "FP_logits", "fc4", "fc4_dw8",
                                   "dw_bf16_acts", "LSQ", "LSQ_paper"])
def test_mobilenet_quant_setups(setup):
    model = mobilenetv2_quantized(BASE_FP8, quant_setup=setup, num_classes=5,
                                  settings=SMALL_MBV2)
    x = _rand_images(1, 32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = japply(model, variables, x, mode="fixed")
    assert y.shape == (1, 5)


def test_evaluate_metrics_sane():
    model = _small_resnet(BASE_FP8, num_classes=10)
    x = _rand_images(4, 32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    ys = np.random.RandomState(0).randint(0, 10, 4).astype(np.int32)
    metrics = evaluate(model, variables, [(x, jnp.asarray(ys))])
    assert 0.0 <= metrics["top_1_accuracy"] <= metrics["top_5_accuracy"] <= 1.0
    assert metrics["loss"] > 0 and metrics["num_examples"] == 4


def _fake_torch_resnet18_sd(rng):
    """Synthetic torchvision-style resnet18 state_dict (shapes only)."""
    sd = {}

    def conv(k, o, i, s):
        sd[k] = rng.normal(0, 0.1, (o, i, s, s)).astype(np.float32)

    def bn(p, c):
        sd[f"{p}.weight"] = np.abs(rng.normal(1, 0.1, c)).astype(np.float32)
        sd[f"{p}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{p}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{p}.running_var"] = np.abs(rng.normal(1, 0.1, c)).astype(np.float32)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_c = 64
    for stage in range(4):
        w = widths[stage]
        for b in range(2):
            t = f"layer{stage + 1}.{b}"
            conv(f"{t}.conv1.weight", w, in_c if b == 0 else w, 3)
            bn(f"{t}.bn1", w)
            conv(f"{t}.conv2.weight", w, w, 3)
            bn(f"{t}.bn2", w)
            if b == 0 and (stage > 0):
                conv(f"{t}.downsample.0.weight", w, in_c, 1)
                bn(f"{t}.downsample.1", w)
        in_c = w
    sd["fc.weight"] = rng.normal(0, 0.1, (1000, 512)).astype(np.float32)
    sd["fc.bias"] = rng.normal(0, 0.1, 1000).astype(np.float32)
    return sd


def test_resnet18_torch_conversion_round_trip():
    from fp8_quantization_tpu.models.convert import convert_resnet, merge_variables

    sd = _fake_torch_resnet18_sd(np.random.RandomState(0))
    params, stats = convert_resnet(sd, (2, 2, 2, 2), bottleneck=False)

    model = resnet18_quantized(BASE_FP8, num_classes=1000)
    x = _rand_images(1, 32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    merged = merge_variables(variables, params, stats)

    # loaded weights actually flow: stem kernel matches the transposed source
    np.testing.assert_allclose(
        np.asarray(merged["params"]["stem"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    y = japply(model, merged, x, mode="fixed", quant_w=False, quant_a=False)
    assert y.shape == (1, 1000) and np.all(np.isfinite(np.asarray(y)))


def _fake_torch_mobilenet_sd(rng):
    from fp8_quantization_tpu.models.mobilenet_v2 import INVERTED_RESIDUAL_SETTING

    sd = {}

    def conv(k, o, i, s):
        sd[k] = rng.normal(0, 0.1, (o, i, s, s)).astype(np.float32)

    def bn(p, c):
        sd[f"{p}.weight"] = np.abs(rng.normal(1, 0.1, c)).astype(np.float32)
        sd[f"{p}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{p}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{p}.running_var"] = np.abs(rng.normal(1, 0.1, c)).astype(np.float32)

    conv("features.0.0.weight", 32, 3, 3)
    bn("features.0.1", 32)
    in_c, fi = 32, 1
    for (t, c, n, s) in INVERTED_RESIDUAL_SETTING:
        for b in range(n):
            p = f"features.{fi}.conv"
            hidden = round(in_c * t)
            if t == 1:
                conv(f"{p}.0.weight", hidden, 1, 3)
                bn(f"{p}.1", hidden)
                conv(f"{p}.3.weight", c, hidden, 1)
                bn(f"{p}.4", c)
            else:
                conv(f"{p}.0.weight", hidden, in_c, 1)
                bn(f"{p}.1", hidden)
                conv(f"{p}.3.weight", hidden, 1, 3)
                bn(f"{p}.4", hidden)
                conv(f"{p}.6.weight", c, hidden, 1)
                bn(f"{p}.7", c)
            in_c = c
            fi += 1
    conv(f"features.{fi}.0.weight", 1280, in_c, 1)
    bn(f"features.{fi}.1", 1280)
    sd["classifier.1.weight"] = rng.normal(0, 0.1, (1000, 1280)).astype(np.float32)
    sd["classifier.1.bias"] = rng.normal(0, 0.1, 1000).astype(np.float32)
    return sd


def test_mobilenet_torch_conversion_round_trip():
    from fp8_quantization_tpu.models.convert import (
        convert_mobilenet_v2, merge_variables)

    sd = _fake_torch_mobilenet_sd(np.random.RandomState(1))
    params, stats = convert_mobilenet_v2(sd)
    model = mobilenetv2_quantized(BASE_FP8, num_classes=1000)
    x = _rand_images(1, 32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    merged = merge_variables(variables, params, stats)
    y = japply(model, merged, x, mode="fixed", quant_w=False, quant_a=False)
    assert y.shape == (1, 1000) and np.all(np.isfinite(np.asarray(y)))


def test_mse_weight_range_method_on_model():
    """MSE weight-range calibration wires through the model (config #3 path)."""
    base = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
        weight_range_method="MSE", act_range_method="allminmax",
        fp8_mse_include_mantissa_bits=True)
    model = _small_resnet(base, num_classes=5)
    x = _rand_images(1, 32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    stem_q = variables["quant"]["stem"]["weight_q"]["q"]
    assert bool(stem_q["initialized"])
    mb = float(stem_q["mantissa_bits"])
    assert 1.0 <= mb <= 6.0


def test_mobilenet_dw_bf16_acts_preset_accuracy_dominates_all():
    """The dw_bf16_acts deployment preset (round 5 bench row: expand/dw
    ACTIVATION quantizers off, weights W8 everywhere) quantizes a strict
    subset of the 'all' preset's tensors, so its deployed logits must sit
    at least as close to fp32 as the all-quantized config's (up to noise:
    different quantizer sets shift intermediate rounding)."""
    from fp8_quantization_tpu.calibration.calibrate import calibrate

    x = _rand_images(2, 32)
    logits = {}
    base_vars = None
    for setup in (None, "dw_bf16_acts"):
        model = mobilenetv2_quantized(BASE_FP8, quant_setup=setup,
                                      num_classes=5, settings=SMALL_MBV2)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        if base_vars is None:
            base_vars = variables
        else:   # same params: the presets differ only in quantizer wiring
            variables = {**variables, "params": base_vars["params"],
                         "batch_stats": base_vars["batch_stats"]}
        variables = calibrate(model, variables, [x])
        name = setup or "all"
        logits[name] = np.asarray(
            japply(model, variables, x, mode="fixed"), np.float32)
        logits[f"{name}_fp32"] = np.asarray(
            japply(model, variables, x, mode="fixed", quant_w=False,
                   quant_a=False), np.float32)

    np.testing.assert_array_equal(logits["all_fp32"],
                                  logits["dw_bf16_acts_fp32"])
    err_all = np.abs(logits["all"] - logits["all_fp32"]).max()
    err_preset = np.abs(logits["dw_bf16_acts"]
                        - logits["dw_bf16_acts_fp32"]).max()
    assert err_preset <= err_all * 1.5 + 1e-5, (err_preset, err_all)
