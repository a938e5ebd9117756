"""Fused 3x3 conv kernel vs composed-XLA reference semantics (interpret
mode on CPU; same kernel compiles for TPU via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.ops import quantizer as q
from fp8_quantization_tpu.ops.pallas.qconv import (
    FusedConvConfig, fused_quant_conv3x3)
from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec

N, H, W, CIN, COUT = 2, 8, 8, 16, 8


def _data(seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.normal(0, 1, (N, H, W, CIN)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, CIN, COUT)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (COUT,)), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.1, (COUT,)), jnp.float32)
    return x, w, scale, shift


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _fp8_out_state(y, mbits=4):
    spec = QuantizerSpec(method=QMethod.fp_quantizer, mantissa_bits=mbits,
                         set_maxval=True)
    state = q.set_quant_range(spec, q.init_state(spec), jnp.min(y), jnp.max(y))
    return spec, state


@pytest.mark.parametrize("im2col", [True, False], ids=["im2col", "taps"])
def test_conv3x3_epilogue_and_fp8_out_quant(im2col):
    x, w, scale, shift = _data()
    yf = _xla_conv(x.astype(jnp.bfloat16).astype(jnp.float32),
                   w.astype(jnp.bfloat16).astype(jnp.float32))
    y = jnp.maximum(yf * scale + shift, 0.0)
    spec, state = _fp8_out_state(y)
    ref = q.apply(spec, state, y)

    cfg = FusedConvConfig(act_method="fp8", activation="relu", im2col=im2col)
    out = fused_quant_conv3x3(
        x, w,
        jnp.asarray([state["maxval"], state["mantissa_bits"],
                     state["sign_bits"]]),
        scale, shift, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # values land on the same fp8 grid: exact except bin-boundary flips
    exact = np.isclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7)
    assert exact.mean() > 0.98, exact.mean()


def test_conv3x3_residual_and_emit_norm():
    """ResNet basic-block tail: conv + BN(scale/shift) + residual + relu +
    block act quantizer emitting the normalized factored value."""
    x, w, scale, shift = _data(1)
    rng = np.random.RandomState(2)
    res = jnp.asarray(rng.normal(0, 1, (N, H, W, COUT)), jnp.float32)

    yf = _xla_conv(x.astype(jnp.bfloat16).astype(jnp.float32),
                   w.astype(jnp.bfloat16).astype(jnp.float32))
    y = jnp.maximum(yf * scale + shift
                    + res.astype(jnp.bfloat16).astype(jnp.float32), 0.0)
    spec, state = _fp8_out_state(y)
    ref_norm, ref_factor = q.apply_factored(spec, state, y)

    cfg = FusedConvConfig(act_method="fp8", activation="relu", residual=True,
                          emit_norm=True)
    out = fused_quant_conv3x3(
        x, w,
        jnp.asarray([state["maxval"], state["mantissa_bits"],
                     state["sign_bits"]]),
        scale, shift, residual=res, cfg=cfg, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref_norm, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_conv3x3_imgs_per_block_grouping():
    x, w, scale, shift = _data(3)
    cfg1 = FusedConvConfig(act_method="none", imgs_per_block=1)
    cfg2 = FusedConvConfig(act_method="none", imgs_per_block=2)
    out1 = fused_quant_conv3x3(x, w, jnp.zeros(3), scale, shift, cfg=cfg1,
                               interpret=True)
    out2 = fused_quant_conv3x3(x, w, jnp.zeros(3), scale, shift, cfg=cfg2,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_quantconv_3x3_deployment_path_matches_bf16_engine():
    """End-to-end through QuantConv: baked deployment forward with
    engine='pallas' routes 3x3 stride-1 convs through the fused kernel
    (autotune conv3_group is always-on under CPU) and matches the bf16
    engine's composed path."""
    import dataclasses

    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.nn.bake import prepare_for_deployment
    from fp8_quantization_tpu.nn.config import make_layer_config
    from fp8_quantization_tpu.nn.factored import materialize
    from fp8_quantization_tpu.nn.layers import QuantConv

    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_mantissa_bits=4,
        fp8_set_maxval=True, weight_range_method="current_minmax",
        act_range_method="allminmax", engine="bf16")
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 16)), jnp.float32)

    conv = QuantConv(features=8, kernel_size=(3, 3), strides=(1, 1),
                     padding=((1, 1), (1, 1)), bn=True, activation="relu",
                     config=cfg)
    variables = conv.init(jax.random.PRNGKey(0), x)
    variables = calibrate(conv, variables, [x])
    dvars = prepare_for_deployment(conv, variables, x)

    ref = jax.jit(lambda v, xx: materialize(conv.apply(
        v, xx, mode="fixed", quant_w=False, out="factored")))(dvars, x)

    conv_k = QuantConv(features=8, kernel_size=(3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), bn=True, activation="relu",
                       config=dataclasses.replace(cfg, engine="pallas"))
    out = jax.jit(lambda v, xx: materialize(conv_k.apply(
        v, xx, mode="fixed", quant_w=False, out="factored")))(dvars, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    exact = np.isclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7)
    assert exact.mean() > 0.98, exact.mean()


@pytest.mark.parametrize("signed_w", [True, False])
def test_conv3x3_int8_native_datapath(signed_w):
    """mxu_dtype='int8' conv: in-kernel int_asym input quant + int_sym
    weight quant on the s8 MXU datapath, exact integer accumulation with
    the recenter corrections (padding holds zp-128 => padded taps are
    exactly zero)."""
    x, w, scale, shift = _data(7)
    if not signed_w:
        w = jnp.abs(w)
    wspec = QuantizerSpec(method=QMethod.symmetric_uniform, per_channel=True)
    wstate = q.init_state(wspec, COUT)
    wmax = (jnp.max(jnp.abs(w), axis=(0, 1, 2)) if signed_w
            else jnp.max(w, axis=(0, 1, 2)))
    wstate = q.set_quant_range(
        wspec, wstate, -wmax if signed_w else jnp.zeros_like(wmax), wmax)
    assert int(wstate["signed"]) == (1 if signed_w else 0)
    wq = q.apply(wspec, wstate, w, channel_axis=-1)

    aspec = QuantizerSpec(method=QMethod.asymmetric_uniform)
    astate = q.set_quant_range(aspec, q.init_state(aspec),
                               jnp.min(x), jnp.max(x))
    xq = q.apply(aspec, astate, x)

    ref = jnp.maximum(_xla_conv(xq, wq) * scale + shift, 0.0)

    cfg = FusedConvConfig(act_method="int_asym", activation="relu",
                          mxu_dtype="int8", imgs_per_block=2)
    out = fused_quant_conv3x3(
        x, w,
        jnp.asarray([astate["delta"], astate["zero_float"], 0.0]),
        scale, shift,
        weight_channel_param=wstate["delta"],
        weight_scalars=jnp.asarray([0.0, wstate["signed"]], jnp.float32),
        cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_quantconv_3x3_int8_mxu_matches_parity():
    """End-to-end: QuantConv with int8_mxu + input-quant INT config routes
    3x3 stride-1 convs through the native-int8 kernel and matches the
    parity engine (exact integer accumulation)."""
    import dataclasses

    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.nn.config import make_layer_config
    from fp8_quantization_tpu.nn.layers import QuantConv
    import fp8_quantization_tpu.ops.pallas.qconv as qc

    cfg = make_layer_config(
        qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
        per_channel_weights=True, quantize_input=True,
        weight_range_method="current_minmax", act_range_method="allminmax",
        engine="parity")
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 16)), jnp.float32)

    conv_p = QuantConv(features=8, kernel_size=(3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), bn=True, activation="relu",
                       config=cfg)
    variables = conv_p.init(jax.random.PRNGKey(0), x)
    variables = calibrate(conv_p, variables, [x])
    ref = jax.jit(lambda v, xx: conv_p.apply(v, xx, mode="fixed"))(
        variables, x)

    calls = []
    orig = qc.fused_quant_conv3x3

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    conv_i = QuantConv(features=8, kernel_size=(3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), bn=True, activation="relu",
                       config=dataclasses.replace(cfg, engine="pallas",
                                                  int8_mxu=True))
    qc.fused_quant_conv3x3 = spy
    try:
        out = conv_i.apply(variables, x, mode="fixed")
    finally:
        qc.fused_quant_conv3x3 = orig
    assert calls, "int8 conv path did not fire"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_quantconv_3x3_baked_int8_matches_in_kernel():
    """bake_int8_weights: the conv consumes stored int8 weights
    (w_prequant) and matches the in-kernel-quant path bit-exactly."""
    import dataclasses

    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.nn.bake import bake_int8_weights
    from fp8_quantization_tpu.nn.config import make_layer_config
    from fp8_quantization_tpu.nn.layers import QuantConv

    cfg = make_layer_config(
        qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
        per_channel_weights=True, quantize_input=True,
        weight_range_method="current_minmax", act_range_method="allminmax",
        engine="pallas")
    cfg = dataclasses.replace(cfg, int8_mxu=True)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 16)), jnp.float32)

    conv = QuantConv(features=8, kernel_size=(3, 3), strides=(1, 1),
                     padding=((1, 1), (1, 1)), bn=True, activation="relu",
                     config=cfg)
    variables = conv.init(jax.random.PRNGKey(0), x)
    variables = calibrate(conv, variables, [x])
    ref = conv.apply(variables, x, mode="fixed")       # in-kernel weight q

    baked = bake_int8_weights(conv, variables, x)
    bi = baked["baked_int8"]
    leaves = jax.tree.leaves(bi)
    assert any(a.dtype == jnp.int8 for a in leaves), bi
    out = conv.apply(baked, x, mode="fixed")           # prequant path
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_quantlinear_baked_int8_matches_in_kernel():
    """Same for the matmul kernel (QuantLinear on the int8 MXU path)."""
    import dataclasses

    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.nn.bake import bake_int8_weights
    from fp8_quantization_tpu.nn.config import make_layer_config
    from fp8_quantization_tpu.nn.layers import QuantLinear

    cfg = make_layer_config(
        qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
        per_channel_weights=True, quantize_input=True,
        weight_range_method="current_minmax", act_range_method="allminmax",
        engine="pallas")
    cfg = dataclasses.replace(cfg, int8_mxu=True)
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.normal(0, 1, (16, 32)), jnp.float32)

    lin = QuantLinear(features=24, use_bias=True, config=cfg)
    variables = lin.init(jax.random.PRNGKey(0), x)
    variables = calibrate(lin, variables, [x])
    ref = lin.apply(variables, x, mode="fixed")

    baked = bake_int8_weights(lin, variables, x)
    assert "baked_int8" in baked, baked.keys()
    out = lin.apply(baked, x, mode="fixed")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("im2col", [True, False], ids=["im2col", "taps"])
def test_conv3x3_stride2_phase_decomposition(im2col):
    """stride=2 (ResNet downsample conv1): even/odd phase decomposition
    must equal the XLA stride-2 SAME conv, epilogue and out-quant included."""
    x, w, scale, shift = _data(21)
    yf = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16).astype(jnp.float32),
        w.astype(jnp.bfloat16).astype(jnp.float32), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(yf * scale + shift, 0.0)
    spec, state = _fp8_out_state(y)
    ref = q.apply(spec, state, y)

    cfg = FusedConvConfig(act_method="fp8", activation="relu", stride=2,
                          im2col=im2col, imgs_per_block=2)
    out = fused_quant_conv3x3(
        x, w,
        jnp.asarray([state["maxval"], state["mantissa_bits"],
                     state["sign_bits"]]),
        scale, shift, cfg=cfg, interpret=True)
    assert out.shape == (N, H // 2, W // 2, COUT)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    exact = np.isclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7)
    assert exact.mean() > 0.98, exact.mean()


def test_conv3x3_stride2_int8_native_datapath():
    """stride=2 on the native-int8 path: phase decomposition with zp-128
    padding keeps the recenter identity exact."""
    x, w, scale, shift = _data(23)
    wspec = QuantizerSpec(method=QMethod.symmetric_uniform, per_channel=True)
    wstate = q.init_state(wspec, COUT)
    wmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    wstate = q.set_quant_range(wspec, wstate, -wmax, wmax)
    wq = q.apply(wspec, wstate, w, channel_axis=-1)

    aspec = QuantizerSpec(method=QMethod.asymmetric_uniform)
    astate = q.set_quant_range(aspec, q.init_state(aspec),
                               jnp.min(x), jnp.max(x))
    xq = q.apply(aspec, astate, x)

    ref = jnp.maximum(jax.lax.conv_general_dilated(
        xq, wq, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) * scale + shift, 0.0)

    cfg = FusedConvConfig(act_method="int_asym", activation="relu",
                          mxu_dtype="int8", imgs_per_block=2, stride=2)
    out = fused_quant_conv3x3(
        x, w,
        jnp.asarray([astate["delta"], astate["zero_float"], 0.0]),
        scale, shift,
        weight_channel_param=wstate["delta"],
        weight_scalars=jnp.asarray([0.0, wstate["signed"]], jnp.float32),
        cfg=cfg, interpret=True)
    assert out.shape == (N, H // 2, W // 2, COUT)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_quantconv_stride2_routes_through_fused_kernel():
    """End-to-end: a baked 3x3 stride-2 QuantConv under engine='pallas'
    fires the fused kernel (spied) and matches the bf16 engine's composed
    stride-2 path."""
    import dataclasses

    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.nn.bake import prepare_for_deployment
    from fp8_quantization_tpu.nn.config import make_layer_config
    from fp8_quantization_tpu.nn.factored import materialize
    from fp8_quantization_tpu.nn.layers import QuantConv
    import fp8_quantization_tpu.ops.pallas.qconv as qc

    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_mantissa_bits=4,
        fp8_set_maxval=True, weight_range_method="current_minmax",
        act_range_method="allminmax", engine="bf16")
    rng = np.random.RandomState(31)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 16)), jnp.float32)

    conv = QuantConv(features=8, kernel_size=(3, 3), strides=(2, 2),
                     padding=((1, 1), (1, 1)), bn=True, activation="relu",
                     config=cfg)
    variables = conv.init(jax.random.PRNGKey(0), x)
    variables = calibrate(conv, variables, [x])
    dvars = prepare_for_deployment(conv, variables, x)
    ref = jax.jit(lambda v, xx: materialize(conv.apply(
        v, xx, mode="fixed", quant_w=False, out="factored")))(dvars, x)

    calls = []
    orig = qc.fused_quant_conv3x3

    def spy(*a, **k):
        calls.append(k["cfg"].stride)
        return orig(*a, **k)

    conv_k = QuantConv(features=8, kernel_size=(3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), bn=True, activation="relu",
                       config=dataclasses.replace(cfg, engine="pallas"))
    qc.fused_quant_conv3x3 = spy
    try:
        out = materialize(conv_k.apply(dvars, x, mode="fixed", quant_w=False,
                                       out="factored"))
    finally:
        qc.fused_quant_conv3x3 = orig
    assert calls == [2], calls
    assert out.shape == (2, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    exact = np.isclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7)
    assert exact.mean() > 0.98, exact.mean()


def test_quantconv_1x1_stride2_phase_slice():
    """1x1 stride-2 (ResNet downsample shortcut): the pallas engine slices
    the even/even phase and runs the fused matmul; matches the bf16
    engine's XLA stride-2 conv."""
    import dataclasses

    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.nn.config import make_layer_config
    from fp8_quantization_tpu.nn.layers import QuantConv

    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_mantissa_bits=4,
        fp8_set_maxval=True, weight_range_method="current_minmax",
        act_range_method="allminmax", engine="bf16")
    rng = np.random.RandomState(37)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 16)), jnp.float32)

    conv = QuantConv(features=8, kernel_size=(1, 1), strides=(2, 2),
                     padding="VALID", bn=True, config=cfg)
    variables = conv.init(jax.random.PRNGKey(0), x)
    variables = calibrate(conv, variables, [x])
    ref = jax.jit(lambda v, xx: conv.apply(v, xx, mode="fixed"))(variables, x)

    conv_k = QuantConv(features=8, kernel_size=(1, 1), strides=(2, 2),
                       padding="VALID", bn=True,
                       config=dataclasses.replace(cfg, engine="pallas"))
    out = jax.jit(lambda v, xx: conv_k.apply(v, xx, mode="fixed"))(
        variables, x)
    assert out.shape == (2, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("stride", [1, 2], ids=["s1", "s2"])
def test_dwconv3x3_fused_matches_xla(stride):
    """Depthwise 3x3 (MobileNetV2): 9-tap stencil + folded BN + relu6 +
    fp8 out-quant equals the composed XLA depthwise conv + quant chain."""
    C = 32
    rng = np.random.RandomState(41)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, C)), jnp.float32)
    # baked deployment weights are bf16-exact; round here so the composed
    # oracle multiplies the same values the kernel does
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, C)),
                    jnp.float32).astype(jnp.bfloat16).astype(jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)

    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16).astype(jnp.float32),
        w.reshape(3, 3, 1, C).astype(jnp.bfloat16).astype(jnp.float32),
        (stride, stride), ((1, 1), (1, 1)), feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.clip(y * scale + shift, 0.0, 6.0)
    spec, state = _fp8_out_state(y)
    ref = q.apply(spec, state, y)

    from fp8_quantization_tpu.ops.pallas.qconv import fused_quant_dwconv3x3
    cfg = FusedConvConfig(act_method="fp8", activation="relu6",
                          stride=stride, imgs_per_block=2)
    out = fused_quant_dwconv3x3(
        x, w,
        jnp.asarray([state["maxval"], state["mantissa_bits"],
                     state["sign_bits"]]),
        scale, shift, cfg=cfg, interpret=True)
    assert out.shape == (2, 8 // stride, 8 // stride, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    exact = np.isclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7)
    assert exact.mean() > 0.98, exact.mean()


@pytest.mark.parametrize("stride", [1, 2], ids=["s1", "s2"])
def test_quantconv_depthwise_routes_through_fused_kernel(stride):
    """End-to-end: a baked depthwise QuantConv under engine='pallas' fires
    the fused dw kernel (spied) and matches the bf16 engine's composed
    path, factored output included."""
    import dataclasses

    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.nn.bake import prepare_for_deployment
    from fp8_quantization_tpu.nn.config import make_layer_config
    from fp8_quantization_tpu.nn.factored import materialize
    from fp8_quantization_tpu.nn.layers import QuantConv
    import fp8_quantization_tpu.ops.pallas.qconv as qc

    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_mantissa_bits=4,
        fp8_set_maxval=True, weight_range_method="current_minmax",
        act_range_method="allminmax", engine="bf16")
    C = 32
    rng = np.random.RandomState(43)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, C)), jnp.float32)

    kw = dict(features=C, kernel_size=(3, 3), strides=(stride, stride),
              padding=((1, 1), (1, 1)), feature_group_count=C, bn=True,
              activation="relu6")
    conv = QuantConv(config=cfg, **kw)
    variables = conv.init(jax.random.PRNGKey(0), x)
    variables = calibrate(conv, variables, [x])
    dvars = prepare_for_deployment(conv, variables, x)
    ref = jax.jit(lambda v, xx: materialize(conv.apply(
        v, xx, mode="fixed", quant_w=False, out="factored")))(dvars, x)

    calls = []
    orig = qc.fused_quant_dwconv3x3

    def spy(*a, **k):
        calls.append(k["cfg"].stride)
        return orig(*a, **k)

    conv_k = QuantConv(config=dataclasses.replace(cfg, engine="pallas"), **kw)
    qc.fused_quant_dwconv3x3 = spy
    try:
        out = materialize(conv_k.apply(dvars, x, mode="fixed", quant_w=False,
                                       out="factored"))
    finally:
        qc.fused_quant_dwconv3x3 = orig
    assert calls == [stride], calls
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    exact = np.isclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7)
    assert exact.mean() > 0.98, exact.mean()
