"""Fused stem kernel (conv7x7/2 + BN + relu + maxpool3x3/2 + out-quant,
ops/pallas/qstem.py) vs the composed deployment chain it replaces
(interpret mode on CPU; same kernel compiles for TPU via Mosaic)."""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8
from fp8_quantization_tpu.ops.pallas.qstem import (
    FusedStemConfig, fused_quant_stem)

N, S, CIN, COUT = 2, 64, 3, 16


def _data(seed=0, n=N, s=S, cout=COUT):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.normal(0, 1, (n, s, s, CIN)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (7, 7, CIN, cout)), jnp.float32)
    w = w.astype(jnp.bfloat16).astype(jnp.float32)     # baked-grid stand-in
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (cout,)), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)
    return x, w, scale, shift


def _composed(x, w, scale, shift, quant=None):
    """conv7x7s2 (bf16 operands, f32 acc) -> affine -> relu -> [quant] ->
    maxpool3x3s2 pad 1 — the model's stem + fmax_pool order (quant BEFORE
    pool, models/resnet.py)."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (2, 2),
        ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y * scale + shift, 0.0)
    if quant is not None:
        y = quant(y)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


@pytest.mark.parametrize("group,band_rows", [(1, 16), (2, 8)])
def test_stem_fp8_matches_composed_quant_then_pool(group, band_rows):
    """The kernel pools BEFORE quantizing; quantization is monotone so the
    result must be BIT-IDENTICAL to the model's quant-then-pool order."""
    x, w, scale, shift = _data()
    ascal = jnp.asarray([4.0, 4.0, 1.0], jnp.float32)
    ref = _composed(x, w, scale, shift,
                    quant=lambda y: quantize_to_fp8(y, jnp.asarray(4.0), 4.0))
    cfg = FusedStemConfig(act_method="fp8", imgs_per_block=group,
                          band_rows=band_rows)
    out = fused_quant_stem(x, w, ascal, scale, shift, cfg=cfg,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_stem_int_asym_matches_composed():
    from fp8_quantization_tpu.ops.pallas.qmatmul import _int_asym_quantize_tile

    x, w, scale, shift = _data(1)
    ascal = jnp.asarray([0.03, 128.0, 0.0], jnp.float32)
    ref = _composed(x, w, scale, shift,
                    quant=lambda y: _int_asym_quantize_tile(
                        y, ascal[0], ascal[1], 8))
    cfg = FusedStemConfig(act_method="int_asym")
    out = fused_quant_stem(x, w, ascal, scale, shift, cfg=cfg,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_stem_no_quant_matches_composed():
    x, w, scale, shift = _data(2)
    ref = _composed(x, w, scale, shift)
    cfg = FusedStemConfig(act_method="none")
    out = fused_quant_stem(x, w, jnp.zeros(3), scale, shift, cfg=cfg,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stem_emit_norm_factored():
    """emit_norm output times the quantizer factor == the value output."""
    x, w, scale, shift = _data(3)
    ascal = jnp.asarray([4.0, 4.0, 1.0], jnp.float32)
    val = fused_quant_stem(x, w, ascal, scale, shift,
                           cfg=FusedStemConfig(act_method="fp8"),
                           interpret=True)
    norm = fused_quant_stem(x, w, ascal, scale, shift,
                            cfg=FusedStemConfig(act_method="fp8",
                                                emit_norm=True),
                            interpret=True)
    assert norm.dtype == jnp.bfloat16
    factor = 4.0 / (2.0 - 2.0 ** -4.0)
    np.testing.assert_allclose(np.asarray(norm, np.float32) * factor,
                               np.asarray(val), rtol=1e-6, atol=1e-7)


def test_stem_channel_pad_variants_identical():
    """k_pad only changes the in-kernel im2col tile width; zero-padded
    channels contribute exactly 0 to the dot."""
    x, w, scale, shift = _data(4)
    ascal = jnp.asarray([4.0, 4.0, 1.0], jnp.float32)
    outs = [fused_quant_stem(x, w, ascal, scale, shift,
                             cfg=FusedStemConfig(act_method="fp8", k_pad=kp),
                             interpret=True) for kp in (4, 8)]
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))


def test_resnet_fused_stem_matches_layer_path():
    """End-to-end through QuantizedResNet: with engine='pallas' (stem gate
    always-on under CPU) the deployed forward routes the stem through the
    fused kernel and the logits match the composed bf16-engine forward."""
    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.models.resnet import QuantizedResNet
    from fp8_quantization_tpu.nn.bake import prepare_for_deployment
    from fp8_quantization_tpu.nn.config import make_layer_config

    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True,
        fp8_mantissa_bits=4, fp8_set_maxval=True,
        weight_range_method="current_minmax",
        act_range_method="allminmax", engine="bf16")
    model = QuantizedResNet(stage_sizes=(1,), bottleneck=False,
                            num_classes=10, config=cfg)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    dvars = prepare_for_deployment(model, variables, x)

    ref = jax.jit(lambda v, xx: model.apply(
        v, xx, mode="fixed", quant_w=False))(dvars, x)

    model_k = QuantizedResNet(stage_sizes=(1,), bottleneck=False,
                              num_classes=10,
                              config=dataclasses.replace(cfg,
                                                         engine="pallas"))
    out = jax.jit(lambda v, xx: model_k.apply(
        v, xx, mode="fixed", quant_w=False))(dvars, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    exact = np.isclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                       atol=1e-6)
    assert exact.mean() > 0.95, exact.mean()
