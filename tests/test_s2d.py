"""Space-to-depth stem transform: exactness vs the direct 7x7/s2 conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.ops.s2d import s2d_stem_kernel, space_to_depth


def _conv(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


@pytest.mark.parametrize("hw", [32, 56])
def test_s2d_stem_exact_fp32(hw):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 1, (2, hw, hw, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 16)), jnp.float32)

    ref = _conv(x, w, (2, 2), ((3, 3), (3, 3)))
    w2, strides, padding = s2d_stem_kernel(w)
    got = _conv(space_to_depth(x), w2, strides, padding)

    assert got.shape == ref.shape == (2, hw // 2, hw // 2, 16)
    # pure re-indexing: every MAC is identical, only the summation order
    # inside each output element can differ (the 45 injected taps are
    # exact zeros) -> fp32-accumulation tolerance, not exact-bit equality
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_stem_exact_bf16_operands():
    """The deployed path feeds bf16 operands to the MXU; the transform must
    stay exact there too (zero taps are exact in bf16)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 8)), jnp.float32)
    xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)

    ref = _conv(xb, wb, (2, 2), ((3, 3), (3, 3)))
    w2, strides, padding = s2d_stem_kernel(wb)
    got = _conv(space_to_depth(xb), w2, strides, padding)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=1e-3)


def test_s2d_channel_order_matches_kernel():
    """One-hot probe: s2d channel (di, dj, c) ordering agrees between the
    input transform and the kernel rearrangement (a mismatch would still
    pass random-data allclose only with vanishing probability, but pin the
    layout explicitly)."""
    x = jnp.zeros((1, 8, 8, 3), jnp.float32).at[0, 3, 5, 2].set(1.0)
    xs = space_to_depth(x)
    # pixel (3, 5) -> s2d position (1, 2), parity (di, dj) = (1, 1), c=2
    # -> channel (1*2 + 1)*3 + 2 = 11
    nz = np.nonzero(np.asarray(xs))
    assert [int(v[0]) for v in nz] == [0, 1, 2, 11]


def test_s2d_after_fake_quant_equals_before():
    """Quantize-then-rearrange == rearrange semantics: the transform
    commutes with per-channel weight fake-quant (channel = F, untouched)."""
    from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8

    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 8)), jnp.float32)
    maxval = jnp.max(jnp.abs(w.reshape(-1, 8)), axis=0).reshape(1, 1, 1, 8)
    wq = quantize_to_fp8(w, maxval, 4.0)

    w2q, _, _ = s2d_stem_kernel(wq)
    # rearranging first, then quantizing, would also have to quantize the
    # injected zeros — which stay exactly zero under fp8 -> identical
    wq2 = quantize_to_fp8(s2d_stem_kernel(w)[0],
                          maxval.reshape(1, 1, 1, 8), 4.0)
    np.testing.assert_array_equal(np.asarray(w2q), np.asarray(wq2))


def test_model_stem_s2d_matches_logits():
    """Model level: same variables, stem_s2d on/off -> same logits (to
    fp32 summation-order tolerance) in calibrated fixed mode."""
    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.models.resnet import (
        QuantizedResNet, resnet_configs)
    from fp8_quantization_tpu.nn.config import make_layer_config
    from tests._tiny import japply

    base = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True,
        fp8_mantissa_bits=4, fp8_set_maxval=True,
        weight_range_method="current_minmax", act_range_method="allminmax")
    kw = dict(stage_sizes=(1, 1, 1, 1), bottleneck=False, num_classes=5,
              **resnet_configs(base, None))
    m_ref = QuantizedResNet(**kw)
    m_s2d = QuantizedResNet(stem_s2d=True, **kw)

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    variables = jax.jit(m_ref.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(m_ref, variables, [x])

    y_ref = japply(m_ref, variables, x, mode="fixed")
    y_s2d = japply(m_s2d, variables, x, mode="fixed")
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               rtol=1e-3, atol=1e-3)


def test_model_stem_s2d_deployed_config():
    """The deployed bench config (bf16 engine + cast quant + bf16 stores +
    prepare_for_deployment) runs with stem_s2d and tracks the reference
    path closely."""
    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.models.resnet import (
        QuantizedResNet, resnet_configs)
    from fp8_quantization_tpu.nn.bake import prepare_for_deployment
    from fp8_quantization_tpu.nn.config import make_layer_config
    from tests._tiny import japply

    base = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True,
        fp8_mantissa_bits=4, fp8_set_maxval=True,
        weight_range_method="current_minmax", act_range_method="allminmax",
        engine="bf16", deploy_cast_quant=True, conv_out_bf16=True)
    kw = dict(stage_sizes=(1, 1, 1, 1), bottleneck=False, num_classes=5,
              **resnet_configs(base, None))
    m_ref = QuantizedResNet(**kw)
    m_s2d = QuantizedResNet(stem_s2d=True, **kw)

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    variables = jax.jit(m_ref.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(m_ref, variables, [x])
    dvars = prepare_for_deployment(m_ref, variables, x[:1])

    y_ref = japply(m_ref, dvars, x, mode="fixed", quant_w=False)
    y_s2d = japply(m_s2d, dvars, x, mode="fixed", quant_w=False)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-2)


def test_model_stem_s2d_input_mode():
    """stem_s2d='input': the model consumes pre-transformed (H/2,W/2,4C)
    serving input with the ORIGINAL checkpoint/quant state, matching the
    standard model's logits."""
    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.models.resnet import (
        QuantizedResNet, resnet_configs)
    from fp8_quantization_tpu.nn.config import make_layer_config
    from fp8_quantization_tpu.ops.s2d import space_to_depth
    from tests._tiny import japply

    base = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True,
        fp8_mantissa_bits=4, fp8_set_maxval=True,
        weight_range_method="current_minmax", act_range_method="allminmax",
        engine="bf16", deploy_cast_quant=True, conv_out_bf16=True)
    kw = dict(stage_sizes=(1, 1, 1, 1), bottleneck=False, num_classes=5,
              **resnet_configs(base, None))
    m_ref = QuantizedResNet(**kw)
    m_s2d = QuantizedResNet(stem_s2d="input", **kw)

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    variables = jax.jit(m_ref.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(m_ref, variables, [x])

    y_ref = japply(m_ref, variables, x, mode="fixed")
    y_s2d = japply(m_s2d, variables, space_to_depth(x), mode="fixed")
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-2)
