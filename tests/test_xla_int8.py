"""ops/int8.py: XLA-native s8 conv/matmul == the fake-quant reference chain.

The integer path must reproduce conv(fake_quant_act(x), fake_quant_w(w))
exactly up to f32 dequant rounding — the s32 accumulation itself is exact.
Covers both weight-grid signednesses (the unsigned branch exercises the
rowsum + colsum + constant corrections), strides, paddings, sub-8-bit
grids, the depthwise grouped case, and the matmul twin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.ops.int8 import int8_conv, int8_matmul
from fp8_quantization_tpu.ops.pallas.qmatmul import (_int_asym_quantize_tile,
                                                     int8_shifted_grid)


def _ref_weight_fq(w, delta, signed, n_bits):
    """Symmetric-uniform weight fake-quant on the calibrated grid."""
    wsg = int8_shifted_grid(w, delta, signed, n_bits)   # wint - S_w (f32)
    s_w = 128.0 * (1.0 - signed)
    return (wsg + s_w) * jnp.maximum(delta, 1e-8)


def _setup(seed, kh, kw, cin, cout, signed, w_bits, positive_w=False):
    rng = np.random.RandomState(seed)
    w = rng.normal(0, 0.04, (kh, kw, cin, cout)).astype(np.float32)
    if positive_w:
        w = np.abs(w)
    w = jnp.asarray(w)
    if signed:
        delta = jnp.max(jnp.abs(w.reshape(-1, cout)), axis=0) \
            / (2.0 ** (w_bits - 1) - 1)
    else:
        delta = jnp.max(w.reshape(-1, cout), axis=0) / (2.0 ** w_bits - 1)
    sg = jnp.asarray(1.0 if signed else 0.0, jnp.float32)
    wsg8 = int8_shifted_grid(w, delta, sg, w_bits).astype(jnp.int8)
    return w, delta, sg, wsg8


@pytest.mark.parametrize("signed", [True, False])
@pytest.mark.parametrize("strides,padding", [
    ((1, 1), ((1, 1), (1, 1))),
    ((2, 2), ((1, 1), (1, 1))),
    ((2, 2), "SAME"),
    ((1, 1), "VALID"),
])
def test_int8_conv_matches_fake_quant(signed, strides, padding):
    n, h, cin, cout, a_bits, w_bits = 2, 12, 16, 24, 8, 8
    w, delta, sg, wsg8 = _setup(0, 3, 3, cin, cout, signed, w_bits,
                                positive_w=not signed)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(0, 1, (n, h, h, cin)), jnp.float32)
    a_delta = jnp.asarray(6.0 / 255.0, jnp.float32)
    a_zero = jnp.asarray(100.0, jnp.float32)

    xq = _int_asym_quantize_tile(x, a_delta, a_zero, a_bits)
    wq = _ref_weight_fq(w, delta, sg, w_bits)
    ref = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = int8_conv(x, wsg8, delta, sg, a_delta, a_zero, a_bits,
                    strides=strides, padding=padding)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("a_bits,w_bits", [(4, 8), (8, 4), (4, 4)])
def test_int8_conv_sub8bit_grids(a_bits, w_bits):
    n, h, cin, cout = 2, 8, 8, 16
    w, delta, sg, wsg8 = _setup(2, 3, 3, cin, cout, True, w_bits)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(0, 1, (n, h, h, cin)), jnp.float32)
    a_delta = jnp.asarray(4.0 / (2.0 ** a_bits - 1), jnp.float32)
    a_zero = jnp.asarray(2.0 ** (a_bits - 1), jnp.float32)

    xq = _int_asym_quantize_tile(x, a_delta, a_zero, a_bits)
    wq = _ref_weight_fq(w, delta, sg, w_bits)
    ref = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = int8_conv(x, wsg8, delta, sg, a_delta, a_zero, a_bits)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_conv_epilogue_scale_shift_act():
    n, h, cin, cout = 2, 8, 8, 16
    w, delta, sg, wsg8 = _setup(4, 3, 3, cin, cout, True, 8)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.normal(0, 1, (n, h, h, cin)), jnp.float32)
    a_delta = jnp.asarray(6.0 / 255.0, jnp.float32)
    a_zero = jnp.asarray(128.0, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (cout,)), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.2, (cout,)), jnp.float32)

    xq = _int_asym_quantize_tile(x, a_delta, a_zero, 8)
    wq = _ref_weight_fq(w, delta, sg, 8)
    ref = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = jax.nn.relu(ref * scale + shift)

    got = int8_conv(x, wsg8, delta, sg, a_delta, a_zero, 8,
                    scale=scale, shift=shift, act_fn=jax.nn.relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("signed", [True, False])
def test_int8_conv_depthwise(signed):
    n, h, c = 2, 10, 16
    rng = np.random.RandomState(6)
    w = rng.normal(0, 0.3, (3, 3, 1, c)).astype(np.float32)
    if not signed:
        w = np.abs(w)
    w = jnp.asarray(w)
    if signed:
        delta = jnp.max(jnp.abs(w).reshape(-1, c), axis=0) / 127.0
    else:
        delta = jnp.max(w.reshape(-1, c), axis=0) / 255.0
    sg = jnp.asarray(1.0 if signed else 0.0, jnp.float32)
    wsg8 = int8_shifted_grid(w, delta, sg, 8).astype(jnp.int8)
    x = jnp.asarray(rng.normal(0, 1, (n, h, h, c)), jnp.float32)
    a_delta = jnp.asarray(6.0 / 255.0, jnp.float32)
    a_zero = jnp.asarray(90.0, jnp.float32)

    xq = _int_asym_quantize_tile(x, a_delta, a_zero, 8)
    wq = _ref_weight_fq(w, delta, sg, 8)
    ref = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)), feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = int8_conv(x, wsg8, delta, sg, a_delta, a_zero, 8,
                    feature_group_count=c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("signed", [True, False])
def test_int8_matmul_matches_fake_quant(signed):
    m, k, nout = 64, 48, 32
    rng = np.random.RandomState(7)
    w = rng.normal(0, 0.05, (k, nout)).astype(np.float32)
    if not signed:
        w = np.abs(w)
    w = jnp.asarray(w)
    delta = (jnp.max(jnp.abs(w), axis=0) / 127.0 if signed
             else jnp.max(w, axis=0) / 255.0)
    sg = jnp.asarray(1.0 if signed else 0.0, jnp.float32)
    wsg8 = int8_shifted_grid(w, delta, sg, 8).astype(jnp.int8)
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
    a_delta = jnp.asarray(5.0 / 255.0, jnp.float32)
    a_zero = jnp.asarray(110.0, jnp.float32)

    xq = _int_asym_quantize_tile(x, a_delta, a_zero, 8)
    wq = _ref_weight_fq(w, delta, sg, 8)
    ref = xq @ wq
    got = int8_matmul(x, wsg8, delta, sg, a_delta, a_zero, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_conv_jits():
    w, delta, sg, wsg8 = _setup(8, 3, 3, 8, 8, True, 8)
    x = jnp.ones((1, 6, 6, 8), jnp.float32)
    fn = jax.jit(lambda xx: int8_conv(
        xx, wsg8, delta, sg, jnp.asarray(0.05), jnp.asarray(128.0), 8))
    out = fn(x)
    assert out.shape == (1, 6, 6, 8) and jnp.isfinite(out).all()


def test_int8_matmul_out_bf16_close():
    """out_bf16 stores: value within bf16 rounding of the exact f32 path,
    dtype actually bfloat16 (the HBM win is the stored dtype)."""
    import numpy as np

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.normal(0, 1, (32, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (64, 16)), jnp.float32)
    w_delta = jnp.max(jnp.abs(w), axis=0) / 127.0
    wsg = int8_shifted_grid(w, w_delta, 1.0, 8).astype(jnp.int8)

    kw = dict(a_delta=jnp.asarray(0.05), a_zero=jnp.asarray(128.0),
              a_bits=8.0)
    y = int8_matmul(x, wsg, w_delta, jnp.asarray(1.0), **kw)
    yb = int8_matmul(x, wsg, w_delta, jnp.asarray(1.0), out_bf16=True, **kw)
    assert yb.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(yb, np.float32), np.asarray(y),
                               rtol=8e-3, atol=1e-4)


def test_int8_matmul_signed_static_matches_generic():
    """signed_static elides the s_w terms; for a signed grid the results
    must be bit-identical to the generic path."""
    import numpy as np

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.normal(0, 1, (32, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (64, 16)), jnp.float32)
    w_delta = jnp.max(jnp.abs(w), axis=0) / 127.0
    wsg = int8_shifted_grid(w, w_delta, 1.0, 8).astype(jnp.int8)
    kw = dict(a_delta=jnp.asarray(0.05), a_zero=jnp.asarray(117.0),
              a_bits=8.0)
    y = int8_matmul(x, wsg, w_delta, jnp.asarray(1.0), **kw)
    ys = int8_matmul(x, wsg, w_delta, jnp.asarray(1.0), signed_static=True,
                     **kw)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ys))


def test_int8_conv_signed_static_matches_generic():
    import numpy as np

    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 16, 8)), jnp.float32)
    w_delta = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    wsg = int8_shifted_grid(w, w_delta, 1.0, 8).astype(jnp.int8)
    kw = dict(a_delta=jnp.asarray(0.05), a_zero=jnp.asarray(117.0),
              a_bits=8.0)
    y = int8_conv(x, wsg, w_delta, jnp.asarray(1.0), **kw)
    ys = int8_conv(x, wsg, w_delta, jnp.asarray(1.0), signed_static=True,
                   **kw)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ys))


def test_bake_validates_assume_signed(tmp_path):
    """bake_int8_weights raises when int8_assume_signed meets an unsigned
    baked grid (all-positive weights -> unsigned symmetric range)."""
    import numpy as np

    from fp8_quantization_tpu.nn.bake import bake_int8_weights
    from fp8_quantization_tpu.nn.config import make_layer_config
    from fp8_quantization_tpu.nn.layers import QuantLinear
    from fp8_quantization_tpu.calibration.calibrate import calibrate

    cfg = make_layer_config(
        qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
        per_channel_weights=False, quantize_input=True,
        weight_range_method="current_minmax", act_range_method="allminmax",
        engine="bf16", int8_mxu=True, int8_assume_signed=True)
    model = QuantLinear(features=4, config=cfg)
    x = jnp.asarray(np.random.RandomState(1).normal(0, 1, (4, 8)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # force all-positive weights -> unsigned grid
    variables = jax.tree.map(lambda a: a, variables)
    variables = {**variables,
                 "params": {"kernel": jnp.abs(variables["params"]["kernel"]),
                            "bias": variables["params"]["bias"]}}
    variables = calibrate(model, variables, [x])
    with pytest.raises(ValueError, match="unsigned"):
        bake_int8_weights(model, variables, x)
