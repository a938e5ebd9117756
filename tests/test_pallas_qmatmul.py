"""Fused Pallas quant-matmul vs the composed-XLA reference semantics.

Runs in interpreter mode on CPU (SURVEY.md §4: per-layer fake-quant-vs-kernel
parity tests); the same kernel compiles for TPU via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.ops import quantizer as q
from fp8_quantization_tpu.ops.pallas import (
    FusedQuantMatmulConfig, fused_quant_matmul)
from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec

M, K, N = 24, 96, 48


def _data(seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.3, (K, N)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (N,)), jnp.float32)
    return x, w, b


def _fp8_weight_state(w, mbits=4):
    spec = QuantizerSpec(method=QMethod.fp_quantizer, per_channel=True,
                        mantissa_bits=mbits, set_maxval=True)
    state = q.init_state(spec, w.shape[-1])
    wmax = jnp.max(jnp.abs(w), axis=0)
    state = q.set_quant_range(spec, state, -wmax, wmax)
    return spec, state


def test_fp8_weight_quant_matmul_parity():
    x, w, b = _data()
    spec, state = _fp8_weight_state(w)
    wq = q.apply(spec, state, w, channel_axis=-1)
    ref = x @ wq + b

    cfg = FusedQuantMatmulConfig(weight_method="fp8", act_method="none",
                                 mxu_dtype="float32")
    out = fused_quant_matmul(
        x, w, state["maxval"],
        jnp.asarray([4.0, 1.0]), jnp.zeros(3),
        jnp.ones(N), b, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_mxu_path_is_exact_on_quantized_operands():
    """The bf16 MXU path feeds the MXU *normalized-grid* operands — an
    (M+1)-bit integer times a power of two, exact in bf16 — and folds the
    maxval/delta factors into the epilogue.  Result differs from the fp32
    reference only by fp32 accumulation order + one epilogue rounding."""
    x, w, b = _data(1)
    spec, state = _fp8_weight_state(w)
    wq = q.apply(spec, state, w, channel_axis=-1)

    # x is NOT on a quantized grid here, so quantize it too (input-quant mode)
    aspec = QuantizerSpec(method=QMethod.fp_quantizer, set_maxval=True)
    astate = q.init_state(aspec)
    amax = jnp.max(jnp.abs(x))
    astate = q.set_quant_range(aspec, astate, -amax, amax)
    xq = q.apply(aspec, astate, x)
    ref = xq @ wq + b

    cfg = FusedQuantMatmulConfig(weight_method="fp8", act_method="fp8",
                                 quantize_input=True, mxu_dtype="bfloat16")
    out = fused_quant_matmul(
        x, w, state["maxval"], jnp.asarray([4.0, 1.0]),
        jnp.asarray([astate["maxval"], astate["mantissa_bits"], 1.0]),
        jnp.ones(N), b, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_output_quant_and_relu_epilogue():
    x, w, b = _data(2)
    spec, state = _fp8_weight_state(w, mbits=3)
    wq = q.apply(spec, state, w, channel_axis=-1)

    y = jnp.maximum(x @ wq + b, 0.0)
    aspec = QuantizerSpec(method=QMethod.fp_quantizer, set_maxval=True)
    astate = q.set_quant_range(aspec, q.init_state(aspec),
                               jnp.min(y), jnp.max(y))
    ref = q.apply(aspec, astate, y)

    cfg = FusedQuantMatmulConfig(weight_method="fp8", act_method="fp8",
                                 activation="relu", mxu_dtype="float32")
    out = fused_quant_matmul(
        x, w, state["maxval"], jnp.asarray([3.0, 1.0]),
        jnp.asarray([astate["maxval"], astate["mantissa_bits"],
                     astate["sign_bits"]]),
        jnp.ones(N), b, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_weight_and_asym_output():
    x, w, b = _data(3)
    wspec = QuantizerSpec(method=QMethod.symmetric_uniform, per_channel=True)
    wstate = q.init_state(wspec, N)
    wmax = jnp.max(jnp.abs(w), axis=0)
    wstate = q.set_quant_range(wspec, wstate, -wmax, wmax)
    wq = q.apply(wspec, wstate, w, channel_axis=-1)

    y = x @ wq + b
    aspec = QuantizerSpec(method=QMethod.asymmetric_uniform)
    astate = q.set_quant_range(aspec, q.init_state(aspec),
                               jnp.min(y), jnp.max(y))
    ref = q.apply(aspec, astate, y)

    cfg = FusedQuantMatmulConfig(weight_method="int_sym",
                                 act_method="int_asym", mxu_dtype="float32")
    out = fused_quant_matmul(
        x, w, wstate["delta"],
        jnp.asarray([0.0, wstate["signed"]], jnp.float32),
        jnp.asarray([astate["delta"], astate["zero_float"], 0.0]),
        jnp.ones(N), b, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_unsigned_weight_grid():
    """All-non-negative weights calibrate to the unsigned grid; the kernel
    must honor the calibrated signedness (code-review finding)."""
    x, w, b = _data(6)
    w = jnp.abs(w)
    wspec = QuantizerSpec(method=QMethod.symmetric_uniform, per_channel=True)
    wstate = q.init_state(wspec, N)
    wmax = jnp.max(w, axis=0)
    wstate = q.set_quant_range(wspec, wstate, jnp.zeros_like(wmax), wmax)
    assert int(wstate["signed"]) == 0
    wq = q.apply(wspec, wstate, w, channel_axis=-1)
    ref = x @ wq + b

    cfg = FusedQuantMatmulConfig(weight_method="int_sym", act_method="none",
                                 mxu_dtype="float32")
    out = fused_quant_matmul(
        x, w, wstate["delta"],
        jnp.asarray([0.0, wstate["signed"]], jnp.float32),
        jnp.zeros(3), jnp.ones(N), b, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_folded_bn_epilogue():
    """scale/shift epilogue == fp32 BN on the matmul output."""
    x, w, _ = _data(4)
    rng = np.random.RandomState(9)
    gamma = jnp.asarray(np.abs(rng.normal(1, 0.1, N)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, N), jnp.float32)
    mean = jnp.asarray(rng.normal(0, 0.5, N), jnp.float32)
    var = jnp.asarray(np.abs(rng.normal(1, 0.2, N)), jnp.float32)
    eps = 1e-5

    spec, state = _fp8_weight_state(w)
    wq = q.apply(spec, state, w, channel_axis=-1)
    inv = gamma * jax.lax.rsqrt(var + eps)
    ref = (x @ wq) * inv + (beta - mean * inv)

    cfg = FusedQuantMatmulConfig(weight_method="fp8", mxu_dtype="float32")
    out = fused_quant_matmul(
        x, w, state["maxval"], jnp.asarray([4.0, 1.0]), jnp.zeros(3),
        inv, beta - mean * inv, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(8, 128, 128), (100, 200, 70),
                                   (3, 50, 300)])
def test_ragged_shapes_padded_correctly(shape):
    m, k, n = shape
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.3, (k, n)), jnp.float32)
    spec, state = _fp8_weight_state(w)
    wq = q.apply(spec, state, w, channel_axis=-1)
    ref = x @ wq

    cfg = FusedQuantMatmulConfig(weight_method="fp8", mxu_dtype="float32")
    out = fused_quant_matmul(
        x, w, state["maxval"], jnp.asarray([4.0, 1.0]), jnp.zeros(3),
        jnp.ones(n), jnp.zeros(n), cfg=cfg, interpret=True)
    assert out.shape == (m, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("signed_w", [True, False])
def test_int8_native_mxu_datapath(signed_w):
    """mxu_dtype="int8": the s8 x s8 -> s32 integer datapath must match the
    composed fake-quant oracle.  Integer accumulation is EXACT, so tolerance
    covers only the oracle's own fp32 rounding.  Covers both weight grids
    (the unsigned grid exercises the S_w recentering + rowsum correction)."""
    x, w, b = _data(7)
    if not signed_w:
        w = jnp.abs(w)
    wspec = QuantizerSpec(method=QMethod.symmetric_uniform, per_channel=True)
    wstate = q.init_state(wspec, N)
    if signed_w:
        wmax = jnp.max(jnp.abs(w), axis=0)
        wstate = q.set_quant_range(wspec, wstate, -wmax, wmax)
    else:
        wmax = jnp.max(w, axis=0)
        wstate = q.set_quant_range(wspec, wstate, jnp.zeros_like(wmax), wmax)
    assert int(wstate["signed"]) == (1 if signed_w else 0)
    wq = q.apply(wspec, wstate, w, channel_axis=-1)

    aspec = QuantizerSpec(method=QMethod.asymmetric_uniform)
    astate = q.set_quant_range(aspec, q.init_state(aspec),
                               jnp.min(x), jnp.max(x))
    xq = q.apply(aspec, astate, x)
    ref = jnp.maximum(xq @ wq + b, 0.0)

    cfg = FusedQuantMatmulConfig(weight_method="int_sym",
                                 act_method="int_asym", quantize_input=True,
                                 activation="relu", mxu_dtype="int8")
    out = fused_quant_matmul(
        x, w, wstate["delta"],
        jnp.asarray([0.0, wstate["signed"]], jnp.float32),
        jnp.asarray([astate["delta"], astate["zero_float"], 0.0]),
        jnp.ones(N), b, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_int8_native_mxu_low_bit_grids():
    """W4A8 on the int8 datapath: 4-bit weight integers ride the same s8
    container (reference's headline QAT config, BASELINE.md)."""
    x, w, b = _data(8)
    wspec = QuantizerSpec(method=QMethod.symmetric_uniform, per_channel=True,
                          n_bits=4)
    wstate = q.init_state(wspec, N)
    wmax = jnp.max(jnp.abs(w), axis=0)
    wstate = q.set_quant_range(wspec, wstate, -wmax, wmax)
    wq = q.apply(wspec, wstate, w, channel_axis=-1)

    aspec = QuantizerSpec(method=QMethod.asymmetric_uniform)
    astate = q.set_quant_range(aspec, q.init_state(aspec),
                               jnp.min(x), jnp.max(x))
    xq = q.apply(aspec, astate, x)
    ref = xq @ wq + b

    cfg = FusedQuantMatmulConfig(weight_method="int_sym",
                                 act_method="int_asym", quantize_input=True,
                                 n_bits=4, mxu_dtype="int8")
    out = fused_quant_matmul(
        x, w, wstate["delta"],
        jnp.asarray([0.0, wstate["signed"]], jnp.float32),
        jnp.asarray([astate["delta"], astate["zero_float"], 0.0]),
        jnp.ones(N), b, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
