"""Hardware-cast FP8 deployment fast path (ops/fp8.fp8_quantize_cast).

Contract (see fp8_cast_consts docstring): identical to the exact reference
grid (fp8_quantizer.py:91-133 numerics) on every binade except the lowest —
IEEE f8 dtypes spend the top exponent code on inf/nan, so their subnormal
step is 2x the reference's.  These tests pin (a) exact agreement above the
IEEE-subnormal threshold, (b) the deviation bound below it, (c) model-level
closeness, and (d) the opt-in plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.ops import fp8 as fp8_ops
from fp8_quantization_tpu.ops import quantizer as q
from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec


@pytest.mark.parametrize("mantissa_bits", [2, 3, 4])
@pytest.mark.parametrize("maxval", [1.0, 3.7, 57.0, 0.013])
def test_cast_bitexact_vs_exact_pipeline(mantissa_bits, maxval):
    """Cast fast path == exact pipeline, every value, ties included."""
    dtype = fp8_ops.fp8_cast_dtype(mantissa_bits)
    assert dtype is not None
    c = fp8_ops.fp8_cast_consts(jnp.float32(maxval), mantissa_bits)
    rng = np.random.RandomState(0)
    x = np.concatenate([
        rng.uniform(-1.5 * maxval, 1.5 * maxval, 50_000),
        rng.normal(0, maxval / 50, 50_000),        # stress the bottom region
        [0.0, maxval, -maxval, maxval * 1e-9],
    ]).astype(np.float32)
    exact = fp8_ops.quantize_to_fp8(jnp.asarray(x), jnp.float32(maxval),
                                    jnp.float32(mantissa_bits))
    fast = fp8_ops.fp8_quantize_cast(jnp.asarray(x), c)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(fast))


def test_cast_normalized_factored_identity():
    c = fp8_ops.fp8_cast_consts(jnp.float32(5.0), 4)
    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    norm = fp8_ops.fp8_quantize_cast(x, c, normalized=True)
    assert norm.dtype == jnp.bfloat16
    full = fp8_ops.fp8_quantize_cast(x, c)
    np.testing.assert_allclose(
        np.asarray(norm, np.float32) * float(c["cast_scale"]),
        np.asarray(full), rtol=0, atol=0)
    # norm values carry <= M+1 significand bits: exact in bf16
    back = norm.astype(jnp.float32).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(back, np.float32),
                                  np.asarray(norm, np.float32))


def test_cast_consts_eligibility():
    # unsigned grids restructure the exponent field: no cast path
    assert fp8_ops.fp8_cast_consts(jnp.float32(1.0), 4, sign_bits=0) is None
    # unsupported mantissa widths: no IEEE dtype
    assert fp8_ops.fp8_cast_consts(jnp.float32(1.0), 5) is None
    assert fp8_ops.fp8_cast_consts(jnp.float32(1.0), 4, n_bits=7) is None
    # under tracing eligibility cannot be decided: returns None, no crash
    traced = jax.jit(lambda m: fp8_ops.fp8_cast_consts(m, 4) is None)
    # jit of a python-bool-returning fn: wrap to check via closure
    out = {}
    def f(m):
        out["c"] = fp8_ops.fp8_cast_consts(m, 4)
        return m
    jax.jit(f)(jnp.float32(1.0))
    assert out["c"] is None


def test_prepared_dispatch_uses_cast_iff_opted_in():
    state = {"maxval": jnp.float32(3.0), "mantissa_bits": jnp.float32(4.0),
             "sign_bits": jnp.asarray(1, jnp.int32),
             "initialized": jnp.asarray(True)}
    x = jnp.linspace(-4, 4, 1001, dtype=jnp.float32)

    spec_on = QuantizerSpec(method=QMethod.fp_quantizer, cast_fastpath=True)
    spec_off = QuantizerSpec(method=QMethod.fp_quantizer)
    c_on = q.fixed_consts(spec_on, state)
    c_off = q.fixed_consts(spec_off, state)
    assert "cast_probe" in c_on and "cast_probe" not in c_off

    y_on = q.apply_prepared(spec_on, c_on, x)
    y_off = q.apply_prepared(spec_off, c_off, x)
    exact = q.apply(spec_off, state, x)
    np.testing.assert_array_equal(np.asarray(y_off), np.asarray(exact))
    np.testing.assert_array_equal(np.asarray(y_on), np.asarray(exact))


def test_model_level_cast_deployment_bitexact():
    """resnet18 PTQ deployment: cast-path logits == exact-path logits, bitwise.

    The cast path's normalized values and factors are exact power-of-two
    rescalings of the exact path's (cast_scale = factor / 2^k with identical
    mantissas), so every downstream op — bf16 conv, fp32 accumulate, folded
    epilogue, requantization — produces bit-identical full-scale values.
    """
    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.models import resnet18_quantized
    from fp8_quantization_tpu.nn.bake import prepare_for_deployment
    from fp8_quantization_tpu.nn.config import make_layer_config

    kw = dict(qmethod="fp_quantizer", per_channel_weights=True,
              fp8_mantissa_bits=4, fp8_set_maxval=True,
              weight_range_method="current_minmax",
              act_range_method="allminmax", engine="bf16")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32)

    logits = {}
    for name, cast in [("exact", False), ("cast", True)]:
        config = make_layer_config(**kw, deploy_cast_quant=cast)
        model = resnet18_quantized(config, num_classes=10)
        variables = model.init(jax.random.PRNGKey(0), x)
        variables = calibrate(model, variables, [x])
        variables = prepare_for_deployment(model, variables, x[:1])
        logits[name] = np.asarray(
            model.apply(variables, x, mode="fixed", quant_w=False))
    np.testing.assert_array_equal(logits["cast"], logits["exact"])


@pytest.mark.parametrize("mantissa_bits", [2, 3, 4])
def test_store_f8_numerics_bound(mantissa_bits):
    """store_f8 mode: exact above the IEEE subnormal threshold; below it the
    paper grid's half-step uniform region collapses onto the IEEE subnormal
    grid — |error| <= h/2 * cast_scale with h = sn * 2^-(M+1)... rather, the
    IEEE RNE round of a paper-grid value moves it at most half an IEEE
    subnormal step = sn * 2^-M / 2 = sn * 2^-(M+1) (scaled)."""
    maxval = 2.9
    dtype = fp8_ops.fp8_cast_dtype(mantissa_bits)
    c = fp8_ops.fp8_cast_consts(jnp.float32(maxval), mantissa_bits)
    rng = np.random.RandomState(1)
    x = np.concatenate([
        rng.uniform(-1.2 * maxval, 1.2 * maxval, 40_000),
        rng.normal(0, maxval / 100, 40_000),      # stress the bottom region
        [0.0, maxval, -maxval],
    ]).astype(np.float32)

    norm8 = fp8_ops.fp8_quantize_cast(jnp.asarray(x), c, normalized=True,
                                      store_f8=True)
    assert norm8.dtype == dtype
    full8 = np.asarray(norm8, np.float32) * float(c["cast_scale"])
    exact = np.asarray(fp8_ops.fp8_quantize_cast(jnp.asarray(x), c))

    sn = float(c["cast_sn"])
    scaled_exact = exact / float(c["cast_scale"])
    hi = np.abs(scaled_exact) >= sn
    np.testing.assert_array_equal(full8[hi], exact[hi])
    # bottom region: at most half an IEEE subnormal step
    step_ieee = sn * 2.0 ** -mantissa_bits
    err = np.abs(full8[~hi] - exact[~hi]) / float(c["cast_scale"])
    assert err.max() <= step_ieee / 2 * (1 + 1e-5), err.max()
    # and every stored value is on the IEEE grid (exact round-trip)
    rt = np.asarray(norm8.astype(jnp.float32).astype(dtype), np.float32)
    np.testing.assert_array_equal(rt, np.asarray(norm8, np.float32))


def test_apply_prepared_factored_store_f8_dispatch():
    state = {"maxval": jnp.float32(3.0), "mantissa_bits": jnp.float32(4.0),
             "sign_bits": jnp.asarray(1, jnp.int32),
             "initialized": jnp.asarray(True)}
    x = jnp.linspace(-4, 4, 1001, dtype=jnp.float32)
    spec = QuantizerSpec(method=QMethod.fp_quantizer, cast_fastpath=True,
                         store_f8=True)
    consts = q.fixed_consts(spec, state)
    norm, factor = q.apply_prepared(spec, consts, x, factored=True)
    assert norm.dtype == fp8_ops.fp8_cast_dtype(4)
    spec_bf16 = spec.replace(store_f8=False)
    norm_b, factor_b = q.apply_prepared(spec_bf16, consts, x, factored=True)
    assert norm_b.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(factor), np.asarray(factor_b))


def test_cast_ieee_subnorm_matches_store_f8_values():
    """ieee_subnorm rounding == the store_f8 value set (upcast), for every
    mantissa width with an IEEE dtype; only the storage dtype differs."""
    from fp8_quantization_tpu.ops.fp8 import (fp8_cast_consts,
                                              fp8_quantize_cast)

    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.normal(0, 1.5, (4096,)), jnp.float32)
    for mb in (2, 3, 4):
        c = fp8_cast_consts(jnp.asarray(3.0), mb)
        if c is None:
            continue
        y_ieee = fp8_quantize_cast(x, c, normalized=True, ieee_subnorm=True)
        y_f8 = fp8_quantize_cast(x, c, normalized=True, store_f8=True)
        np.testing.assert_array_equal(
            np.asarray(y_ieee, np.float32),
            np.asarray(y_f8.astype(jnp.float32)))
