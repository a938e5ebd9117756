"""FP8 quantizer numerics vs the enumerated-grid oracle.

The enumerated FP8 grid (ops/fp8.py:generate_all_values_fp, mirroring
reference fp8_quantizer.py:13-41) is the ground truth: quantizing any input
with a given (maxval, M) must land exactly on the correspondingly scaled grid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.ops import fp8 as fp8_ops
from fp8_quantization_tpu.ops.quantizer import (
    QMethod, QuantizerSpec, apply, init_state, quantizer_grid, set_quant_range)

FORMATS = [(5, 2), (4, 3), (3, 4), (2, 5), (1, 6)]  # (E, M)


def _default_bias(ebits):
    return 2 ** (ebits - 1)


@pytest.mark.parametrize("ebits,mbits", FORMATS)
def test_grid_size_and_symmetry(ebits, mbits):
    grid = fp8_ops.generate_all_values_fp(8, ebits, _default_bias(ebits))
    assert grid.shape == (256,)
    np.testing.assert_allclose(grid, -grid[::-1], rtol=0, atol=0)
    # absmax matches the closed form
    assert np.max(np.abs(grid)) == pytest.approx(
        fp8_ops.default_fp8_maxval(mbits), rel=0)


@pytest.mark.parametrize("ebits,mbits", FORMATS)
def test_get_max_value_matches_grid(ebits, mbits):
    bias = _default_bias(ebits)
    grid = fp8_ops.generate_all_values_fp(8, ebits, bias)
    assert np.max(grid) == pytest.approx(fp8_ops.get_max_value(ebits, bias))


@pytest.mark.parametrize("ebits,mbits", FORMATS)
@pytest.mark.parametrize("maxval", [1.0, 3.0, 57.344, 0.21])
def test_quantize_lands_on_scaled_grid(ebits, mbits, maxval):
    bias = _default_bias(ebits)
    grid = fp8_ops.generate_all_float_values_scaled(8, ebits, bias, maxval)
    x = jnp.asarray(np.random.RandomState(0).uniform(-2 * maxval, 2 * maxval, 4096),
                    jnp.float32)
    xq = np.asarray(fp8_ops.quantize_to_fp8(x, jnp.float32(maxval),
                                            jnp.float32(mbits)))
    # fp32 rounding through the non-integer-bias exponent pipeline leaves
    # ~1e-6 relative error (the torch reference computes identically in fp32)
    dist = np.min(np.abs(xq[:, None] - grid[None, :]), axis=1)
    np.testing.assert_array_less(dist, 1e-5 * max(maxval, 1.0))


@pytest.mark.parametrize("ebits,mbits", [(4, 3), (5, 2)])
def test_idempotence(ebits, mbits):
    x = jnp.asarray(np.random.RandomState(1).normal(0, 1, 2048), jnp.float32)
    mv, mb = jnp.float32(3.0), jnp.float32(mbits)
    q1 = fp8_ops.quantize_to_fp8(x, mv, mb)
    q2 = fp8_ops.quantize_to_fp8(q1, mv, mb)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=0, atol=0)


def test_clipping_bounds_signed_and_unsigned():
    x = jnp.linspace(-10, 10, 1001)
    q_signed = fp8_ops.quantize_to_fp8(x, jnp.float32(2.0), jnp.float32(3.0),
                                       sign_bits=1)
    assert float(jnp.max(q_signed)) <= 2.0 and float(jnp.min(q_signed)) >= -2.0
    q_uns = fp8_ops.quantize_to_fp8(x, jnp.float32(2.0), jnp.float32(3.0),
                                    sign_bits=0)
    assert float(jnp.min(q_uns)) >= 0.0


def test_maxval_is_fixed_point():
    for mv in (1.0, 3.0, 448.0):
        q = fp8_ops.quantize_to_fp8(jnp.float32(mv), jnp.float32(mv), jnp.float32(3.0))
        assert float(q) == pytest.approx(mv, rel=1e-6)


def test_zero_maps_to_zero_no_nan():
    x = jnp.asarray([0.0, -0.0, 1e-30, -1e-30], jnp.float32)
    q = fp8_ops.quantize_to_fp8(x, jnp.float32(3.0), jnp.float32(3.0))
    assert np.all(np.isfinite(np.asarray(q)))
    assert float(q[0]) == 0.0


def test_ste_gradient_identity_inside_clip_zero_outside():
    def f(x):
        return jnp.sum(fp8_ops.quantize_to_fp8(x, jnp.float32(1.0), jnp.float32(3.0)))

    x = jnp.asarray([0.3, -0.7, 2.5, -3.0, 0.9], jnp.float32)
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), [1, 1, 0, 0, 1], atol=1e-6)


def test_maxval_gradient_flows():
    def f(mv):
        x = jnp.linspace(-2.0, 2.0, 64)
        return jnp.sum(fp8_ops.quantize_to_fp8(x, mv, jnp.float32(3.0)) ** 2)

    g = jax.grad(f)(jnp.float32(1.0))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_mantissa_bits_gradient_flows():
    def f(mb):
        x = jnp.linspace(-2.0, 2.0, 64)
        return jnp.sum(fp8_ops.quantize_to_fp8(x, jnp.float32(2.0), mb) ** 2)

    g = jax.grad(f)(jnp.float32(3.3))
    assert np.isfinite(float(g))


def test_per_channel_maxval_broadcast():
    x = jnp.asarray(np.random.RandomState(2).normal(0, 1, (3, 3, 4, 8)), jnp.float32)
    spec = QuantizerSpec(method=QMethod.fp_quantizer, per_channel=True, set_maxval=True)
    state = init_state(spec, num_channels=8)
    xmin = x.reshape(-1, 8).min(axis=0)
    xmax = x.reshape(-1, 8).max(axis=0)
    state = set_quant_range(spec, state, xmin, xmax)
    assert state["maxval"].shape == (8,)
    xq = apply(spec, state, x, channel_axis=-1)
    assert xq.shape == x.shape
    # each channel is clipped to its own maxval
    mv = np.asarray(state["maxval"])
    for c in range(8):
        assert np.max(np.abs(np.asarray(xq)[..., c])) <= mv[c] + 1e-6


def test_quantizer_grid_oracle_roundtrip():
    spec = QuantizerSpec(method=QMethod.fp_quantizer, mantissa_bits=3, set_maxval=True)
    state = init_state(spec)
    state = set_quant_range(spec, state, -1.7, 1.7)
    grid = quantizer_grid(spec, state)
    x = jnp.asarray(np.random.RandomState(3).uniform(-3, 3, 512), jnp.float32)
    xq = np.asarray(apply(spec, state, x))
    dist = np.min(np.abs(xq[:, None] - grid[None, :]), axis=1)
    np.testing.assert_array_less(dist, 1e-6)


def test_unsigned_promotion():
    spec = QuantizerSpec(method=QMethod.fp_quantizer, allow_unsigned=True,
                         set_maxval=True)
    state = init_state(spec)
    state = set_quant_range(spec, state, 0.0, 5.0)
    assert int(state["sign_bits"]) == 0
    state2 = set_quant_range(spec, init_state(spec), -1.0, 5.0)
    assert int(state2["sign_bits"]) == 1


class TestBitcastImpl:
    """impl='bitcast' (exact exponent extraction) vs impl='log2' (reference
    formulation): identical quantized outputs, including near bin edges."""

    def _check(self, x, maxval, mbits, sign_bits=1):
        from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8

        a = quantize_to_fp8(x, maxval, jnp.asarray(float(mbits)),
                            sign_bits=sign_bits, impl="bitcast")
        b = quantize_to_fp8(x, maxval, jnp.asarray(float(mbits)),
                            sign_bits=sign_bits, impl="log2")
        # bitcast scales are exact powers of two; the log2 formulation can
        # be ~1 ulp off, so allow that much
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
        return np.asarray(a)

    def test_random_tensors_match(self):
        rng = np.random.RandomState(0)
        for mbits in (2, 3, 4, 5):
            x = jnp.asarray(rng.normal(0, 3, (4096,)), jnp.float32)
            self._check(x, jnp.asarray(7.3), mbits)

    def test_per_channel_maxval_match(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.normal(0, 1, (64, 16)), jnp.float32)
        maxval = jnp.asarray(np.abs(rng.normal(1, 0.5, (1, 16))), jnp.float32)
        self._check(x, maxval, 4)

    def test_powers_of_two_and_edges(self):
        vals = []
        for e in range(-10, 10):
            for eps in (-1e-7, 0.0, 1e-7):
                vals.append(2.0 ** e * (1.0 + eps))
        x = jnp.asarray(vals + [0.0, 1e-30, -1e-30, 3.0], jnp.float32)
        out = self._check(x, jnp.asarray(8.0), 3)
        assert np.all(np.isfinite(out))

    def test_bitcast_lands_on_enumerated_grid(self):
        """Default-maxval quantization must land exactly on the FP8 grid."""
        from fp8_quantization_tpu.ops.fp8 import (
            default_fp8_maxval, generate_all_values_fp, quantize_to_fp8)

        mbits, ebits = 4, 3
        maxval = default_fp8_maxval(mbits)
        grid = generate_all_values_fp(8, ebits, 2 ** (ebits - 1))
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.normal(0, maxval / 2, (2048,)), jnp.float32)
        out = np.asarray(quantize_to_fp8(x, jnp.asarray(maxval),
                                         jnp.asarray(float(mbits)),
                                         impl="bitcast"))
        dists = np.min(np.abs(out[:, None] - grid[None, :]), axis=1)
        np.testing.assert_allclose(dists, 0, atol=1e-7)

    def test_gradients_match_log2_impl(self):
        from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.normal(0, 2, (256,)), jnp.float32)

        def loss(impl, maxval, mbits):
            return jnp.sum(quantize_to_fp8(x, maxval, mbits, impl=impl) ** 2)

        for arg in (0, 1):
            g_a = jax.grad(lambda mv, mb: loss("bitcast", mv, mb), arg)(
                jnp.asarray(3.0), jnp.asarray(4.0))
            g_b = jax.grad(lambda mv, mb: loss("log2", mv, mb), arg)(
                jnp.asarray(3.0), jnp.asarray(4.0))
            np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                                       rtol=1e-4, atol=1e-6)
