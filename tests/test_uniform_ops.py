"""Uniform (INT) quantizer numerics vs the enumerated lattice."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.ops import uniform as uniform_ops
from fp8_quantization_tpu.ops.quantizer import (
    QMethod, QuantizerSpec, apply, init_state, quantizer_grid, set_quant_range)


def test_symmetric_signed_grid_membership():
    spec = QuantizerSpec(method=QMethod.symmetric_uniform, n_bits=8)
    state = init_state(spec)
    state = set_quant_range(spec, state, -1.3, 0.9)
    assert int(state["signed"]) == 1
    grid = quantizer_grid(spec, state)
    assert len(grid) == 256
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, 4096), jnp.float32)
    xq = np.asarray(apply(spec, state, x))
    dist = np.min(np.abs(xq[:, None] - grid[None, :]), axis=1)
    np.testing.assert_array_less(dist, 1e-6)


def test_symmetric_unsigned_detection():
    spec = QuantizerSpec(method=QMethod.symmetric_uniform, n_bits=8)
    state = set_quant_range(spec, init_state(spec), 0.0, 2.0)
    assert int(state["signed"]) == 0
    # unsigned: int grid [0, 255], delta = 2/255
    assert float(state["delta"]) == pytest.approx(2.0 / 255.0)
    xq = apply(spec, state, jnp.asarray([-1.0, 0.5, 3.0], jnp.float32))
    assert float(xq[0]) == 0.0  # clipped at zero
    assert float(xq[2]) == pytest.approx(2.0, rel=1e-6)


def test_asymmetric_range_endpoints():
    spec = QuantizerSpec(method=QMethod.asymmetric_uniform, n_bits=8)
    state = set_quant_range(spec, init_state(spec), -0.4, 1.6)
    x = jnp.asarray([-10.0, -0.4, 0.0, 1.6, 10.0], jnp.float32)
    xq = np.asarray(apply(spec, state, x))
    # zero must be exactly representable (affine zero-point)
    assert abs(xq[2]) < 1e-7
    # endpoints approximately reachable, clipping beyond
    assert xq[0] == pytest.approx(xq[1])
    assert xq[4] == pytest.approx(xq[3])
    assert xq[1] == pytest.approx(-0.4, abs=2e-2 / 255)
    assert xq[3] == pytest.approx(1.6, abs=2e-2 / 255)


def test_asymmetric_range_includes_zero():
    # reference _tensorize_min_max clamps x_min<=0, x_max>=eps
    spec = QuantizerSpec(method=QMethod.asymmetric_uniform, n_bits=8)
    state = set_quant_range(spec, init_state(spec), 0.5, 1.5)
    # x_min forced to 0 -> delta = 1.5/255
    assert float(state["delta"]) == pytest.approx(1.5 / 255.0)
    assert float(state["zero_float"]) == pytest.approx(0.0)


def test_idempotence_uniform():
    for method in (QMethod.symmetric_uniform, QMethod.asymmetric_uniform):
        spec = QuantizerSpec(method=method, n_bits=6)
        state = set_quant_range(spec, init_state(spec), -1.0, 1.0)
        x = jnp.asarray(np.random.RandomState(1).normal(0, 1, 512), jnp.float32)
        q1 = apply(spec, state, x)
        q2 = apply(spec, state, q1)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-7)


def test_lsq_grad_scaling_scales_delta_grad():
    x = jnp.asarray(np.random.RandomState(2).normal(0, 1, 256), jnp.float32)

    def loss(delta, grad_scaling):
        out = uniform_ops.quantize_uniform_symmetric(
            x, delta, 1, 8, grad_scaling=grad_scaling)
        return jnp.sum(out ** 2)

    g_plain = jax.grad(loss)(jnp.float32(0.01), False)
    g_scaled = jax.grad(loss)(jnp.float32(0.01), True)
    expected = uniform_ops.lsq_grad_scale(x, 127.0, False)
    assert float(g_scaled) == pytest.approx(float(g_plain) * expected, rel=1e-5)


def test_per_channel_symmetric():
    spec = QuantizerSpec(method=QMethod.symmetric_uniform, n_bits=8, per_channel=True)
    state = init_state(spec, num_channels=4)
    xmin = jnp.asarray([-1.0, -2.0, -0.5, 0.0])
    xmax = jnp.asarray([1.0, 0.5, 3.0, 2.0])
    state = set_quant_range(spec, state, xmin, xmax)
    assert state["delta"].shape == (4,)
    # signedness is a whole-tensor property (min over channels)
    assert int(state["signed"]) == 1
    # symmetric: per-channel clip at absmax = max(|xmin|, xmax)
    x = jnp.ones((2, 3, 3, 4), jnp.float32) * 10.0
    xq = np.asarray(apply(spec, state, x, channel_axis=-1))
    np.testing.assert_allclose(xq[0, 0, 0], [1.0, 2.0, 3.0, 2.0], rtol=1e-5)


def test_round_half_to_even():
    # torch.round and jnp.round both round half to even — required for parity
    x = jnp.asarray([0.5, 1.5, 2.5, -0.5, -1.5], jnp.float32)
    np.testing.assert_allclose(np.asarray(jnp.round(x)), [0, 2, 2, 0, -2])
