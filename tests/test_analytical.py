"""Analytical SQNR subsystem: closed forms vs Monte-Carlo (the reference's
built-in correctness oracle, quant_error_estimator.py:150-159)."""

import numpy as np
import pytest

from fp8_quantization_tpu.analytical import quant_error
from fp8_quantization_tpu.analytical.distributions import (
    ClippedGaussian, ClippedStudentT, UniformDistribution)
from fp8_quantization_tpu.analytical.grid import (
    integrate_over_grid, nearest_grid_value, rounding_error_abs_nearest)


def test_distribution_moments():
    # clip bounds are wide: moments match the unclipped distributions
    assert UniformDistribution(-1, 1).second_moment() == pytest.approx(1 / 3)
    assert ClippedGaussian(0, 1, -10, 10).second_moment() == pytest.approx(1.0, rel=1e-6)
    # Student-t(8): Var = nu/(nu-2) = 4/3
    assert ClippedStudentT(8.0, -100, 100).second_moment() == pytest.approx(4 / 3, rel=1e-4)


def test_gaussian_bin_integral_vs_numeric():
    from scipy.integrate import quad

    d = ClippedGaussian(mu=0.3, sigma=1.2, range_min=-8, range_max=8)
    for (a, b, u) in [(-1.0, 0.5, 0.0), (0.2, 1.7, 1.0), (-3.0, -2.0, -2.5)]:
        num, _ = quad(lambda x: d.pdf(x) * (x - u) ** 2, a, b)
        assert float(d.bin_sq_error(a, b, u)) == pytest.approx(num, rel=1e-8)
        num_s, _ = quad(lambda x: x * d.pdf(x) * (u - x), a, b)
        assert float(d.bin_x_weighted_signed(a, b, u)) == pytest.approx(num_s, rel=1e-7, abs=1e-12)


def test_student_t_bin_integral_vs_numeric():
    from scipy.integrate import quad

    d = ClippedStudentT(nu=8.0, range_min=-100, range_max=100)
    for (a, b, u) in [(-1.0, 0.5, 0.0), (0.2, 1.7, 1.0), (2.0, 5.0, 3.0)]:
        num, _ = quad(lambda x: d.pdf(x) * (x - u) ** 2, a, b)
        assert float(d.bin_sq_error(a, b, u)) == pytest.approx(num, rel=1e-7)
        num_s, _ = quad(lambda x: x * d.pdf(x) * (u - x), a, b)
        assert float(d.bin_x_weighted_signed(a, b, u)) == pytest.approx(num_s, rel=1e-6, abs=1e-12)


def test_uniform_bin_integral_vs_numeric():
    from scipy.integrate import quad

    d = UniformDistribution(-1, 1)
    num, _ = quad(lambda x: d.pdf(x) * (x - 0.1) ** 2, -0.5, 0.3)
    assert float(d.bin_sq_error(-0.5, 0.3, 0.1)) == pytest.approx(num, rel=1e-10)


def test_grid_helpers():
    g = np.array([-1.0, 0.0, 1.0])
    assert nearest_grid_value(0.4, g) == 0.0
    assert nearest_grid_value(0.6, g) == 1.0
    err = rounding_error_abs_nearest(np.array([0.25, -0.9]), g)
    np.testing.assert_allclose(err, [0.25, 0.1])


def test_uniform_int8_rounding_mse_closed_form():
    """Uniform on [-1,1] quantized to a uniform grid spanning it:
    expected MSE must equal delta^2/12 (+ boundary half-bins)."""
    delta = 2.0 / 255
    grid = -1.0 + delta * np.arange(256)
    d = UniformDistribution(-1, 1)
    mse = integrate_over_grid(d, grid, "sq_error")
    # interior bins give delta^2/12 exactly; tails are half-bins
    assert mse == pytest.approx(delta ** 2 / 12, rel=2e-2)


def test_analytic_matches_empirical_gaussian_fp8():
    import jax.numpy as jnp

    from fp8_quantization_tpu.ops import quantizer as q
    from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec

    d = ClippedGaussian(0, 1, -10, 10)
    qspec = QuantizerSpec(method=QMethod.fp_quantizer, mantissa_bits=3,
                          set_maxval=True)
    state = q.set_quant_range(qspec, q.init_state(qspec), -6.0, 6.0)
    grid = q.quantizer_grid(qspec, state)

    rng = np.random.RandomState(0)
    mse_analyt = quant_error.expected_rounding_error(d, grid)
    sample = d.sample((400_000,), rng).astype(np.float32)
    mse_emp = quant_error.empirical_rounding_error(
        sample, lambda x: np.asarray(q.apply(qspec, state, jnp.asarray(x))))
    assert mse_emp == pytest.approx(mse_analyt, rel=0.05)


def test_analytic_matches_empirical_dot_prod_student_t():
    import jax.numpy as jnp

    from fp8_quantization_tpu.ops import quantizer as q
    from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec

    d = ClippedStudentT(8.0, -100, 100)
    qspec = QuantizerSpec(method=QMethod.fp_quantizer, mantissa_bits=2,
                          set_maxval=True)
    state = q.set_quant_range(qspec, q.init_state(qspec), -8.0, 8.0)
    grid = q.quantizer_grid(qspec, state)

    quantize = lambda x: np.asarray(q.apply(qspec, state, jnp.asarray(x)))
    rng = np.random.RandomState(1)
    analyt = quant_error.expected_dot_prod_error(d, grid, d, grid)
    x = d.sample((400_000,), rng).astype(np.float32)
    y = d.sample((400_000,), rng).astype(np.float32)
    emp = quant_error.empirical_dot_prod_error(x, y, quantize, quantize)
    assert emp == pytest.approx(analyt, rel=0.1)


def test_line_search_finds_sensible_range():
    import jax.numpy as jnp

    from fp8_quantization_tpu.calibration.line_search import line_search_range
    from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec

    rng = np.random.RandomState(2)
    data = rng.normal(0, 1, 100_000).astype(np.float32)
    qspec = QuantizerSpec(method=QMethod.symmetric_uniform, n_bits=8)
    lo, hi = line_search_range(jnp.asarray(data), qspec, num_candidates=200)
    # INT8 on a standard Gaussian: optimal clip is a few sigma
    assert 2.0 < hi < 6.0
    assert lo == pytest.approx(-hi)


def test_line_search_one_sided():
    import jax.numpy as jnp

    from fp8_quantization_tpu.calibration.line_search import line_search_range
    from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec

    rng = np.random.RandomState(3)
    data = np.abs(rng.normal(0, 1, 50_000)).astype(np.float32)
    qspec = QuantizerSpec(method=QMethod.symmetric_uniform, n_bits=8)
    lo, hi = line_search_range(jnp.asarray(data), qspec, num_candidates=200)
    assert lo == 0.0 and hi > 0


def test_mini_study_runs_and_cross_validates(caplog):
    """A scaled-down version of the full study: every format on the Gaussian;
    the analytic/empirical cross-check (>10% warning) must stay silent."""
    import logging

    from fp8_quantization_tpu.analytical.study import run_study_for_distribution

    d = ClippedGaussian(0, 1, -10, 10)
    with caplog.at_level(logging.WARNING,
                         logger="fp8_quantization_tpu.analytical.quant_error"):
        res = run_study_for_distribution(d, n_samples=150_000, seed=10,
                                         num_candidates=120)
    assert len(res) == 5
    assert not [r for r in caplog.records
                if "differ" in r.getMessage()], caplog.text
    # more exponent bits => wider dynamic range; on a Gaussian the 2-3 bit
    # formats should be at least as good as E5M2 (paper's qualitative claim)
    by_exp = {r.exp_bits: r.quant_sqnr_db for r in res}
    assert by_exp[2] > by_exp[5]
