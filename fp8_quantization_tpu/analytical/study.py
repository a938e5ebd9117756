"""The paper's analytical SQNR study (expected MSE per distribution × format).

Reference: compute_quant_error.py (whole file).  For each distribution
(Uniform, clipped Gaussian, clipped Student-t) and each 8-bit format
(E5M2, E4M3, E3M4, E2M5, INT8): find the MSE-optimal clipping range by line
search, then compute the expected quantization MSE and expected dot-product
MSE both analytically (closed-form piecewise integrals) and empirically
(Monte-Carlo through the real fake-quant kernel).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.analytical import quant_error
from fp8_quantization_tpu.analytical.distributions import (
    ClippedGaussian, ClippedStudentT, Distribution, UniformDistribution)
from fp8_quantization_tpu.calibration.line_search import line_search_range
from fp8_quantization_tpu.ops import quantizer as q
from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec


@dataclasses.dataclass
class StudyResult:
    distribution: str
    exp_bits: int
    mantissa_bits: int
    range_min: float
    range_max: float
    quant_mse: float
    quant_sqnr_db: float
    dot_prod_mse: float
    dot_prod_sqnr_db: float


def default_distributions() -> List[Distribution]:
    """Reference: compute_quant_error.py:61-65."""
    return [
        UniformDistribution(range_min=-1.0, range_max=1.0),
        ClippedGaussian(mu=0.0, sigma=1.0, range_min=-10.0, range_max=10.0),
        ClippedStudentT(nu=8.0, range_min=-100.0, range_max=100.0),
    ]


def _make_quantizer(exp_bits: int, n_bits: int = 8) -> QuantizerSpec:
    """Reference: compute_quant_error.py:21-27."""
    if exp_bits > 0:
        return QuantizerSpec(method=QMethod.fp_quantizer, n_bits=n_bits,
                             mantissa_bits=n_bits - 1 - exp_bits, set_maxval=True)
    return QuantizerSpec(method=QMethod.symmetric_uniform, n_bits=n_bits)


def run_study_for_distribution(distr: Distribution, n_bits: int = 8,
                               n_samples: int = 5_000_000, seed: int = 10,
                               exp_bits_list=(5, 4, 3, 2, 0),
                               num_candidates: int = 1000) -> List[StudyResult]:
    """Reference: compute_quant_error.py:18-57 (per-distribution loop)."""
    results = []
    rng = np.random.RandomState(seed)
    sample = distr.sample((n_samples,), rng).astype(np.float32)
    sample_dev = jnp.asarray(sample)

    for exp_bits in exp_bits_list:
        mantissa_bits = n_bits - 1 - exp_bits
        qspec = _make_quantizer(exp_bits, n_bits)

        rmin, rmax = line_search_range(sample_dev, qspec,
                                       num_candidates=num_candidates)

        state = q.set_quant_range(qspec, q.init_state(qspec), rmin, rmax)
        grid = q.quantizer_grid(qspec, state)

        def quantize(x_np):
            return np.asarray(q.apply(qspec, state, jnp.asarray(x_np)))

        mse = quant_error.compute_expected_quant_mse(
            distr, grid, quantize, n_samples, rng)
        dp_mse = quant_error.compute_expected_dot_prod_mse(
            distr, grid, distr, grid, quantize, quantize,
            num_samples=2_000_000, rng=rng)

        results.append(StudyResult(
            distribution=distr.describe(), exp_bits=exp_bits,
            mantissa_bits=mantissa_bits, range_min=float(rmin),
            range_max=float(rmax), quant_mse=float(mse),
            quant_sqnr_db=quant_error.sqnr_db(mse), dot_prod_mse=float(dp_mse),
            dot_prod_sqnr_db=quant_error.sqnr_db(dp_mse)))
    return results


def format_result(r: StudyResult) -> str:
    """Reference print format: compute_quant_error.py:47-57."""
    return ("FP8 {} E {} M Quantization: expected MSE {:.2e}  SQNR  {:.2e}\n"
            "{}  expected MSE {:.2e}  SQNR  {:.2e}".format(
                r.exp_bits, r.mantissa_bits, r.quant_mse, r.quant_sqnr_db,
                "Dot product:".rjust(23), r.dot_prod_mse, r.dot_prod_sqnr_db))


def run_full_study(n_samples: int = 5_000_000, seed: int = 10,
                   num_candidates: int = 1000, printer=print) -> List[StudyResult]:
    """Reference: compute_quant_error.py:60-70 (__main__)."""
    all_results = []
    for distr in default_distributions():
        printer("*" * 80)
        printer(distr.describe())
        res = run_study_for_distribution(
            distr, n_samples=n_samples, seed=seed, num_candidates=num_candidates)
        for r in res:
            printer(format_result(r))
        all_results.extend(res)
    return all_results
