"""MSE line-search over clipping thresholds (the analytical study's range
estimator).

Reference: quantization/range_estimators.py:133-282 (LineSearchEstimator) and
:372-379 (estimate_range_line_search).  The reference loops 1000 candidate
thresholds in Python, fake-quantizing the full sample each time; here the
candidate sweep is a ``lax.map`` (batched) over a jit-compiled loss — on TPU
the full 1000 x 5M sweep is a single device computation.

Only the 1-D grid search is live in the reference (its 2-D/golden-section
methods are referenced but not implemented — range_estimators.py:183-198
points at methods that don't exist).  We implement the 1-D grid search with
identical semantics plus a scipy golden-section variant as the working
equivalent of the reference's dead ``OptMethod.golden_section`` option.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.ops import fp8 as fp8_ops
from fp8_quantization_tpu.ops import uniform as uniform_ops
from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec


class OptMethod(str, enum.Enum):
    """Reference: range_estimators.py:128-130."""

    grid = "grid"
    golden_section = "golden_section"


def _quantize_with_range(qspec: QuantizerSpec, x, neg_thr, pos_thr):
    """Fake-quantize ``x`` after setting the range to (neg_thr, pos_thr) on a
    per-tensor quantizer — the vectorizable core of the reference's
    ``LineSearchEstimator.quantize`` (range_estimators.py:200-207)."""
    if qspec.is_fp8:
        maxval, sign_bits = fp8_ops.fp8_set_quant_range(
            neg_thr, pos_thr, allow_unsigned=qspec.allow_unsigned)
        return fp8_ops.quantize_to_fp8(
            x, maxval, jnp.asarray(float(qspec.mantissa_bits), jnp.float32),
            n_bits=qspec.n_bits, sign_bits=sign_bits)
    if qspec.method == QMethod.symmetric_uniform:
        delta, signed = uniform_ops.symmetric_set_quant_range(
            neg_thr, pos_thr, qspec.n_bits, scale_domain=qspec.scale_domain,
            eps=qspec.eps)
        return uniform_ops.quantize_uniform_symmetric(
            x, delta, signed, qspec.n_bits, scale_domain=qspec.scale_domain,
            eps=qspec.eps)
    # asymmetric
    delta, zero_float = uniform_ops.asymmetric_set_quant_range(
        neg_thr, pos_thr, qspec.n_bits, scale_domain=qspec.scale_domain,
        eps=qspec.eps)
    return uniform_ops.quantize_uniform_asymmetric(
        x, delta, zero_float, qspec.n_bits, scale_domain=qspec.scale_domain,
        eps=qspec.eps)


@partial(jax.jit, static_argnames=("qspec", "one_sided"))
def _candidate_losses(qspec: QuantizerSpec, x: jax.Array, thresholds: jax.Array,
                      one_sided: bool) -> jax.Array:
    """Sum-of-squared-error per candidate threshold (range_estimators.py:236-248)."""

    def loss(t):
        neg = jnp.where(one_sided, 0.0, -t)
        y = _quantize_with_range(qspec, x, neg, t)
        return jnp.sum((x - y) ** 2)

    return jax.lax.map(loss, thresholds, batch_size=16)


def line_search_range(x, qspec: QuantizerSpec, num_candidates: int = 1000,
                      range_margin: float = 0.5, expand_range: float = 10.0,
                      opt_method: OptMethod = OptMethod.grid):
    """Best symmetric (or one-sided) clipping range by exhaustive MSE search.

    Mirrors the reference's search-space construction exactly
    (range_estimators.py:209-256): step = (absmax + margin) * expand / N,
    candidates i=1..N, candidate 0 excluded.  Returns (x_min, x_max) floats.
    """
    x = jnp.asarray(x, jnp.float32)
    one_sided = bool(jnp.min(x) >= 0)

    data_min = float(jnp.min(x))
    data_max = float(jnp.max(x))
    max_pos_thr = max(abs(data_min), data_max) + range_margin
    max_search_range = max_pos_thr * expand_range
    step = max_search_range / num_candidates

    if opt_method == OptMethod.golden_section:
        # CAVEAT: quantization MSE as a function of the clipping threshold is
        # NOT unimodal (it has a local minimum near every grid-boundary
        # crossing), so bounded golden-section can converge to a local
        # optimum.  The reference has the same property
        # (range_estimators.py:247-256 routes golden_section through
        # scipy.optimize.minimize_scalar too).  The grid method (the default
        # everywhere in this repo) is exhaustive and immune; use
        # golden_section only for quick approximate searches.
        from scipy.optimize import minimize_scalar

        def loss_np(t):
            if t <= 0:
                return np.inf
            neg = 0.0 if one_sided else -t
            y = _quantize_with_range(qspec, x, jnp.float32(neg), jnp.float32(t))
            return float(jnp.sum((x - y) ** 2))

        res = minimize_scalar(loss_np, bounds=(step, max_search_range),
                              method="bounded")
        best = float(res.x)
        return (0.0 if one_sided else -best), best

    thresholds = step * jnp.arange(1, num_candidates + 1, dtype=jnp.float32)
    losses = _candidate_losses(qspec, x, thresholds, one_sided)
    best = float(thresholds[int(jnp.argmin(losses))])
    return (0.0 if one_sided else -best), best


class LineSearchEstimator:
    """Stateful wrapper that accumulates candidate losses across batches
    (reference: range_estimators.py:236-272 — losses sum over calls, argmin on
    the running array).  The search range is frozen on the first batch."""

    def __init__(self, qspec: QuantizerSpec, num_candidates: int = 1000,
                 range_margin: float = 0.5, expand_range: float = 10.0):
        self.qspec = qspec
        self.num_candidates = num_candidates
        self.range_margin = range_margin
        self.expand_range = expand_range
        self.loss_array = None
        self.thresholds = None
        self.one_sided = None

    def update(self, x):
        x = jnp.asarray(x, jnp.float32)
        if self.loss_array is None:
            self.one_sided = bool(jnp.min(x) >= 0)
            max_pos = max(abs(float(jnp.min(x))), float(jnp.max(x))) + self.range_margin
            step = max_pos * self.expand_range / self.num_candidates
            self.thresholds = step * jnp.arange(1, self.num_candidates + 1,
                                                dtype=jnp.float32)
            self.loss_array = jnp.zeros(self.num_candidates, jnp.float32)
        self.loss_array = self.loss_array + _candidate_losses(
            self.qspec, x, self.thresholds, self.one_sided)
        return self.current_range()

    def current_range(self):
        best = float(self.thresholds[int(jnp.argmin(self.loss_array))])
        return (0.0 if self.one_sided else -best), best
