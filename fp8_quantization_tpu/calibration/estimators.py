"""Range estimators as functional folds over calibration batches.

TPU-native redesign of the reference's stateful nn.Module estimators
(reference: quantization/range_estimators.py).  Each estimator is

    state' , (x_min, x_max, quantizer_updates) = update(spec, qspec, state, x)

where ``x`` is the *channel-major 2-D view* ``(C, N)`` of the observed tensor
(``C = 1`` for per-tensor).  State is an explicit pytree threaded by the
caller (a Flax mutable collection or a ``lax.scan`` carry), so calibration is
jit-able end to end and reductions over sharded batches become XLA collectives
for free when the input is sharded over a mesh's data axis.

The reference's four-state ``Qstates`` machine (quantization_manager.py:131-136)
becomes calibration *phases* driven by the model's ``quant_mode`` argument;
the estimator itself is stateless logic + this explicit state.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fp8_quantization_tpu.ops import fp8 as fp8_ops
from fp8_quantization_tpu.ops import uniform as uniform_ops
from fp8_quantization_tpu.ops.quantizer import QuantizerSpec

# Number of maxval candidates in the FP8 MSE grid search: linspace(0.1*absmax,
# 1.2*absmax, 111), hardcoded in the reference (range_estimators.py:305).
MSE_NUM_CANDIDATES = 111


class RangeEstimators(str, enum.Enum):
    """Reference: range_estimators.py:389-393 (+ line_search: the reference's
    LineSearchEstimator, :133-282, which its enum leaves out — exposed here as
    a first-class weight range method for capability parity)."""

    current_minmax = "current_minmax"
    allminmax = "allminmax"
    running_minmax = "running_minmax"
    MSE = "MSE"
    line_search = "line_search"


@dataclasses.dataclass(frozen=True)
class EstimatorSpec:
    kind: RangeEstimators = RangeEstimators.current_minmax
    percentile: Optional[float] = None       # current_minmax only (:57-71)
    momentum: float = 0.9                    # running_minmax only (:104)
    # MSE search-grid size (--num-candidates).  None -> the reference's
    # hardcoded 111-point linspace (range_estimators.py:306 ignores its own
    # num_candidates arg; we honor the flag when it is set explicitly).
    num_candidates: Optional[int] = None
    # line_search only (reference LineSearchEstimator defaults, :135-139)
    range_margin: float = 0.5
    expand_range: float = 10.0

    @property
    def grid_size(self) -> int:
        return self.num_candidates or MSE_NUM_CANDIDATES

    @property
    def line_search_size(self) -> int:
        # reference LineSearchEstimator default num_candidates=1000 (:135)
        return self.num_candidates or 1000

    def replace(self, **kw) -> "EstimatorSpec":
        return dataclasses.replace(self, **kw)


EstState = Dict[str, Any]


def _mbit_list(qspec: QuantizerSpec) -> tuple[float, ...]:
    """Static mantissa-bit sweep list for the MSE search.

    Reference: range_estimators.py:319-325 — ``range(1, n_bits - sign_bits)``
    with ``sign_bits`` read from the quantizer *before* any unsigned
    promotion, i.e. 1 in every reference configuration.  We keep that static
    (shapes must be trace-time constants).
    """
    if qspec.is_fp8 and qspec.mse_include_mantissa_bits:
        return tuple(float(m) for m in range(1, qspec.n_bits - 1))
    return (float(qspec.mantissa_bits),)


def init_state(spec: EstimatorSpec, qspec: QuantizerSpec,
               num_channels: int | None) -> EstState:
    """Build the estimator's carry with shapes fixed at model-build time."""
    c = num_channels if qspec.per_channel else 1
    shape = (num_channels,) if qspec.per_channel else ()
    if spec.kind in (RangeEstimators.allminmax, RangeEstimators.running_minmax):
        return {
            "xmin": jnp.zeros(shape, jnp.float32),
            "xmax": jnp.zeros(shape, jnp.float32),
            "seen": jnp.asarray(False, jnp.bool_),
        }
    if spec.kind == RangeEstimators.MSE:
        n_mbits = len(_mbit_list(qspec))
        return {
            "search_grid": jnp.zeros((spec.grid_size, c), jnp.float32),
            "mses": jnp.zeros((n_mbits, spec.grid_size, c), jnp.float32),
            "seen": jnp.asarray(False, jnp.bool_),
        }
    if spec.kind == RangeEstimators.line_search:
        return {
            "thresholds": jnp.zeros((spec.line_search_size,), jnp.float32),
            "losses": jnp.zeros((spec.line_search_size, c), jnp.float32),
            "one_sided": jnp.asarray(False, jnp.bool_),
            "seen": jnp.asarray(False, jnp.bool_),
        }
    return {}


def _maybe_squeeze(v: jax.Array, per_channel: bool) -> jax.Array:
    """(C,) for per-channel, scalar () otherwise (input view has C=1)."""
    return v if per_channel else v.reshape(())


def _current_minmax(spec: EstimatorSpec, x_cn: jax.Array, per_channel: bool):
    """Last-batch min/max, optional symmetric percentile clipping.

    Reference: range_estimators.py:56-76.
    """
    if spec.percentile:
        qs = jnp.asarray([spec.percentile, 100.0 - spec.percentile])
        lo, hi = jnp.percentile(x_cn, qs, axis=-1)
    else:
        lo = jnp.min(x_cn, axis=-1)
        hi = jnp.max(x_cn, axis=-1)
    return _maybe_squeeze(lo, per_channel), _maybe_squeeze(hi, per_channel)


def _mse_update(spec: EstimatorSpec, qspec: QuantizerSpec, state: EstState,
                x_cn: jax.Array, per_channel: bool):
    """FP8/INT MSE grid search with optional mantissa-bit sweep, vmapped.

    Reference: range_estimators.py:285-369 (FP_MSE_Estimator).  The reference's
    two nested Python loops (mantissa settings × 111 candidates, each a full
    fake-quant of the tensor) become one ``vmap`` over candidates inside a
    static unroll over the mantissa list — a single fused XLA computation.
    MSE accumulates across calibration batches in the carry, and the argmin /
    plurality vote is recomputed each batch (matching the reference, which
    returns updated ranges on every forward).
    """
    mbits_list = _mbit_list(qspec)
    x_cn = x_cn.astype(jnp.float32)

    # Per-channel search grid from the FIRST batch only (:300-316).
    absmax = jnp.maximum(jnp.abs(jnp.min(x_cn, axis=-1)),
                         jnp.abs(jnp.max(x_cn, axis=-1)))          # (C,)
    steps = jnp.linspace(0.1, 1.2, spec.grid_size)[:, None]        # (111,1)
    fresh_grid = steps * absmax[None, :]                            # (111,C)
    search_grid = jnp.where(state["seen"], state["search_grid"], fresh_grid)

    # Signedness for the search (:332).
    if qspec.allow_unsigned:
        sign_bits = jnp.where(jnp.any(x_cn < 0), 1, 0).astype(jnp.int32)
    else:
        sign_bits = jnp.asarray(1, jnp.int32)

    def mse_for_candidate(maxval_c, mbits):
        # maxval_c: (C,) -> broadcast (C,1) against x_cn (C,N)
        mv = maxval_c[:, None]
        if qspec.is_fp8:
            xq = fp8_ops.quantize_to_fp8(
                x_cn, mv, jnp.asarray(mbits, jnp.float32),
                n_bits=qspec.n_bits, sign_bits=sign_bits)
        else:
            # INT path: symmetric grid over [-maxval, maxval] (capability
            # extension; the reference MSE estimator is FP8-only).
            delta, signed = uniform_ops.symmetric_set_quant_range(
                -maxval_c * sign_bits, maxval_c, qspec.n_bits,
                scale_domain=qspec.scale_domain, eps=qspec.eps)
            xq = uniform_ops.quantize_uniform_symmetric(
                x_cn, delta[:, None], signed, qspec.n_bits,
                scale_domain=qspec.scale_domain, eps=qspec.eps)
        return jnp.mean((x_cn - xq) ** 2, axis=-1)                  # (C,)

    # Chunked sweep (round 5): a full vmap materializes all 111 candidate
    # quantizations of x at once — x111 (xM settings) of the activation
    # tensor, 137 GB for a batch-64 ResNet stem act on real inputs.
    # lax.map with a size-adaptive chunk keeps peak memory at a few copies
    # of x while computing the identical per-candidate values (the
    # line-search estimator below uses the same pattern).
    chunk = max(1, min(16, int(2e8) // max(1, x_cn.size)))
    per_mbits = [jax.lax.map(lambda mv, _m=m: mse_for_candidate(mv, _m),
                             search_grid, batch_size=chunk)
                 for m in mbits_list]
    batch_mses = jnp.stack(per_mbits)                               # (M,111,C)
    mses = state["mses"] + batch_mses

    # Plurality vote on mantissa bits across channels (:349-354).
    best_mbits_per_channel = jnp.argmin(jnp.min(mses, axis=1), axis=0)   # (C,)
    counts = jnp.sum(jax.nn.one_hot(best_mbits_per_channel, len(mbits_list)),
                     axis=0)
    best_idx = jnp.argmax(counts)
    best_mbits = jnp.take(jnp.asarray(mbits_list, jnp.float32), best_idx)

    # Best per-channel maxval for the winning mantissa setting (:356-361).
    mses_best = jnp.take(mses, best_idx, axis=0)                    # (111,C)
    cand_idx = jnp.argmin(mses_best, axis=0)                        # (C,)
    maxval = jnp.take_along_axis(search_grid, cand_idx[None, :], axis=0)[0]

    x_max = _maybe_squeeze(maxval, per_channel)
    x_min = -sign_bits.astype(jnp.float32) * x_max

    new_state = {"search_grid": search_grid, "mses": mses,
                 "seen": jnp.asarray(True, jnp.bool_)}
    q_updates = {"mantissa_bits": best_mbits} if qspec.is_fp8 else {}
    return new_state, x_min, x_max, q_updates


def _line_search_update(spec: EstimatorSpec, qspec: QuantizerSpec,
                        state: EstState, x_cn: jax.Array, per_channel: bool):
    """Per-channel 1-D grid line search over symmetric clipping thresholds.

    Reference: LineSearchEstimator._perform_1D_search
    (range_estimators.py:236-256) with ``per_channel_loss=True`` (:161-168):
    each candidate threshold quantizes the FULL tensor with one per-tensor
    range (the reference deep-copies the quantizer with per_channel=False,
    :200-207), the squared error is reduced PER CHANNEL, losses accumulate
    across calibration batches, and the argmin is taken per channel.  The
    search range is frozen on the first batch from the GLOBAL min/max
    (:209-234); the one-sided test likewise (:260-264).  The reference's
    1000-candidate Python loop becomes one ``lax.map`` on device.
    """
    from fp8_quantization_tpu.calibration.line_search import (
        _quantize_with_range)

    x_cn = x_cn.astype(jnp.float32)
    n = spec.line_search_size

    data_min = jnp.min(x_cn)
    data_max = jnp.max(x_cn)
    one_sided = jnp.where(state["seen"], state["one_sided"], data_min >= 0)
    max_pos = (jnp.maximum(jnp.abs(data_min), jnp.abs(data_max))
               + spec.range_margin)
    step = max_pos * spec.expand_range / n
    fresh = step * jnp.arange(1, n + 1, dtype=jnp.float32)
    thresholds = jnp.where(state["seen"], state["thresholds"], fresh)

    def loss(t):
        neg = jnp.where(one_sided, 0.0, -t)
        y = _quantize_with_range(qspec, x_cn, neg, t)
        return jnp.sum((x_cn - y) ** 2, axis=-1)                     # (C,)

    losses = state["losses"] + jax.lax.map(loss, thresholds, batch_size=16)

    best = jnp.argmin(losses, axis=0)                                # (C,)
    x_max = jnp.take(thresholds, best)
    x_min = jnp.where(one_sided, 0.0, -x_max)
    new_state = {"thresholds": thresholds, "losses": losses,
                 "one_sided": one_sided, "seen": jnp.asarray(True, jnp.bool_)}
    return (new_state, _maybe_squeeze(x_min, per_channel),
            _maybe_squeeze(x_max, per_channel), {})


def update(spec: EstimatorSpec, qspec: QuantizerSpec, state: EstState,
           x_cn: jax.Array) -> Tuple[EstState, jax.Array, jax.Array, Dict[str, Any]]:
    """One calibration-batch estimator step.

    Returns (new_state, x_min, x_max, quantizer_updates).  ``x_cn`` must be
    the (C, N) channel-major view; shapes of x_min/x_max are (C,) per-channel
    or () per-tensor.
    """
    per_channel = qspec.per_channel
    if spec.kind == RangeEstimators.current_minmax:
        lo, hi = _current_minmax(spec, x_cn, per_channel)
        return state, lo, hi, {}

    if spec.kind == RangeEstimators.allminmax:
        # Running global min/max (range_estimators.py:79-100).  With the batch
        # sharded over a mesh data axis, jnp.min/max over a global array makes
        # XLA emit the cross-device reduction — multi-host calibration for free.
        lo = _maybe_squeeze(jnp.min(x_cn, axis=-1), per_channel)
        hi = _maybe_squeeze(jnp.max(x_cn, axis=-1), per_channel)
        lo = jnp.where(state["seen"], jnp.minimum(state["xmin"], lo), lo)
        hi = jnp.where(state["seen"], jnp.maximum(state["xmax"], hi), hi)
        new = {"xmin": lo, "xmax": hi, "seen": jnp.asarray(True, jnp.bool_)}
        return new, lo, hi, {}

    if spec.kind == RangeEstimators.running_minmax:
        # EMA with momentum 0.9 (range_estimators.py:103-125).  Under global
        # sharded arrays each EMA step sees the full global batch, which gives
        # the multi-host run a well-defined order (SURVEY.md §7 hard parts).
        lo = _maybe_squeeze(jnp.min(x_cn, axis=-1), per_channel)
        hi = _maybe_squeeze(jnp.max(x_cn, axis=-1), per_channel)
        m = spec.momentum
        lo = jnp.where(state["seen"], (1 - m) * lo + m * state["xmin"], lo)
        hi = jnp.where(state["seen"], (1 - m) * hi + m * state["xmax"], hi)
        new = {"xmin": lo, "xmax": hi, "seen": jnp.asarray(True, jnp.bool_)}
        return new, lo, hi, {}

    if spec.kind == RangeEstimators.MSE:
        return _mse_update(spec, qspec, state, x_cn, per_channel)

    if spec.kind == RangeEstimators.line_search:
        return _line_search_update(spec, qspec, state, x_cn, per_channel)

    raise ValueError(f"unknown estimator kind {spec.kind}")
