"""Gradient-estimator rounding primitives (STE family).

TPU-native counterparts of the reference's autograd.Function rounding ops
(reference: quantization/quantizers/rounding_utils.py:12-162).  Each is a pure
function; straight-through behaviour is expressed with ``stop_gradient``
identities or ``jax.custom_vjp`` where the backward is not an identity.

``jnp.round`` rounds half-to-even, matching ``torch.round`` semantics exactly,
which matters for bit-exact parity on grid midpoints.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp


@jax.custom_vjp
def round_ste(x: jax.Array) -> jax.Array:
    """Round-to-nearest-even with a straight-through gradient.

    Reference: rounding_utils.py:12-19 (RoundStraightThrough).  Implemented
    as a ``custom_vjp`` whose primal is a bare ``round`` — the algebraic form
    ``x + stop_grad(round(x) - x)`` left an unfusable 3-op chain (round,
    subtract, add, each a full HBM pass over the activation tensor) in every
    inference graph; the round-1 profile showed 29 standalone
    subtract+round pairs at the ENTRY level of the ResNet-18 step.
    """
    return jnp.round(x)


round_ste.defvjp(lambda x: (jnp.round(x), None), lambda _, g: (g,))


@jax.custom_vjp
def floor_ste(x: jax.Array) -> jax.Array:
    """Floor with straight-through gradient."""
    return jnp.floor(x)


floor_ste.defvjp(lambda x: (jnp.floor(x), None), lambda _, g: (g,))


@jax.custom_vjp
def stochastic_round_ste(x: jax.Array, key: jax.Array) -> jax.Array:
    """floor(x + U[0,1)) with a straight-through gradient.

    Reference: rounding_utils.py:22-31 (StochasticRoundSTE).  The reference
    samples torch.rand_like; here the PRNG key is explicit.
    """
    noise = jax.random.uniform(key, x.shape, x.dtype)
    return jnp.floor(x + noise)


stochastic_round_ste.defvjp(
    lambda x, key: (jnp.floor(x + jax.random.uniform(key, x.shape, x.dtype)),
                    None),
    lambda _, g: (g, None))


@jax.custom_vjp
def scale_gradient(x: jax.Array, scale) -> jax.Array:
    """Identity forward; gradient multiplied by ``scale`` on backward.

    Reference: rounding_utils.py:34-42 (ScaleGradient).  Used for LSQ
    gradient scaling of delta/zero_point.
    """
    return x


scale_gradient.defvjp(lambda x, scale: (x, scale),
                      lambda scale, g: (g * scale, None))


@partial(jax.custom_vjp, nondiff_argnums=())
def ewgs_round(x: jax.Array, scaling_factor: jax.Array) -> jax.Array:
    """Element-wise gradient scaling discretizer (EWGS).

    Forward: round(x).  Backward: g * (1 + delta * sign(g) * (x - round(x))).
    Reference: rounding_utils.py:45-64 (EWGSFunctional).
    """
    return jnp.round(x)


def _ewgs_fwd(x, scaling_factor):
    x_int = jnp.round(x)
    return x_int, (x - x_int, scaling_factor)


def _ewgs_bwd(res, g):
    diff, delta = res
    scale = 1.0 + delta * jnp.sign(g) * diff
    return (g * scale, jnp.zeros_like(delta))


ewgs_round.defvjp(_ewgs_fwd, _ewgs_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def stacked_sigmoid_round(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Round forward; stacked-sigmoid surrogate gradient backward.

    Reference: rounding_utils.py:67-87 (StackSigmoidFunctional).
    """
    return jnp.round(x)


def _ss_fwd(x, alpha):
    return jnp.round(x), (x, alpha)


def _ss_bwd(res, g):
    x, alpha = res
    sig_min = jax.nn.sigmoid(alpha / 2.0)
    sig_scale = 1.0 - 2.0 * sig_min
    x_base = jnp.floor(x)
    x_rest = x - x_base - 0.5
    s = jax.nn.sigmoid(x_rest * -alpha)
    grad = s * (1.0 - s) * -alpha / sig_scale
    return (grad * g, jnp.zeros_like(alpha))


stacked_sigmoid_round.defvjp(_ss_fwd, _ss_bwd)


class GradientEstimator(str, enum.Enum):
    """Reference: rounding_utils.py:158-162."""

    ste = "ste"
    stoch_round = "stoch_round"
    ewgs = "ewgs"
    stacked_sigmoid = "stacked_sigmoid"


def make_discretizer(estimator: GradientEstimator | str, *, scaling_factor: float = 0.2,
                     alpha: float = 1.0, key: jax.Array | None = None, training: bool = False):
    """Return a unary rounding fn for the given gradient estimator.

    ``stoch_round`` uses stochastic rounding in training and round-to-nearest
    in eval (reference: rounding_utils.py:140-148).
    """
    estimator = GradientEstimator(estimator)
    if estimator == GradientEstimator.ste:
        return round_ste
    if estimator == GradientEstimator.stoch_round:
        if training:
            if key is None:
                raise ValueError("stoch_round requires a PRNG key in training mode")
            return lambda x: stochastic_round_ste(x, key)
        return round_ste
    if estimator == GradientEstimator.ewgs:
        return lambda x: ewgs_round(x, jnp.asarray(scaling_factor, jnp.float32))
    if estimator == GradientEstimator.stacked_sigmoid:
        return lambda x: stacked_sigmoid_round(x, jnp.asarray(alpha, jnp.float32))
    raise ValueError(f"unknown gradient estimator: {estimator}")
