"""Uniform (INT) affine quantizers as pure JAX functions.

Functional counterparts of the reference's AsymmetricUniformQuantizer /
SymmetricUniformQuantizer (reference: quantization/quantizers/uniform_quantizers.py).
State (delta, zero_float, signed) lives in explicit pytrees owned by the
caller; ``delta``/``zero_float`` must already broadcast against ``x``
(per-channel shaping is the caller's job, mirroring the central-convention
design decision in SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.ops.rounding import round_ste, scale_gradient

_EPS = 1e-8


def _scale_from_delta(delta, scale_domain: str, eps: float = _EPS):
    """Reference: uniform_quantizers.py:87-92."""
    if scale_domain == "linear":
        return jnp.clip(delta, eps, None)
    if scale_domain == "log":
        return jnp.exp(delta)
    raise ValueError(f"scale_domain must be 'linear' or 'log', got {scale_domain}")


def asymmetric_int_bounds(n_bits: int):
    """int grid [0, 2^n - 1].  Reference: uniform_quantizers.py:77-85."""
    return 0.0, 2.0 ** n_bits - 1.0


def symmetric_int_bounds(n_bits: int, signed):
    """int grid [-2^(n-1), 2^(n-1)-1] if signed else [0, 2^n - 1].

    ``signed`` may be traced (0/1).  Reference: uniform_quantizers.py:290-297.
    """
    signed_f = jnp.asarray(signed, jnp.float32)
    int_min = jnp.where(signed_f > 0, -(2.0 ** (n_bits - 1)), 0.0)
    int_max = 2.0 ** (float(n_bits) - signed_f) - 1.0
    return int_min, int_max


def lsq_grad_scale(x: jax.Array, int_max, per_channel: bool, channel_axis: int = -1):
    """LSQ gradient scale (Qp * numel)^-1/2.

    In the per-channel case gradients are not summed over the channel axis, so
    the element count excludes it.  The reference hardcodes channel dim 0
    (torch OIHW, uniform_quantizers.py:166-173); ours defaults to the last
    axis (JAX HWIO kernels) and is overridable.
    """
    num_elements = float(np.prod(x.shape))
    if per_channel and x.ndim:
        num_elements /= x.shape[channel_axis]
    return (int_max * num_elements) ** -0.5


def quantize_uniform_asymmetric(x, delta, zero_float, n_bits: int, *,
                                scale_domain: str = "linear", eps: float = _EPS,
                                grad_scaling: bool = False, per_channel: bool = False,
                                channel_axis: int = -1, discretizer=round_ste):
    """Asymmetric fake-quant: scale * (clip(round(x/scale) + zp) - zp).

    Reference: uniform_quantizers.py:108-164 (to_integer_forward + forward).
    """
    int_min, int_max = asymmetric_int_bounds(n_bits)
    scale = _scale_from_delta(delta, scale_domain, eps)
    zero_point = jnp.clip(discretizer(zero_float), int_min, int_max)
    if grad_scaling:
        gs = lsq_grad_scale(x, int_max, per_channel, channel_axis)
        scale = scale_gradient(scale, gs)
        zero_point = scale_gradient(zero_point, gs)
    x_int = discretizer(x / scale) + zero_point
    x_int = jnp.clip(x_int, int_min, int_max)
    return scale * (x_int - zero_point)


def quantize_uniform_symmetric(x, delta, signed, n_bits: int, *,
                               scale_domain: str = "linear", eps: float = _EPS,
                               grad_scaling: bool = False, per_channel: bool = False,
                               channel_axis: int = -1, discretizer=round_ste):
    """Symmetric fake-quant (zero_point = 0).

    Reference: uniform_quantizers.py:259-331.
    """
    int_min, int_max = symmetric_int_bounds(n_bits, signed)
    scale = _scale_from_delta(delta, scale_domain, eps)
    if grad_scaling:
        scale = scale_gradient(scale, lsq_grad_scale(x, int_max, per_channel, channel_axis))
    x_int = discretizer(x / scale)
    x_int = jnp.clip(x_int, int_min, int_max)
    return scale * x_int


def tensorize_min_max(x_min, x_max, eps: float = _EPS):
    """Clamp the estimated range to include zero and avoid zero width.

    Reference: uniform_quantizers.py:189-218 (_tensorize_min_max).
    """
    x_min = jnp.minimum(jnp.asarray(x_min, jnp.float32), 0.0)
    x_max = jnp.maximum(jnp.asarray(x_max, jnp.float32), eps)
    return x_min, x_max


def asymmetric_set_quant_range(x_min, x_max, n_bits: int, *,
                               scale_domain: str = "linear", eps: float = _EPS):
    """(delta, zero_float) from a range.  Reference: uniform_quantizers.py:220-240."""
    x_min, x_max = tensorize_min_max(x_min, x_max, eps)
    _, int_max = asymmetric_int_bounds(n_bits)
    delta = (x_max - x_min) / int_max
    zero_float = jax.lax.stop_gradient(-x_min / delta)
    if scale_domain == "log":
        delta = jnp.log(delta)
    return jax.lax.stop_gradient(delta), zero_float


def symmetric_set_quant_range(x_min, x_max, n_bits: int, *,
                              scale_domain: str = "linear", eps: float = _EPS):
    """(delta, signed) from a range.  Reference: uniform_quantizers.py:303-314.

    ``signed`` is a traced 0/1 int32 (signedness is a property of the whole
    tensor: min over channels, matching ``x_min.min() < 0``).
    """
    x_min, x_max = tensorize_min_max(x_min, x_max, eps)
    signed = (jnp.min(x_min) < 0).astype(jnp.int32)
    _, int_max = symmetric_int_bounds(n_bits, signed)
    x_absmax = jnp.maximum(jnp.abs(x_min), x_max)
    delta = x_absmax / int_max
    if scale_domain == "log":
        delta = jnp.log(delta)
    return jax.lax.stop_gradient(delta), signed


def symmetric_grid(delta: float, signed: bool, n_bits: int,
                   scale_domain: str = "linear") -> np.ndarray:
    """Enumerate the symmetric INT lattice (host-side; analytical subsystem).

    Reference: uniform_quantizers.py:328-331 (generate_grid).
    """
    signed = bool(signed)
    int_min = -(2.0 ** (n_bits - 1)) if signed else 0.0
    int_max = 2.0 ** (n_bits - int(signed)) - 1.0
    scale = np.exp(delta) if scale_domain == "log" else max(float(delta), _EPS)
    return scale * np.arange(int_min, int_max + 1)
