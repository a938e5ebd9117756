"""Unified functional quantizer: static spec + state pytree + pure transforms.

This replaces the reference's ``QuantizerBase`` nn.Module hierarchy
(reference: quantization/quantizers/base_quantizers.py:8-47) and the mutable
buffer dance (lazy shapes, parameter<->buffer promotion) with:

  * ``QuantizerSpec``   — hashable static config (method, n_bits, per_channel, ...)
  * state dict          — a pytree of arrays: the quantization parameters
                          (maxval/mantissa_bits/sign_bits for FP8,
                           delta/signed or delta/zero_float for INT)
  * ``init_state``      — build state with shapes known at model-build time
  * ``apply``           — fake-quant ``x`` with the state (pure, differentiable)
  * ``set_quant_range`` — new state from an estimated (x_min, x_max) range

Per-channel convention: state arrays are stored 1-D ``(C,)`` (or scalar for
per-tensor) and broadcast-reshaped against ``x`` along ``channel_axis`` inside
``apply``.  JAX conv kernels are HWIO, so weight quantizers use
``channel_axis=-1``; the reference's dim-0 convention (and its transposed-conv
transpose trick, autoquant_utils.py:46-58) is handled centrally here.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.ops import fp8 as fp8_ops
from fp8_quantization_tpu.ops import uniform as uniform_ops
from fp8_quantization_tpu.ops.rounding import round_ste


class QMethod(str, enum.Enum):
    """Reference: quantization/quantization_manager.py:22-25 (QMethods)."""

    symmetric_uniform = "symmetric_uniform"
    asymmetric_uniform = "asymmetric_uniform"
    fp_quantizer = "fp_quantizer"


@dataclasses.dataclass(frozen=True)
class QuantizerSpec:
    """Static (hashable, trace-time) quantizer configuration.

    Mirrors the constructor kwargs of the reference quantizers
    (fp8_quantizer.py:156-192, uniform_quantizers.py:29-52).
    """

    method: QMethod = QMethod.fp_quantizer
    n_bits: int = 8
    per_channel: bool = False
    scale_domain: str = "linear"
    grad_scaling: bool = False
    eps: float = 1e-8
    # FP8-specific (ignored for uniform methods):
    mantissa_bits: int = 4
    maxval: float | None = None          # None -> format default maxval
    set_maxval: bool = False
    learn_maxval: bool = False
    learn_mantissa_bits: bool = False
    mse_include_mantissa_bits: bool = True
    allow_unsigned: bool = False
    # Deployment fast path: evaluate the fixed-mode FP8 fake-quant as one
    # saturating hardware cast to an IEEE f8 dtype (ops/fp8.fp8_quantize_cast)
    # — ~3x fewer VPU ops per element; numerics identical except the lowest
    # binade (bound pinned in tests/test_cast_quant.py).  Opt-in.
    cast_fastpath: bool = False
    # Deployment storage mode (activation quantizers, implies cast_fastpath):
    # factored outputs are stored as the IEEE f8 ARRAY itself — 1 byte/elem,
    # upconvert fuses into every consumer (tools/probe_dw_fusion.py) — so
    # inter-layer activation HBM traffic halves vs bf16.  Values below the
    # f8 smallest_normal coarsen to the IEEE subnormal grid (2x the paper
    # grid's bottom step); model delta pinned in tests.  Opt-in.
    store_f8: bool = False
    # Deployment rounding mode (requires cast_fastpath): the saturating
    # cast IS the whole quantizer — values identical to store_f8 (the
    # <=1.6%-of-maxval sub-smallest-normal region coarsens to the IEEE
    # subnormal grid) but stored bf16, dropping the magic/select subnormal
    # fixup whose SELECT breaks conv-into-conv fusion nesting
    # (tools/probe_dw_fusion.py).  Opt-in.
    cast_ieee_subnorm: bool = False
    # QAT gradient estimator for the rounding op (rounding_utils.py:158-162):
    # "ste" | "stoch_round" | "ewgs" | "stacked_sigmoid"
    grad_estimator: str = "ste"
    ewgs_scaling: float = 0.2
    ss_alpha: float = 1.0

    def replace(self, **kw) -> "QuantizerSpec":
        return dataclasses.replace(self, **kw)

    @property
    def is_fp8(self) -> bool:
        return self.method == QMethod.fp_quantizer


QuantState = Dict[str, Any]


def init_state(spec: QuantizerSpec, num_channels: int | None = None) -> QuantState:
    """Initial quantizer state; shapes fixed at build time (no lazy buffers).

    ``num_channels`` is required iff ``spec.per_channel``.
    """
    shape = (num_channels,) if spec.per_channel else ()
    if num_channels is None and spec.per_channel:
        raise ValueError("per_channel quantizer needs num_channels at init")

    if spec.is_fp8:
        maxval0 = spec.maxval if spec.maxval is not None else (
            fp8_ops.default_fp8_maxval(spec.mantissa_bits, spec.n_bits))
        return {
            "maxval": jnp.full(shape, maxval0, jnp.float32),
            "mantissa_bits": jnp.asarray(float(spec.mantissa_bits), jnp.float32),
            "sign_bits": jnp.asarray(1, jnp.int32),
            "initialized": jnp.asarray(spec.maxval is not None or not spec.set_maxval,
                                       jnp.bool_),
        }
    if spec.method == QMethod.symmetric_uniform:
        return {
            "delta": jnp.ones(shape, jnp.float32),
            "signed": jnp.asarray(1, jnp.int32),
            "initialized": jnp.asarray(False, jnp.bool_),
        }
    if spec.method == QMethod.asymmetric_uniform:
        return {
            "delta": jnp.ones(shape, jnp.float32),
            "zero_float": jnp.zeros(shape, jnp.float32),
            "initialized": jnp.asarray(False, jnp.bool_),
        }
    raise ValueError(f"unknown method {spec.method}")


def _broadcast(param: jax.Array, x_ndim: int, channel_axis: int) -> jax.Array:
    """Reshape a 1-D per-channel param to broadcast against x (rank x_ndim)."""
    if param.ndim == 0 or x_ndim <= 1:
        return param
    axis = channel_axis % x_ndim
    shape = [1] * x_ndim
    shape[axis] = param.shape[0]
    return param.reshape(shape)


def apply(spec: QuantizerSpec, state: QuantState, x: jax.Array, *,
          channel_axis: int = -1, discretizer=round_ste) -> jax.Array:
    """Fake-quantize ``x`` (quantize -> dequantize round trip)."""
    if spec.is_fp8:
        maxval = _broadcast(state["maxval"], x.ndim, channel_axis)
        return fp8_ops.quantize_to_fp8(
            x, maxval, state["mantissa_bits"], n_bits=spec.n_bits,
            sign_bits=state["sign_bits"], discretizer=discretizer)
    if spec.method == QMethod.symmetric_uniform:
        delta = _broadcast(state["delta"], x.ndim, channel_axis)
        return uniform_ops.quantize_uniform_symmetric(
            x, delta, state["signed"], spec.n_bits, scale_domain=spec.scale_domain,
            eps=spec.eps, grad_scaling=spec.grad_scaling,
            per_channel=spec.per_channel, channel_axis=channel_axis,
            discretizer=discretizer)
    if spec.method == QMethod.asymmetric_uniform:
        delta = _broadcast(state["delta"], x.ndim, channel_axis)
        zero_float = _broadcast(state["zero_float"], x.ndim, channel_axis)
        return uniform_ops.quantize_uniform_asymmetric(
            x, delta, zero_float, spec.n_bits, scale_domain=spec.scale_domain,
            eps=spec.eps, grad_scaling=spec.grad_scaling,
            per_channel=spec.per_channel, channel_axis=channel_axis,
            discretizer=discretizer)
    raise ValueError(f"unknown method {spec.method}")


def apply_factored(spec: QuantizerSpec, state: QuantState, x: jax.Array, *,
                   channel_axis: int = -1, discretizer=round_ste):
    """Fake-quantize onto the *normalized* grid: returns ``(x_norm, factor)``
    with ``fake_quant(x) == x_norm * factor`` and ``x_norm`` EXACT in
    bfloat16 (an <=8-bit-significand value).

    This is the engine decomposition (nn/layers.py engine='bf16'/'pallas'):
    the matmul runs on ``x_norm`` in bf16 at 2x fp32 MXU rate with zero
    added error; ``factor`` (per-channel or scalar) folds into the epilogue.
    """
    if spec.is_fp8:
        maxval = _broadcast(state["maxval"], x.ndim, channel_axis)
        sign_bits_f = jnp.asarray(state["sign_bits"], jnp.float32)
        M = jnp.clip(round_ste(state["mantissa_bits"]), 1.0,
                     float(spec.n_bits) - sign_bits_f)
        x_norm = fp8_ops.quantize_to_fp8(
            x, maxval, state["mantissa_bits"], n_bits=spec.n_bits,
            sign_bits=state["sign_bits"], discretizer=discretizer,
            normalized=True)
        return x_norm, maxval / (2.0 - 2.0 ** -M)
    if spec.method == QMethod.symmetric_uniform:
        delta = _broadcast(state["delta"], x.ndim, channel_axis)
        scale = uniform_ops._scale_from_delta(delta, spec.scale_domain, spec.eps)
        int_min, int_max = uniform_ops.symmetric_int_bounds(
            spec.n_bits, state["signed"])
        x_norm = jnp.clip(discretizer(x / scale), int_min, int_max)
        return x_norm, scale
    if spec.method == QMethod.asymmetric_uniform:
        delta = _broadcast(state["delta"], x.ndim, channel_axis)
        zero_float = _broadcast(state["zero_float"], x.ndim, channel_axis)
        scale = uniform_ops._scale_from_delta(delta, spec.scale_domain, spec.eps)
        int_min, int_max = uniform_ops.asymmetric_int_bounds(spec.n_bits)
        zp = jnp.clip(jnp.round(zero_float), int_min, int_max)
        x_int = jnp.clip(discretizer(x / scale) + zp, int_min, int_max)
        return x_int - zp, scale
    raise ValueError(f"unknown method {spec.method}")


def fixed_consts(spec: QuantizerSpec, state: QuantState) -> QuantState | None:
    """Freeze-time scalar precomputation for the fixed-mode fast path.

    FP8 only: the uniform quantizers derive ~3 scalars per call, but the FP8
    quantizer derives ~20 (bias/exponent algebra) — per-forward that left
    hundreds of unfused scalar ops in the compiled step (see
    fp8_ops.fp8_fixed_consts).  Returns None when there is nothing worth
    preparing.
    """
    if spec.is_fp8:
        consts = fp8_ops.fp8_fixed_consts(
            state["maxval"], state["mantissa_bits"], n_bits=spec.n_bits,
            sign_bits=state["sign_bits"])
        if spec.cast_fastpath:
            cast = fp8_ops.fp8_cast_consts(
                state["maxval"], state["mantissa_bits"], n_bits=spec.n_bits,
                sign_bits=state["sign_bits"])
            if cast is not None:
                consts.update(cast)
        return consts
    return None


def apply_prepared(spec: QuantizerSpec, consts: QuantState, x: jax.Array, *,
                   channel_axis: int = -1, discretizer=round_ste,
                   factored: bool = False):
    """Fixed-mode fake-quant from prepared consts (bit-exact vs apply/
    apply_factored on the same state; elementwise-only graph)."""
    assert spec.is_fp8, "prepared path is FP8-only"
    c = {k: _broadcast(v, x.ndim, channel_axis) for k, v in consts.items()}
    if spec.cast_fastpath and "cast_probe" in consts:
        if factored:
            return (fp8_ops.fp8_quantize_cast(
                        x, c, normalized=True, store_f8=spec.store_f8,
                        ieee_subnorm=spec.cast_ieee_subnorm),
                    c["cast_scale"])
        return fp8_ops.fp8_quantize_cast(
            x, c, ieee_subnorm=spec.cast_ieee_subnorm)
    if factored:
        x_norm = fp8_ops.fp8_quantize_prepared(
            x, c, normalized=True, discretizer=discretizer)
        return x_norm, c["factor"]
    return fp8_ops.fp8_quantize_prepared(x, c, discretizer=discretizer)


def set_quant_range(spec: QuantizerSpec, state: QuantState, x_min, x_max) -> QuantState:
    """New state with ranges set from (x_min, x_max) (1-D per-channel or scalar).

    Reference: fp8_quantizer.py:222-240, uniform_quantizers.py:220-240,303-314.
    """
    new = dict(state)
    if spec.is_fp8:
        maxval, sign_bits = fp8_ops.fp8_set_quant_range(
            x_min, x_max, allow_unsigned=spec.allow_unsigned)
        if spec.set_maxval:
            new["maxval"] = jnp.broadcast_to(
                maxval.astype(jnp.float32), state["maxval"].shape)
        # signedness is updated even when set_maxval is False
        # (reference fp8_quantizer.py:222-227: _make_unsigned happens first)
        new["sign_bits"] = sign_bits
    elif spec.method == QMethod.symmetric_uniform:
        delta, signed = uniform_ops.symmetric_set_quant_range(
            x_min, x_max, spec.n_bits, scale_domain=spec.scale_domain, eps=spec.eps)
        new["delta"] = jnp.broadcast_to(delta.astype(jnp.float32), state["delta"].shape)
        new["signed"] = signed
    elif spec.method == QMethod.asymmetric_uniform:
        delta, zero_float = uniform_ops.asymmetric_set_quant_range(
            x_min, x_max, spec.n_bits, scale_domain=spec.scale_domain, eps=spec.eps)
        new["delta"] = jnp.broadcast_to(delta.astype(jnp.float32), state["delta"].shape)
        new["zero_float"] = jnp.broadcast_to(
            zero_float.astype(jnp.float32), state["zero_float"].shape)
    else:
        raise ValueError(f"unknown method {spec.method}")
    new["initialized"] = jnp.asarray(True, jnp.bool_)
    return new


def trainable_param_names(spec: QuantizerSpec) -> tuple[str, ...]:
    """Which state entries become trainable in QAT's learn-ranges phase.

    Reference: fp8_quantizer.py:242-254 (make_range_trainable),
    uniform_quantizers.py:242-246,316-319.
    """
    if spec.is_fp8:
        names = []
        if spec.learn_maxval:
            names.append("maxval")
        if spec.learn_mantissa_bits:
            names.append("mantissa_bits")
        return tuple(names)
    if spec.method == QMethod.symmetric_uniform:
        return ("delta",)
    return ("delta", "zero_float")


def quantizer_grid(spec: QuantizerSpec, state: QuantState) -> np.ndarray:
    """Host-side enumeration of the current quantization grid (test oracle /
    analytical subsystem).  Per-tensor state only."""
    if spec.is_fp8:
        mbits = int(np.round(np.asarray(state["mantissa_bits"])))
        sign_bits = int(np.asarray(state["sign_bits"]))
        mbits = int(np.clip(mbits, 1, spec.n_bits - sign_bits))
        ebits = spec.n_bits - sign_bits - mbits
        default_bias = 2 ** (ebits - 1)
        maxval = float(np.asarray(state["maxval"]).reshape(-1)[0])
        return fp8_ops.generate_all_float_values_scaled(
            spec.n_bits, ebits, default_bias, maxval)
    if spec.method == QMethod.symmetric_uniform:
        return uniform_ops.symmetric_grid(
            float(np.asarray(state["delta"]).reshape(-1)[0]),
            bool(np.asarray(state["signed"])), spec.n_bits, spec.scale_domain)
    # asymmetric
    delta = float(np.asarray(state["delta"]).reshape(-1)[0])
    zf = float(np.asarray(state["zero_float"]).reshape(-1)[0])
    int_min, int_max = 0.0, 2.0 ** spec.n_bits - 1.0
    zp = np.clip(np.round(zf), int_min, int_max)
    scale = np.exp(delta) if spec.scale_domain == "log" else max(delta, spec.eps)
    return scale * (np.arange(int_min, int_max + 1) - zp)
