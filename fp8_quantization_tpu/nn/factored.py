"""Cross-layer factored activations: the fast inference interchange format.

The reference's hot path fake-quantizes every activation tensor to full-scale
fp32 values between layers (fp8_quantizer.py:91-133 around hijacker.py:70-86),
so each layer boundary costs a full fp32 HBM round trip plus a *lossy* cast
when the next matmul runs in bf16.  Round-1 profiling (RESULTS.md ablation)
showed this activation fake-quant chain is the dominant quantization tax
(~2.5 ms of a ~10 ms ResNet-18 step).

The TPU-native fix: a fake-quantized tensor is exactly ``norm * factor`` where

  * ``norm``    — the value on the quantizer's *normalized* grid: an
                  <=8-significand-bit number (FP8: (M+1)-bit mantissa times a
                  power of two; INT: the bare integer) — EXACT in bfloat16;
  * ``factor``  — a per-tensor fp32 scalar (act quantizers are per-tensor).

Layers therefore exchange ``Factored(norm=bf16, factor=f32)`` pairs in
``mode='fixed'`` under the bf16/pallas engines:

  * layer N's output-quant epilogue (BN -> act -> quantize) fuses into ONE
    XLA fusion that writes *bf16* — half the HBM traffic of the fp32 path;
  * layer N+1 feeds ``norm`` straight to the MXU (zero-loss: the round-1
    bf16 engine cast full-scale fake-quant values to bf16, a ~2^-9 lossy
    cast; VERDICT.md weak point 3) and multiplies ``factor`` into its own
    output before BN/bias — scalars commute through convolutions.

Residual adds, max pools and mean pools have factored-aware helpers below;
anything else just calls :func:`materialize`.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


class Factored(NamedTuple):
    """A fake-quantized tensor in normalized form: value == norm * factor."""

    norm: jax.Array      # bfloat16 (or an IEEE f8 dtype under the store_f8
                         # deployment mode), values on the normalized grid
    factor: jax.Array    # float32 scalar (per-tensor activation quantizers)


class PrequantS8(NamedTuple):
    """An activation pre-quantized onto its CONSUMER's asymmetric-uniform
    grid by the PRODUCER's epilogue — the int8-datapath dual of Factored.

    The XLA s8 route (ops/int8.py) otherwise runs each layer's quant
    prologue as a standalone HBM pass: re-read the bf16 interchange
    tensor, round/clip/cast, write s8 (measured 14.1 ms of ViT-S/16's
    38 ms batch-128 int8 step, RESULTS.md round 4).  When the producer
    already has the tensor in registers — an LN fusion, the previous
    int8 matmul's dequant epilogue — it computes the consumer's prologue
    there for free and writes ONE-byte s8 instead of two-byte bf16.

    value == (xs8 + 128 - round(zero)) * delta, elementwise exact vs the
    consumer-side prologue on the same input (ops/int8.prequant_s8 and
    the int8_matmul/int8_conv prologues share ``_act_int_params``).
    """

    xs8: jax.Array    # int8, recentered: clip(round(x/delta)+zp, 0, 2^b-1)-128
    delta: jax.Array  # f32 scalar — the consumer act quantizer's step
    zero: jax.Array   # f32 scalar — the consumer act quantizer's zero point
    bits: float       # static Python float — the consumer act quantizer's
                      # bit width (static: it sizes clip bounds at trace time)


def storage_dtype(norm: jax.Array) -> jax.Array:
    """Normalized-grid storage convention: keep 1-byte (IEEE f8) arrays as-is
    (the store_f8 deployment mode, ops/fp8.fp8_quantize_cast), bf16 otherwise.
    Every consumer upcasts to bf16/f32 at its matmul — an exact, fusable
    convert in both cases."""
    if norm.dtype.itemsize == 1:
        return norm
    return norm.astype(jnp.bfloat16)


MaybeFactored = Union[jax.Array, Factored]


def is_factored(x: Any) -> bool:
    return isinstance(x, Factored)


def split(x: MaybeFactored) -> Tuple[jax.Array, Optional[jax.Array]]:
    """(operand, factor_or_None) — the layer-entry unpacking."""
    if isinstance(x, Factored):
        return x.norm, x.factor
    return x, None


def materialize(x: MaybeFactored) -> jax.Array:
    """Full-scale fp32 value (the fake-quantized tensor the reference passes)."""
    if isinstance(x, Factored):
        return x.norm.astype(jnp.float32) * x.factor
    if isinstance(x, PrequantS8):
        # (xs8 + 128 - zp) * delta: the real value on the consumer grid.
        # Fallback only — int8-routed consumers feed xs8 to the MXU directly.
        from fp8_quantization_tpu.ops.int8 import _act_int_params
        delta, zp = _act_int_params(x.delta, x.zero, float(x.bits))
        return (x.xs8.astype(jnp.float32) + (128.0 - zp)) * delta
    return x


def fadd(a: MaybeFactored, b: MaybeFactored) -> jax.Array:
    """Residual add in fp32 (reference adds full-scale values,
    resnet_quantized.py:39-46).  Fuses with the consumer's requantization."""
    return materialize(a) + materialize(b)


def fmax_pool(x: MaybeFactored, window_shape, strides=None,
              padding="VALID") -> MaybeFactored:
    """Max pool that stays factored: factor > 0, so max commutes with it."""
    if isinstance(x, Factored):
        # f8-stored norms upcast first (exact): keeps the pool on a dtype
        # every backend reduces natively; the convert fuses into the pool.
        norm = (x.norm.astype(jnp.bfloat16) if x.norm.dtype.itemsize == 1
                else x.norm)
        return Factored(nn.max_pool(norm, window_shape, strides=strides,
                                    padding=padding), x.factor)
    return nn.max_pool(x, window_shape, strides=strides, padding=padding)


def fmean(x: MaybeFactored, axis: Sequence[int]) -> jax.Array:
    """Mean pool to a full-scale fp32 value (the result is off-grid anyway;
    the zoo requantizes it with the tied quantizer, resnet_quantized.py:84-89)."""
    return jnp.mean(materialize(x) if isinstance(x, Factored) else x, axis=axis)
