"""XLA-native int8 convolution / matmul datapath.

The TPU MXU multiplies s8 x s8 -> s32 at twice its bf16 rate, and XLA
lowers integer convolutions and dots onto it natively — with the quantize
prologue and dequant/affine epilogue fused into the surrounding program by
the compiler.  Measured on a v5e at ResNet-18 block shapes (batch 512),
this path beats both the bf16 conv it replaces AND the hand-written Pallas
im2col int8 kernel (ops/pallas/qconv._qconv3x3_int8_kernel), which loses
to it at every probed shape: XLA's hierarchical conv tiling is stronger
than a per-group im2col for MXU-bound convs, so the Pallas kernel stays
behind its measured autotune gate while THIS is the default s8 route.

Numerics: identical to the fake-quant reference chain
(uniform_quantizers.py:108-164 asym act x symmetric weights) by
construction — the integer sum is exact in s32 (|acc| <= 9*512*128*127
~ 7.5e7 << 2^31) and only the final f32 dequant multiply rounds.

Recentered-grid identity (same as the Pallas kernel's, qconv.py:281-289):

    sum (xint - zp) * wint  ==  dot(xs, wsg)              xs  = xint - 128
                              + S_w * rowsum(xs)          wsg = wint - S_w
                              + (128 - zp) * colsum(wsg)
                              + K * (128 - zp) * S_w      K = taps * cin

with padded positions holding xs = zp - 128 (the real-domain zero), so
each padded tap contributes exactly zero to the true sum and the identity
holds per output element at any stride.  S_w = 128*(1 - signed) recenters
an unsigned weight grid into s8; ``wsg`` is exactly what
ops/pallas/qmatmul.int8_shifted_grid produces and nn/bake.py stores.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax


def _act_int_params(a_delta, a_zero, a_bits: float):
    delta = jnp.maximum(a_delta, 1e-8)
    zp = jnp.clip(jnp.round(a_zero), 0.0, 2.0 ** a_bits - 1.0)
    return delta, zp


def prequant_s8(x: jax.Array, a_delta: jax.Array, a_zero: jax.Array,
                a_bits: float) -> jax.Array:
    """Producer-side quant prologue: x -> the recentered s8 grid.

    Elementwise identical to the prologues inside int8_matmul/int8_conv
    (shared ``_act_int_params``); run in the PRODUCER's epilogue fusion so
    the consumer reads 1-byte s8 instead of re-reading a 2-byte bf16
    interchange tensor through a standalone round/clip/cast pass (the
    nn/factored.PrequantS8 protocol).
    """
    delta, zp = _act_int_params(a_delta, a_zero, float(a_bits))
    xint = jnp.clip(jnp.round(x.astype(jnp.float32) / delta) + zp,
                    0.0, 2.0 ** float(a_bits) - 1.0)
    return (xint - 128.0).astype(jnp.int8)


def int8_conv(x: jax.Array, wsg: jax.Array, w_delta: jax.Array,
              signed: jax.Array, a_delta: jax.Array, a_zero: jax.Array,
              a_bits: float,
              strides: Tuple[int, int] = (1, 1),
              padding: Union[str, Sequence[Tuple[int, int]]] = ((1, 1),
                                                                (1, 1)),
              feature_group_count: int = 1,
              scale: Optional[jax.Array] = None,
              shift: Optional[jax.Array] = None,
              act_fn: Optional[Callable] = None,
              out_bf16: bool = False,
              signed_static: bool = False) -> jax.Array:
    """s8 x s8 -> s32 convolution equal to the fake-quant chain.
    ``signed_static``/``out_bf16``: see int8_matmul.

    x: (N, H, W, Cin) f32.  wsg: (kh, kw, Cin/g, Cout) int8 weights on the
    recentered grid (int8_shifted_grid, cast to int8 — exact).  w_delta:
    (Cout,) per-channel weight step.  signed: traced scalar grid
    signedness.  a_delta / a_zero / a_bits: asymmetric-uniform activation
    quantizer params.  scale/shift: folded BN / bias epilogue, applied as
    y*scale + shift.  act_fn: fused activation applied last.

    Returns f32 (N, Ho, Wo, Cout).
    """
    kh, kw, _, cout = wsg.shape
    cin = x.shape[-1]
    delta_x, zp = _act_int_params(a_delta, a_zero, float(a_bits))
    xint = jnp.clip(jnp.round(x / delta_x) + zp, 0.0, 2.0 ** a_bits - 1.0)

    if isinstance(padding, str):
        pads = lax.padtype_to_pads(x.shape[1:3], (kh, kw), strides, padding)
    else:
        pads = tuple(padding)
    # pad in the f32 domain with the real-domain zero (zp - 128), THEN cast:
    # every value is an integer in [-128, 127], so the s8 cast is exact
    xs_f = lax.pad(xint - 128.0, zp - 128.0,
                   ((0, 0, 0),) + tuple((lo, hi, 0) for lo, hi in pads)
                   + ((0, 0, 0),))
    xs8 = xs_f.astype(jnp.int8)

    colsum = jnp.sum(wsg.astype(jnp.int32), axis=(0, 1, 2),
                     dtype=jnp.int32).astype(jnp.float32)       # (Cout,)
    s_w = 128.0 * (1.0 - signed)
    if signed_static:
        # signed grid asserted at trace time (bake-validated): no rowsum
        # channel, no reduce_window, no K term
        acc = lax.conv_general_dilated(
            xs8, wsg, strides, "VALID",
            feature_group_count=feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        rowsum = jnp.zeros((), jnp.float32)
        s_w = 0.0
    elif feature_group_count == 1:
        # BRANCHLESS rowsum: one extra all-ones output channel makes the
        # conv compute its own window-channel sum as channel `cout` —
        # ~1/cout extra MXU work, zero extra HBM passes, no lax.cond
        # fusion barrier (a cond here materialized 5 GB/step of operands
        # and branch buffers in the batch-512 ResNet-18 schedule).
        w_ext = jnp.concatenate(
            [wsg, jnp.ones((kh, kw, wsg.shape[2], 1), jnp.int8)], axis=-1)
        acc_ext = lax.conv_general_dilated(
            xs8, w_ext, strides, "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        acc = acc_ext[..., :cout]
        rowsum = s_w * acc_ext[..., cout:].astype(jnp.float32)  # (...,1)
    else:
        # grouped convs need a per-group rowsum; only the depthwise case
        # (g == cin) shows up in the zoo and its rowsum is the window sum
        # of xs itself, channel for channel (multiplied by s_w — zero for
        # the common signed grid, so XLA fuses a cheap dead multiply)
        if feature_group_count != cin:
            raise NotImplementedError(
                "int8_conv: feature_group_count must be 1 or Cin")
        acc = lax.conv_general_dilated(
            xs8, wsg, strides, "VALID",
            feature_group_count=feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        rowsum = s_w * lax.reduce_window(
            xs8.astype(jnp.int32), jnp.int32(0), lax.add,
            (1, kh, kw, 1), (1,) + strides + (1,),
            "VALID").astype(jnp.float32)

    k_taps = float(kh * kw * (cin // feature_group_count))
    y = (acc.astype(jnp.float32) + rowsum
         + (128.0 - zp) * colsum
         + k_taps * (128.0 - zp) * s_w)
    y = y * (delta_x * jnp.maximum(w_delta, 1e-8))
    if scale is not None:
        y = y * scale
    if shift is not None:
        y = y + shift
    if act_fn is not None:
        y = act_fn(y)
    # see int8_matmul: real bf16 output halves inter-layer HBM interchange
    return y.astype(jnp.bfloat16) if out_bf16 else y


def int8_matmul(x2d: jax.Array, wsg: jax.Array, w_delta: jax.Array,
                signed: jax.Array, a_delta: jax.Array, a_zero: jax.Array,
                a_bits: float,
                scale: Optional[jax.Array] = None,
                shift: Optional[jax.Array] = None,
                act_fn: Optional[Callable] = None,
                out_bf16: bool = False,
                signed_static: bool = False,
                x_prequant: bool = False,
                emit_s8: Optional[Tuple] = None) -> jax.Array:
    """(M, K) x (K, N) on the s8 MXU — the linear-layer twin of int8_conv.

    ``x_prequant``: x2d is ALREADY the recentered s8 operand (int8, from a
    producer-side ``prequant_s8`` epilogue); a_delta/a_zero still drive the
    dequant epilogue, the prologue is skipped.

    ``emit_s8``: (delta, zero, bits) of the NEXT consumer's act quantizer —
    after act_fn, this layer's epilogue emits the recentered s8 operand for
    the next int8 matmul instead of a real-valued tensor (overrides
    ``out_bf16``; see nn/factored.PrequantS8).

    ``out_bf16`` stores the dequantized output in bfloat16 (2^-9 relative
    rounding, the ``conv_out_bf16`` deployment lever): the f32 interchange
    between int8 layers was ~40% of the ViT step's HBM bytes.

    ``signed_static`` (config ``int8_assume_signed``, bake-validated)
    asserts the weight grid is signed at TRACE time, eliding the
    s_w-rowsum/K terms entirely — XLA cannot DCE them when ``signed`` is a
    traced value (it lowers the rowsum to a cross-lane VPU reduce even
    though s_w == 0; measured 12.8 ms of the batch-128 ViT's 38 ms step).
    """
    k = x2d.shape[-1]
    delta_x, zp = _act_int_params(a_delta, a_zero, float(a_bits))
    if x_prequant:
        xs8 = x2d
    else:
        xint = jnp.clip(jnp.round(x2d / delta_x) + zp,
                        0.0, 2.0 ** a_bits - 1.0)
        xs8 = (xint - 128.0).astype(jnp.int8)

    acc = lax.dot_general(xs8, wsg, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    colsum = jnp.sum(wsg.astype(jnp.int32), axis=0).astype(jnp.float32)
    y = acc.astype(jnp.float32) + (128.0 - zp) * colsum
    if not signed_static:
        # branchless: s_w is zero for the common signed grid, but the row
        # sum still lowers to a VPU reduce per layer (see docstring)
        s_w = 128.0 * (1.0 - signed)
        rowsum = s_w * jnp.sum(xs8.astype(jnp.int32),
                               axis=-1).astype(jnp.float32)
        y = y + rowsum[:, None] + k * (128.0 - zp) * s_w
    y = y * (delta_x * jnp.maximum(w_delta, 1e-8))
    if scale is not None:
        y = y * scale
    if shift is not None:
        y = y + shift
    if act_fn is not None:
        y = act_fn(y)
    if emit_s8 is not None:
        n_delta, n_zero, n_bits = emit_s8
        return prequant_s8(y, n_delta, n_zero, n_bits)
    # a bf16->f32 round trip would still STORE f32 (the fusion output dtype
    # is what hits HBM) — return real bf16; consumers promote to f32 when
    # they combine it with f32 quantizer scalars
    return y.astype(jnp.bfloat16) if out_bf16 else y
