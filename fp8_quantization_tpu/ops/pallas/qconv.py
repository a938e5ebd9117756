"""Pallas TPU kernel: fused 3x3 conv + epilogue + output fake-quant.

The round-1 fused kernel (qmatmul.py) covers linear/1x1 layers; 3x3 convs —
most of ResNet — ran as XLA convs with the quant epilogue fused only as far
as XLA chooses.  This kernel brings the full deployment epilogue (folded
BN scale/shift, optional residual add, relu, output fake-quant on the
normalized grid) into the conv itself, with the conv evaluated as shifted
matmuls on whole images resident in VMEM.

Deployment semantics (the bench path): weights arrive BAKED on the
normalized quantizer grid (bf16-exact, nn/bake.py) with their per-channel
factor folded into the epilogue scale, and the input arrives as a factored
norm (bf16-exact) with its factor folded likewise — so the kernel does no
operand quantization, only the output quantizer (reference math,
fp8_quantizer.py:91-133, shared tile fns from qmatmul.py).

Mosaic facts this design relies on (probe: tools/probe_mosaic_ops.py,
compile-verified for v5e): offset slices along row/sublane dims lower;
jnp.pad lowers; reshape-collapse before a 2D dot lowers; raw strided
slices do NOT — stride-2 convs (cfg.stride=2, the ResNet downsample
blocks) are evaluated by even/odd phase decomposition via reshape-splits
(_phases_s2): the nine taps become offset slices of four half-resolution
phase planes and the dot is identical to the stride-1 im2col form.

Grid: one step per group of ``imgs_per_block`` images; everything for the
group (padded input, weights, accumulator) lives in VMEM.  ResNet-18/50
block shapes all fit: 56x56x64 bf16 = 0.4 MB/img, 7x7x512 = 50 KB/img.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fp8_quantization_tpu.ops.pallas.common import tpu_compiler_params
from fp8_quantization_tpu.ops.pallas.qmatmul import (
    _fp8_quantize_tile, _int_asym_quantize_tile)


@dataclasses.dataclass(frozen=True)
class FusedConvConfig:
    """Static kernel configuration."""

    act_method: str = "none"       # output quantizer: "fp8"|"int_asym"|"none"
    act_n_bits: int = 8
    activation: Optional[str] = None     # None | "relu" | "relu6"
    residual: bool = False         # fuse a post-scale residual add
    emit_norm: bool = False        # emit normalized-grid bf16 (factored)
    imgs_per_block: int = 1
    im2col: bool = True            # one (M, 9*Cin) dot vs 9 per-tap dots
    stride: int = 1                # 1, or 2 via even/odd phase decomposition
    # "int8": input-quant INT configs on the native s8 x s8 -> s32 MXU
    # datapath — int_asym input + int_sym weights quantized IN-KERNEL,
    # recentered by 128 with exact rowsum/colsum corrections (the conv
    # analogue of qmatmul's int8 path; padding holds zp-128 so padded taps
    # contribute exactly zero).  act_method is the INPUT quantizer here.
    mxu_dtype: str = "bfloat16"
    n_bits: int = 8                # weight quantizer bit-width (int8 path)
    w_prequant: bool = False       # int8 path: w arrives pre-quantized int8
                                   # on the recentered grid (nn/bake.py)
    vmem_limit: Optional[int] = None   # scoped-VMEM ceiling for Mosaic;
                                   # None -> common.VMEM_LIMIT_BYTES (the
                                   # autotune probes pass the stricter
                                   # PROBE_VMEM_LIMIT_BYTES)


def _phases_s2(x, pad_value=0.0):
    """Even/odd phase tensors of ``x`` for a stride-2 3x3 SAME conv.

    out[i, j] = sum_{dy,dx} w[dy, dx] * x[2i+dy-1, 2j+dx-1]: row index
    parity depends only on dy (dy=1 -> even rows at phase row i; dy=0/2 ->
    odd rows at phase rows i-1 / i), likewise columns on dx — so the nine
    taps are offset slices of four half-resolution phase planes.  Built
    with reshape-splits (Mosaic lowers those; strided slices fail —
    tools/probe_mosaic_ops.py) and top/left padding only (SAME padding at
    even H, W never touches the bottom/right pad row).

    Returns (ee, eo_p, oe_p, oo_p): ee is (g, H/2, W/2, c); the others are
    padded by one row/col of ``pad_value`` on the sides their shifted taps
    reach (eo: left col; oe: top row; oo: both).
    """
    g, H, W, c = x.shape
    Ho, Wo = H // 2, W // 2
    xr = x.reshape(g, Ho, 2, W, c)
    xe, xo = xr[:, :, 0], xr[:, :, 1]                    # (g, Ho, W, c)
    split = lambda t: (t.reshape(g, Ho, Wo, 2, c)[:, :, :, 0],  # noqa: E731
                       t.reshape(g, Ho, Wo, 2, c)[:, :, :, 1])
    xee, xeo = split(xe)
    xoe, xoo = split(xo)
    pad = lambda t, r, co: jnp.pad(                       # noqa: E731
        t, ((0, 0), (r, 0), (co, 0), (0, 0)), constant_values=pad_value)
    return xee, pad(xeo, 0, 1), pad(xoe, 1, 0), pad(xoo, 1, 1)


def _taps_s2(ee, eo_p, oe_p, oo_p):
    """The nine (g, H/2, W/2, c) tap views in (dy, dx) row-major order —
    matching w.reshape(9*cin, cout)'s tap blocks."""
    Ho, Wo = ee.shape[1], ee.shape[2]
    return [oo_p[:, 0:Ho, 0:Wo], oe_p[:, 0:Ho, :], oo_p[:, 0:Ho, 1:Wo + 1],
            eo_p[:, :, 0:Wo], ee, eo_p[:, :, 1:Wo + 1],
            oo_p[:, 1:Ho + 1, 0:Wo], oe_p[:, 1:Ho + 1, :],
            oo_p[:, 1:Ho + 1, 1:Wo + 1]]


def _conv_epilogue(y, cfg, as_ref, scale_ref, shift_ref, res):
    """Shared epilogue: y*scale + shift [+ residual], activation, out-quant."""
    y = y * scale_ref[0, 0, 0, :] + shift_ref[0, 0, 0, :]
    if res is not None:
        y = y + res.astype(jnp.float32)
    if cfg.activation == "relu":
        y = jnp.maximum(y, 0.0)
    elif cfg.activation == "relu6":
        y = jnp.clip(y, 0.0, 6.0)
    if cfg.act_method == "fp8":
        y = _fp8_quantize_tile(y, as_ref[0, 0], as_ref[0, 1], as_ref[0, 2],
                               normalized=cfg.emit_norm,
                               n_bits=float(cfg.act_n_bits))
    elif cfg.act_method == "int_asym":
        y = _int_asym_quantize_tile(y, as_ref[0, 0], as_ref[0, 1],
                                    cfg.act_n_bits, normalized=cfg.emit_norm)
    return y


def _qconv3x3_kernel(x_ref, w_ref, as_ref, scale_ref, shift_ref, *rest,
                     cfg: FusedConvConfig):
    """One grid step: a group of images, full 3x3 conv + epilogue.

    Refs: x (g, H, W, Cin) input norms (bf16) — SAME padding happens
    IN-KERNEL (jnp.pad lowers on Mosaic; padding outside materialized an
    extra (H+2)^2 copy of every activation in HBM);
    w (3, 3, Cin, Cout) baked normalized weights (bf16);
    as (1, 3) SMEM output-quant scalars; scale/shift (1, 1, 1, Cout) f32;
    then — pallas ref order is inputs, outputs, scratch — the optional
    residual INPUT (g, H, W, Cout), out (g, H, W, Cout), and the
    (g*H*W, Cout) f32 accumulator scratch.
    """
    if cfg.residual:
        residual_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
        residual_ref = None
    g, H, W, cin = x_ref.shape
    cout = w_ref.shape[-1]
    Ho, Wo = H // cfg.stride, W // cfg.stride
    m = g * Ho * Wo

    if cfg.stride == 2:
        taps = _taps_s2(*_phases_s2(x_ref[:]))
    else:
        x = jnp.pad(x_ref[:], ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [x[:, dy:dy + H, dx:dx + W, :]
                for dy in range(3) for dx in range(3)]
    if cfg.im2col:
        # patches (m, 9*Cin): lane-dim concat of the 9 shifted views; one
        # K=9*Cin dot fills the MXU far better than Cin-deep taps.
        patches = jnp.concatenate([t.reshape(m, cin) for t in taps], axis=1)
        wm = w_ref[:].reshape(9 * cin, cout)
        acc = jax.lax.dot_general(
            patches, wm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((m, cout), jnp.float32)
        for i, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                     for dx in range(3)):
            acc = acc + jax.lax.dot_general(
                taps[i].reshape(m, cin), w_ref[dy, dx, :, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    y = acc_ref[:].reshape(g, Ho, Wo, cout)
    res = residual_ref[:] if cfg.residual else None
    y = _conv_epilogue(y, cfg, as_ref, scale_ref, shift_ref, res)
    out_ref[:] = y.astype(out_ref.dtype)


def _qdwconv3x3_kernel(x_ref, w_ref, as_ref, scale_ref, shift_ref, out_ref,
                       *, cfg: FusedConvConfig):
    """Depthwise 3x3 step: 9-tap VPU stencil + the shared epilogue.

    MobileNetV2's depthwise convs are VPU work (per-channel stencils, no
    MXU contraction); the win of fusing is HBM traffic — the composed XLA
    path reads/writes the activation around the conv, the BN/relu6 chain
    and the output fake-quant separately, while this kernel reads x once
    and writes the quantized output once.  Probe fact: the 9-tap shifted
    multiply-add lowers on Mosaic (tools/probe_mosaic_ops.py
    dw3x3_stride1_9tap); stride 2 rides the same phase decomposition as
    the dense kernel.
    """
    g, H, W, c = x_ref.shape
    if cfg.stride == 2:
        taps = _taps_s2(*_phases_s2(x_ref[:]))
    else:
        x = jnp.pad(x_ref[:], ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [x[:, dy:dy + H, dx:dx + W, :]
                for dy in range(3) for dx in range(3)]
    acc = None
    for i, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                 for dx in range(3)):
        term = taps[i].astype(jnp.float32) * w_ref[dy, dx, :]
        acc = term if acc is None else acc + term
    y = _conv_epilogue(acc, cfg, as_ref, scale_ref, shift_ref, None)
    out_ref[:] = y.astype(out_ref.dtype)


def fused_quant_dwconv3x3(x: jax.Array, w: jax.Array,
                          act_scalars: jax.Array,
                          scale: jax.Array, shift: jax.Array,
                          *, cfg: FusedConvConfig,
                          interpret: bool = False) -> jax.Array:
    """y = out_quant(act(dwconv3x3(x, w) * scale + shift)).

    Args:
      x: (N, H, W, C) input norms (bf16-exact grid values, deployment) or
        plain activations; SAME padding, stride cfg.stride.
      w: (3, 3, C) baked normalized depthwise weights.
      act_scalars / scale / shift: as fused_quant_conv3x3 (depthwise
        w_factor is per-channel but commutes — output channel c touches
        only input channel c).
    """
    n, H, W, c = x.shape
    assert w.shape == (3, 3, c), (x.shape, w.shape)
    assert cfg.stride in (1, 2), cfg.stride
    if cfg.stride == 2:
        assert H % 2 == 0 and W % 2 == 0, (H, W)
    assert not cfg.residual and cfg.mxu_dtype != "int8"
    Ho, Wo = H // cfg.stride, W // cfg.stride
    g = min(cfg.imgs_per_block, n)
    while n % g:
        g -= 1

    from fp8_quantization_tpu.ops.pallas.common import use_interpret
    interpret = use_interpret(interpret)
    out_dtype = jnp.bfloat16 if cfg.emit_norm else jnp.float32

    ascal = act_scalars.reshape(1, 3).astype(jnp.float32)
    if cfg.act_method == "fp8":
        ascal = ascal.at[0, 0].set(jnp.maximum(ascal[0, 0], 1e-30))
        mb = jnp.clip(jnp.round(ascal[0, 1]), 1.0,
                      cfg.act_n_bits - ascal[0, 2])
        ascal = ascal.at[0, 1].set(mb)
    sc = scale.reshape(1, 1, 1, c).astype(jnp.float32)
    sh = shift.reshape(1, 1, 1, c).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_qdwconv3x3_kernel, cfg=cfg),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, H, W, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, Ho, Wo, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Ho, Wo, c), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=18 * n * Ho * Wo * c,
            bytes_accessed=2 * n * (H * W + Ho * Wo) * c + 4 * 9 * c,
            transcendentals=n * Ho * Wo * c),
        compiler_params=tpu_compiler_params(cfg.vmem_limit),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w.astype(jnp.float32), ascal, sc, sh)
    return out


def _qconv3x3_int8_kernel(x_ref, w_ref, wq_ref, ws_ref, as_ref, scale_ref,
                          shift_ref, out_ref, acc_ref, *,
                          cfg: FusedConvConfig):
    """Native-int8 3x3 conv step (input-quant INT configs).

    sum_win (xint - zp) wint  ==  dot(xs, wsg)            xs = xint - 128
                               + S_w * rowsum(xs)         wsg = wint - S_w
                               + (128 - zp) * colsum(wsg)
                               + 9*Cin * (128 - zp) * S_w
    with SAME padding holding xs = zp - 128 (so padded taps are exactly
    zero in the true sum, and the identity holds per element).  Epilogue:
    y = delta_x * delta_w * (...) then scale/shift/activation.
    """
    g, H, W, cin = x_ref.shape
    cout = w_ref.shape[-1]
    Ho, Wo = H // cfg.stride, W // cfg.stride
    m = g * Ho * Wo
    k9 = 9.0 * cin

    # Quantize the input to int8 BEFORE gathering taps: every f32
    # temporary stays at (g, H+2, W+2, cin); the (m, 9*cin) im2col matrix
    # exists only in int8 (a f32 im2col + its round/clip temporaries blew
    # VMEM at ResNet block shapes).
    a_bits = float(cfg.act_n_bits)
    delta_x = jnp.maximum(as_ref[0, 0], 1e-8)
    zp = jnp.clip(jnp.round(as_ref[0, 1]), 0.0, 2.0 ** a_bits - 1.0)
    xint = jnp.clip(jnp.round(x_ref[:].astype(jnp.float32) / delta_x) + zp,
                    0.0, 2.0 ** a_bits - 1.0)
    # padding holds xs = zp-128 (real-domain zero): padded taps contribute
    # exactly zero to the true sum, so the recenter identity holds per
    # element at either stride
    if cfg.stride == 2:
        phases_f = _phases_s2(xint - 128.0, pad_value=zp - 128.0)
        # cast each phase plane to int8 ONCE and slice taps from the int8
        # planes (stride-1's cast-then-slice order): 4 converts instead of
        # 9, and the f32 phase temporaries die before the im2col concat
        taps_i8 = _taps_s2(*[p.astype(jnp.int8) for p in phases_f])
    else:
        xs_f = jnp.pad(xint - 128.0, ((0, 0), (1, 1), (1, 1), (0, 0)),
                       constant_values=zp - 128.0)
        xs = xs_f.astype(jnp.int8)

    signed = ws_ref[0, 1]
    s_w = 128.0 * (1.0 - signed)
    delta_w = jnp.maximum(wq_ref[0, 0, 0, :], 1e-8)
    if cfg.w_prequant:
        wm = w_ref[:].reshape(9 * cin, cout)     # already int8 grid
        colsum = jnp.sum(wm.astype(jnp.float32), axis=0,
                         keepdims=True)                       # (1, cout)
    else:
        from fp8_quantization_tpu.ops.pallas.qmatmul import int8_shifted_grid
        wsg_f = int8_shifted_grid(w_ref[:], delta_w, signed, cfg.n_bits)
        wm = wsg_f.astype(jnp.int8).reshape(9 * cin, cout)
        colsum = jnp.sum(wsg_f, axis=(0, 1, 2)).reshape(1, cout)

    if cfg.stride == 2:
        cols = [t.reshape(m, cin) for t in taps_i8]
    else:
        cols = [xs[:, dy:dy + H, dx:dx + W, :].reshape(m, cin)
                for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=1)                   # (m, 9cin) s8
    acc_ref[:] = jax.lax.dot_general(
        patches, wm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    # rowsum(patches) per output pixel == 3x3 window-sum of the per-pixel
    # channel sums (keepdims 4D so tap shifts stay in sublane dims); for
    # stride 2 the channel-sums are taken on the PADDED phase planes so
    # the rowsum taps see the same zp-128 padding the int8 taps do
    if cfg.stride == 2:
        chans = [jnp.sum(p, axis=-1, keepdims=True) for p in phases_f]
        rowsum = sum(t for t in _taps_s2(*chans))         # (g, Ho, Wo, 1)
    else:
        chan = jnp.sum(xs_f, axis=-1, keepdims=True)    # (g, H+2, W+2, 1)
        rowsum = sum(chan[:, dy:dy + H, dx:dx + W, :]
                     for dy in range(3) for dx in range(3))   # (g,H,W,1)
    corr = (s_w * rowsum.reshape(m, 1) + (128.0 - zp) * colsum
            + k9 * (128.0 - zp) * s_w)
    y = (acc_ref[:].astype(jnp.float32) + corr) * (delta_x * delta_w)
    y = y.reshape(g, Ho, Wo, cout)
    y = y * scale_ref[0, 0, 0, :] + shift_ref[0, 0, 0, :]
    if cfg.activation == "relu":
        y = jnp.maximum(y, 0.0)
    elif cfg.activation == "relu6":
        y = jnp.clip(y, 0.0, 6.0)
    out_ref[:] = y.astype(out_ref.dtype)


def fused_quant_conv3x3(x: jax.Array, w: jax.Array,
                        act_scalars: jax.Array,
                        scale: jax.Array, shift: jax.Array,
                        residual: Optional[jax.Array] = None,
                        weight_channel_param: Optional[jax.Array] = None,
                        weight_scalars: Optional[jax.Array] = None,
                        *, cfg: FusedConvConfig,
                        interpret: bool = False) -> jax.Array:
    """y = out_quant(act(conv3x3(x, w) * scale + shift [+ residual])).

    Args:
      x: (N, H, W, Cin) input norms — bf16-exact grid values (deployment)
        or plain activations; stride 1, SAME padding.  int8 path: raw
        activations, quantized in-kernel by ``act_scalars``.
      w: (3, 3, Cin, Cout) baked normalized weights (bf16 path) or raw f32
        weights quantized in-kernel (int8 path).
      act_scalars: (3,) f32 — fp8: [maxval, mantissa_bits, sign_bits];
        int_asym: [delta, zero_float, 0]; ignored for "none".
      scale, shift: (Cout,) folded epilogue (BN/bias and operand factors).
      residual: optional (N, H, W, Cout), added after scale/shift, before
        the activation (ResNet basic-block semantics; bf16 path only).
      weight_channel_param / weight_scalars: int8 path only — (Cout,)
        per-channel int_sym delta and (2,) [0, signed].
      cfg: static config.
    """
    n, H, W, cin = x.shape
    assert w.shape[:3] == (3, 3, cin), (x.shape, w.shape)
    cout = w.shape[-1]
    assert cfg.residual == (residual is not None)
    assert cfg.stride in (1, 2), cfg.stride
    if cfg.stride == 2:
        # phase decomposition needs whole phase planes (and SAME padding
        # at even H never reaches the bottom/right pad row)
        assert H % 2 == 0 and W % 2 == 0, (H, W)
    Ho, Wo = H // cfg.stride, W // cfg.stride
    int8_path = cfg.mxu_dtype == "int8"
    if int8_path:
        assert (cfg.act_method == "int_asym" and not cfg.emit_norm
                and not cfg.residual and weight_channel_param is not None
                and weight_scalars is not None), cfg
        if cfg.w_prequant:
            assert w.dtype == jnp.int8, w.dtype
    g = min(cfg.imgs_per_block, n)
    while n % g:
        g -= 1

    from fp8_quantization_tpu.ops.pallas.common import use_interpret
    interpret = use_interpret(interpret)
    out_dtype = jnp.bfloat16 if cfg.emit_norm else jnp.float32

    ascal = act_scalars.reshape(1, 3).astype(jnp.float32)
    if cfg.act_method == "fp8":
        ascal = ascal.at[0, 0].set(jnp.maximum(ascal[0, 0], 1e-30))
        mb = jnp.clip(jnp.round(ascal[0, 1]), 1.0,
                      cfg.act_n_bits - ascal[0, 2])
        ascal = ascal.at[0, 1].set(mb)
    sc = scale.reshape(1, 1, 1, cout).astype(jnp.float32)
    sh = shift.reshape(1, 1, 1, cout).astype(jnp.float32)

    grid = (n // g,)
    x_spec = pl.BlockSpec((g, H, W, cin), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM)
    c_spec = pl.BlockSpec((1, 1, 1, cout), lambda i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, Ho, Wo, cout), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * n * Ho * Wo * 9 * cin * cout,
        bytes_accessed=2 * n * (H * W * cin + Ho * Wo * cout)
        + 2 * 9 * cin * cout,
        transcendentals=n * Ho * Wo * cout)

    if int8_path:
        out = pl.pallas_call(
            functools.partial(_qconv3x3_int8_kernel, cfg=cfg),
            grid=grid,
            in_specs=[x_spec, w_spec, c_spec,
                      pl.BlockSpec((1, 2), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      a_spec, c_spec, c_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n, Ho, Wo, cout), jnp.float32),
            scratch_shapes=[pltpu.VMEM((g * Ho * Wo, cout), jnp.int32)],
            cost_estimate=cost,
            compiler_params=tpu_compiler_params(cfg.vmem_limit),
            interpret=interpret,
        )(x.astype(jnp.float32),
          w if cfg.w_prequant else w.astype(jnp.float32),
          jnp.maximum(weight_channel_param, 1e-8).reshape(1, 1, 1, cout)
          .astype(jnp.float32),
          weight_scalars.reshape(1, 2).astype(jnp.float32), ascal, sc, sh)
        return out

    xp = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    in_specs = [x_spec, w_spec, a_spec, c_spec, c_spec]
    args = [xp, wb, ascal, sc, sh]
    if cfg.residual:
        in_specs.append(pl.BlockSpec((g, Ho, Wo, cout), lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual.astype(jnp.bfloat16 if cfg.emit_norm
                                    else jnp.float32))

    out = pl.pallas_call(
        functools.partial(_qconv3x3_kernel, cfg=cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, Ho, Wo, cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((g * Ho * Wo, cout), jnp.float32)],
        cost_estimate=cost,
        compiler_params=tpu_compiler_params(cfg.vmem_limit),
        interpret=interpret,
    )(*args)
    return out
