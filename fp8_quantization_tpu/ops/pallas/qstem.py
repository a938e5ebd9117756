"""Pallas TPU kernel: fused ResNet stem — conv7x7/2 + BN + relu + maxpool3x3/2
+ output fake-quant in one pass.

Why this kernel exists (round-3 trace attribution, RESULTS.md): on the
deployed ResNet-18 step the stem REGION costs 4.52 ms of 21.2 ms — the
7x7 conv fusion (2.18 ms, HBM-bound on its own 822 MB 112x112 output
write), the fp32->bf16 input convert pass (0.70 ms), and the maxpool
(1.65 ms, a full read+write of that same 822 MB tensor) — while the only
HBM traffic the region *needs* is the input image read plus the pooled
56x56 output write (~0.6 ms).  Fusing conv -> affine -> relu -> pool ->
quant keeps the 112x112 pre-pool tensor entirely in VMEM.

Numerics notes:
  * The model quantizes the stem output BEFORE the pool
    (models/resnet.py: QuantConv epilogue, then fmax_pool).  Quantization
    to a fixed grid is monotone non-decreasing, so it commutes with max:
    pool(quant(x)) == quant(pool(x)) EXACTLY — the kernel pools first and
    quantizes 4x fewer elements.
  * The pool's SAME padding is the max identity; values are post-relu
    (>= 0) and every 3x3 window contains at least one real element, so
    zero-padding is exact (the kernel asserts activation == "relu").
  * RGB inputs (cin=3) cannot tile the 128-lane im2col concat (the same
    Mosaic fact that keeps stem convs off the 3x3 kernel,
    nn/layers.py); channels are zero-padded to ``k_pad`` INSIDE the
    kernel (VMEM-only — HBM still moves 3 channels) and the weight
    matrix is zero-padded to match, which adds exactly 0 to the dot.

Geometry (all static; H == W == S, S % 32 == 0):
  conv: k=7, stride 2, padding (3,3)  -> C = S/2 rows.  Conv output row r
  reads padded rows 2r+dy (pad row index = input row + 3), dy in [0,7);
  with even/odd phase planes of the padded image (built by reshape-splits,
  the only strided access Mosaic lowers), tap (dy,dx) is the offset slice
  plane[dy&1][dx&1][r + dy//2, c + dx//2].
  pool: k=3, stride 2, padding (1,1) -> P = C/2 rows; pool row p covers
  conv rows 2p-1, 2p, 2p+1.  The kernel computes conv rows in bands of 16
  (8 pool rows), carrying the previous band's last conv row for the
  2p-1 tap across the band seam (zeros for the first band = pool pad).

Reference semantics being fused (for parity tests): the composed
deployment chain conv7x7s2(bf16 operands, f32 accum) * scale + shift ->
relu -> output fake-quant -> maxpool3x3s2, i.e. QuantConv(name="stem") +
fmax_pool in models/resnet.py (reference: resnet stem + MaxPool2d,
resnet_quantized.py:54-78).
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
class FusedStemConfig:
    """Static kernel configuration."""

    act_method: str = "fp8"        # output quantizer: "fp8"|"int_asym"|"none"
    act_n_bits: int = 8
    emit_norm: bool = False        # emit normalized-grid bf16 (factored)
    imgs_per_block: int = 1
    k_pad: int = 8                 # in-kernel channel pad for the im2col
    band_rows: int = 16            # conv rows per band (multiple of 2)
    vmem_limit: Optional[int] = None


def _phase_planes(xp):
    """Four (g, Hp/2, Wp/2, c) parity planes of the padded image via
    reshape-splits: planes[ry][cx][i, j] = xp[2i+ry, 2j+cx]."""
    g, Hp, Wp, c = xp.shape
    xr = xp.reshape(g, Hp // 2, 2, Wp, c)
    rows = (xr[:, :, 0], xr[:, :, 1])                  # even / odd rows
    out = []
    for rplane in rows:
        rr = rplane.reshape(g, Hp // 2, Wp // 2, 2, c)
        out.append((rr[:, :, :, 0], rr[:, :, :, 1]))   # even / odd cols
    return out                                          # [ry][cx]


def _qstem_kernel(pee_ref, peo_ref, poe_ref, poo_ref, w_ref, as_ref,
                  scale_ref, shift_ref, out_ref, obuf_ref, *,
                  cfg: FusedStemConfig):
    """One grid step: a group of whole images through conv+pool+quant.

    Structure matters for COMPILE time, not just run time (all measured
    on the v5e AOT target at batch 512):
      * a fully unrolled bands x 49-taps graph compiles superlinearly
        (5 s at S=32, ~100 s at S=64, tens of GB of compiler RSS at
        S=224) — so the band loop is a lax.fori_loop whose body traces
        once, with band row offsets as dynamic sublane-dim loads;
      * dynamic-offset loads from VMEM *scratch* refs inside that loop
        make the compiler stage the entire un-blocked output on the
        kernel stack (RESOURCE_EXHAUSTED) — so the phase planes are
        precomputed by XLA in the wrapper (one fused cast+pad+split
        pass) and arrive as pipelined INPUT refs, where the same dynamic
        loads compile in seconds;
      * dynamic-offset stores into the pipelined OUTPUT block trip the
        same staging — bands land in a small scratch and the out ref
        gets one static full-block store.
    """
    g = pee_ref.shape[0]
    cout = w_ref.shape[-1]
    cp = cfg.k_pad
    Hp2 = pee_ref.shape[1]          # (S + 6) / 2
    S = 2 * Hp2 - 6
    C = S // 2                      # conv output rows/cols
    P = C // 2                      # pool output rows/cols
    br = cfg.band_rows              # conv rows per band
    bands = C // br

    planes = ((pee_ref, peo_ref), (poe_ref, poo_ref))

    # weights as one (49*cp, cout) matrix, (dy, dx, cin)-major like the
    # tap concat below; the host wrapper already channel-padded them
    wm = w_ref[:].reshape(49 * cp, cout)
    scale = scale_ref[0, 0, 0, :]
    shift = shift_ref[0, 0, 0, :]

    def band(b, prev):
        r0 = b * br
        taps = []
        for dy in range(7):
            for dx in range(7):
                pr = planes[dy & 1][dx & 1]
                t = pr[:, pl.dslice(r0 + dy // 2, br),
                       pl.dslice(dx // 2, C), :]
                taps.append(t.reshape(g * br * C, cp))
        patches = jnp.concatenate(taps, axis=1)       # (g*br*C, 49*cp)
        acc = jax.lax.dot_general(
            patches, wm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = acc.reshape(g, br, C, cout)
        y = jnp.maximum(y * scale + shift, 0.0)       # folded BN + relu

        # row pool: pool row j of the band covers conv rows 2j-1, 2j, 2j+1
        # (band-local, with the previous band's last row carried in; 0 is
        # the exact max identity for the first band's pad — post-relu
        # values are >= 0)
        ycat = jnp.concatenate([prev, y], axis=1)     # (g, br+1, C, cout)
        new_prev = y[:, br - 1:br]
        rows = [jnp.maximum(jnp.maximum(ycat[:, 2 * j:2 * j + 1],
                                        ycat[:, 2 * j + 1:2 * j + 2]),
                            ycat[:, 2 * j + 2:2 * j + 3])
                for j in range(br // 2)]
        rm = jnp.concatenate(rows, axis=1)            # (g, br/2, C, cout)

        # col pool via col-parity split: padded col 2q, 2q+1, 2q+2
        rp = jnp.pad(rm, ((0, 0), (0, 0), (1, 1), (0, 0)))
        rr = rp.reshape(g, br // 2, (C + 2) // 2, 2, cout)
        ce, co = rr[:, :, :, 0], rr[:, :, :, 1]
        cm = jnp.maximum(jnp.maximum(ce[:, :, :P], co[:, :, :P]),
                         ce[:, :, 1:P + 1])           # (g, br/2, P, cout)

        # quant AFTER the pool: monotone quantization commutes with max,
        # so this is bit-identical to the model's quant-then-pool order
        if cfg.act_method == "fp8":
            cm = _fp8_quantize_tile(cm, as_ref[0, 0], as_ref[0, 1],
                                    as_ref[0, 2], normalized=cfg.emit_norm,
                                    n_bits=float(cfg.act_n_bits))
        elif cfg.act_method == "int_asym":
            cm = _int_asym_quantize_tile(cm, as_ref[0, 0], as_ref[0, 1],
                                         cfg.act_n_bits,
                                         normalized=cfg.emit_norm)
        # bands land in a VMEM scratch and the OUT ref gets one static
        # full-block store after the loop: dynamic-offset stores into the
        # pipelined output block made XLA stage the whole un-blocked
        # output in VMEM (batch-512 compile blew the budget)
        obuf_ref[:, pl.dslice(b * (br // 2), br // 2), :, :] = \
            cm.astype(out_ref.dtype)
        return new_prev

    prev0 = jnp.zeros((g, 1, C, cout), jnp.float32)
    jax.lax.fori_loop(0, bands, band, prev0)
    out_ref[:] = obuf_ref[:]


def fused_quant_stem(x: jax.Array, w: jax.Array, act_scalars: jax.Array,
                     scale: jax.Array, shift: jax.Array,
                     *, cfg: FusedStemConfig,
                     interpret: bool = False) -> jax.Array:
    """y = maxpool3x3s2(out_quant(relu(conv7x7s2(x, w) * scale + shift))).

    Args:
      x: (N, S, S, cin) raw input images (f32 or bf16; the bf16 cast
        happens in the XLA plane-building prologue — the deployed path's
        separate convert pass is one of the HBM round trips this kernel
        removes).  S % 32 == 0.
      w: (7, 7, cin, Cout) baked normalized weights (bf16-exact).
      act_scalars: (3,) f32 — fp8: [maxval, mantissa_bits, sign_bits];
        int_asym: [delta, zero_float, 0]; ignored for "none".
      scale, shift: (Cout,) folded BN/bias epilogue (weight factor folded
        into scale by the caller; stem input is unquantized full-scale).
    Returns:
      (N, S/4, S/4, Cout) pooled quantized activations (bf16 norms when
      cfg.emit_norm, else f32 values).
    """
    n, S, S2, cin = x.shape
    assert S == S2 and S % 32 == 0, x.shape
    assert w.shape[:3] == (7, 7, cin), (x.shape, w.shape)
    assert cin <= cfg.k_pad, (cin, cfg.k_pad)
    assert cfg.band_rows % 2 == 0 and (S // 2) % cfg.band_rows == 0, cfg
    cout = w.shape[-1]
    P = S // 4
    Hp2 = (S + 6) // 2
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
    # channel-pad the weight matrix to the kernel's im2col tile width
    wp = jnp.pad(w.astype(jnp.bfloat16),
                 ((0, 0), (0, 0), (0, cfg.k_pad - cin), (0, 0)))

    # XLA prologue: cast + conv-SAME pad + channel pad + parity split in
    # one fused pass; the planes land in HBM (~1.4x the bf16 image at
    # k_pad=4) and stream into the kernel as pipelined input blocks
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (3, 3), (3, 3), (0, cfg.k_pad - cin)))
    (pee, peo), (poe, poo) = _phase_planes(xp)

    pspec = pl.BlockSpec((g, Hp2, Hp2, cfg.k_pad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_qstem_kernel, cfg=cfg),
        grid=(n // g,),
        in_specs=[
            pspec, pspec, pspec, pspec,
            pl.BlockSpec((7, 7, cfg.k_pad, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, P, P, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, P, P, cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((g, P, P, cout), out_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (S // 2) ** 2 * 49 * cin * cout,
            bytes_accessed=2 * n * Hp2 * Hp2 * cfg.k_pad
            + 2 * n * P * P * cout,
            transcendentals=n * P * P * cout),
        compiler_params=tpu_compiler_params(cfg.vmem_limit),
        interpret=interpret,
    )(pee, peo, poe, poo, wp, ascal, sc, sh)
    return out
