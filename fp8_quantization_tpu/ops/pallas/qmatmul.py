"""Pallas TPU kernel: matmul with fused fake-quantization + epilogue.

This is the "native equivalent" of the reference's hot path (SURVEY.md §3.5):
the reference runs fake-quant as separate torch ops around F.linear/F.conv2d
(fp8_quantizer.py:91-133 + hijacker.py:70-98), round-tripping every operand
through memory.  Here one kernel, per (bm, bn) output tile:

  1. streams x and w tiles HBM->VMEM (pallas pipeline),
  2. fake-quantizes the w tile (FP8 per-element pow2 scales, per-channel
     maxval; or INT symmetric per-channel delta) on the VPU,
  3. optionally fake-quantizes the x tile (quantize_input configs),
  4. feeds the MXU in bfloat16 — EXACT for quantized operands, since every
     value on an <=8-bit-significand grid is representable in bf16 — at 2x
     the fp32 issue rate, accumulating in fp32 scratch,
  5. epilogue on the last k-step: y*scale + shift (bias or folded BN),
     activation, optional output fake-quant, single store.

Quantized operands never touch HBM; the elementwise quant cost hides behind
the MXU pipeline.  The composed-XLA path (ops/fp8.py + nn/layers.py) is the
correctness oracle — see tests/test_pallas_qmatmul.py.
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


@dataclasses.dataclass(frozen=True)
class FusedQuantMatmulConfig:
    """Static kernel configuration (trace-time constants)."""

    weight_method: str = "fp8"          # "fp8" | "int_sym" | "none"
    act_method: str = "none"            # quantizer for x-in or y-out:
                                        # "fp8" | "int_asym" | "none"
    quantize_input: bool = False        # True: quantize x; False: quantize y
    activation: Optional[str] = None    # None | "relu" | "relu6"
    n_bits: int = 8                     # weight quantizer bit-width
    act_n_bits: int = 8                 # activation quantizer bit-width
    block_m: int = 256
    block_n: int = 256
    block_k: int = 512
    mxu_dtype: str = "bfloat16"         # "bfloat16" (exact for 8-bit grids)
                                        # | "float32" (parity debugging)
                                        # | "int8" (native s8xs8->s32 MXU
                                        #   datapath, v5e ~2x bf16 peak;
                                        #   requires weight_method="int_sym",
                                        #   act_method="int_asym",
                                        #   quantize_input=True)
    emit_norm: bool = False             # output-quant epilogue emits the
                                        # *normalized* grid value in bf16
                                        # (cross-layer factored protocol,
                                        # nn/factored.py); caller re-applies
                                        # the per-tensor act factor
    w_prequant: bool = False            # int8 path: w arrives PRE-QUANTIZED
                                        # as int8 on the recentered grid
                                        # (nn/bake.bake_int8_weights) — the
                                        # in-kernel weight round/clip chain
                                        # is skipped entirely
    vmem_limit: Optional[int] = None    # scoped-VMEM ceiling for Mosaic;
                                        # None -> common.VMEM_LIMIT_BYTES


def _fp8_quantize_tile(x, maxval, mbits, sign_bits, normalized=False,
                       n_bits=8.0):
    """FP8 fake-quant of one tile (reference math, fp8_quantizer.py:91-133).

    ``maxval`` broadcasts against x ((1, bn) per-channel or scalar);
    ``mbits``/``sign_bits`` are f32 scalars.

    ``normalized=True`` returns the value on the *pure binary* FP8 grid,
    i.e. without the ``maxval / (2 - 2^-M)`` factor: an (M+1)-bit integer
    times a power of two, EXACT in bfloat16.  The caller multiplies the
    factor back in the epilogue (after the matmul) — this is what lets the
    MXU run at bf16 rate with zero quantization error.
    """
    M = mbits
    E = n_bits - sign_bits - M
    two_pow_E = jnp.exp2(E)
    grid_top = 2.0 - jnp.exp2(-M)
    bias = two_pow_E - jnp.log2(maxval) + jnp.log2(grid_top) - 1.0

    minval = jnp.where(sign_bits > 0, -maxval, 0.0)
    xc = jnp.clip(x, minval, maxval)
    log_scales = jnp.maximum(jnp.floor(jnp.log2(jnp.abs(xc)) + bias), 1.0)
    pow2 = jnp.exp2(log_scales - M - two_pow_E + 1.0)
    scales = pow2 * (maxval / grid_top)
    m = jnp.round(xc / scales)
    if normalized:
        return m * pow2
    return m * scales


def _fp8_channel_factor(maxval, mbits):
    """Per-channel epilogue factor for normalized FP8 operands."""
    return maxval / (2.0 - jnp.exp2(-mbits))


def _int_sym_quantize_tile(x, delta, n_bits, normalized=False, signed=1.0):
    """Symmetric INT fake-quant (uniform_quantizers.py:290-297).

    ``signed`` (f32 scalar 0/1) selects the grid: signed [-2^(n-1), 2^(n-1)-1]
    or unsigned [0, 2^n - 1] — set from the quantizer's calibrated state so
    the kernel matches the composed-XLA oracle on all-non-negative channels.
    ``normalized=True`` returns the bare integers (<= 8 significand bits,
    exact in bf16); the caller multiplies ``delta`` back in the epilogue.
    """
    delta = jnp.maximum(delta, 1e-8)
    int_min = jnp.where(signed > 0, -(2.0 ** (n_bits - 1)), 0.0)
    int_max = 2.0 ** (n_bits - signed) - 1.0
    m = jnp.clip(jnp.round(x / delta), int_min, int_max)
    return m if normalized else m * delta


def int8_shifted_grid(w, delta, signed, n_bits):
    """Weights on the RECENTERED integer grid (f32 values): wsg = wint - S_w.

    S_w = 128 for unsigned grids (so wsg fits int8), 0 for signed.  Shared
    by the int8 kernels (in-kernel weight quant) and nn/bake.py (baked-int8
    weight storage) so the two paths can never drift.
    """
    delta = jnp.maximum(delta, 1e-8)
    s_w = 128.0 * (1.0 - signed)
    int_min = jnp.where(signed > 0, -(2.0 ** (n_bits - 1)), 0.0)
    int_max = 2.0 ** (n_bits - signed) - 1.0
    return jnp.clip(jnp.round(w / delta), int_min, int_max) - s_w


def _int_asym_quantize_tile(x, delta, zero_float, n_bits, normalized=False):
    """Asymmetric INT fake-quant (uniform_quantizers.py:108-164)."""
    delta = jnp.maximum(delta, 1e-8)
    zp = jnp.clip(jnp.round(zero_float), 0.0, 2.0 ** n_bits - 1.0)
    xint = jnp.clip(jnp.round(x / delta) + zp, 0.0, 2.0 ** n_bits - 1.0)
    return (xint - zp) if normalized else (xint - zp) * delta


def _qmatmul_kernel(x_ref, w_ref, wq_ref, ws_ref, as_ref, scale_ref, shift_ref,
                    out_ref, acc_ref, *, cfg: FusedQuantMatmulConfig):
    """One (i, j, k) grid step.

    Refs: x (bm,bk) f32; w (bk,bn) f32; wq (1,bn) per-channel weight param
    (maxval or delta); ws (1,2) SMEM weight scalars [mbits, sign_bits];
    as (1,3) SMEM act scalars [maxval|delta, mbits|zero_float, sign_bits];
    scale/shift (1,bn) epilogue; out (bm,bn) f32; acc (bm,bn) f32 scratch.
    """
    k = pl.program_id(2)
    nk = pl.num_programs(2)
    norm = cfg.mxu_dtype == "bfloat16"   # normalized-grid operands (bf16-exact)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    if cfg.quantize_input and cfg.act_method == "fp8":
        x = _fp8_quantize_tile(x, as_ref[0, 0], as_ref[0, 1], as_ref[0, 2],
                               normalized=norm, n_bits=float(cfg.act_n_bits))
    elif cfg.quantize_input and cfg.act_method == "int_asym":
        x = _int_asym_quantize_tile(x, as_ref[0, 0], as_ref[0, 1],
                                    cfg.act_n_bits, normalized=norm)

    w = w_ref[:]
    if cfg.weight_method == "fp8":
        w = _fp8_quantize_tile(w, wq_ref[:], ws_ref[0, 0], ws_ref[0, 1],
                               normalized=norm, n_bits=float(cfg.n_bits))
    elif cfg.weight_method == "int_sym":
        w = _int_sym_quantize_tile(w, wq_ref[:], cfg.n_bits, normalized=norm,
                                   signed=ws_ref[0, 1])

    dt = jnp.bfloat16 if norm else jnp.float32
    acc_ref[:] += jnp.dot(x.astype(dt), w.astype(dt),
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        y = acc_ref[:]
        if norm:
            # fold the factored-out operand scales back in (see tile fns)
            if cfg.weight_method == "fp8":
                y = y * _fp8_channel_factor(wq_ref[:], ws_ref[0, 0])
            elif cfg.weight_method == "int_sym":
                y = y * jnp.maximum(wq_ref[:], 1e-8)
            if cfg.quantize_input and cfg.act_method == "fp8":
                y = y * _fp8_channel_factor(as_ref[0, 0], as_ref[0, 1])
            elif cfg.quantize_input and cfg.act_method == "int_asym":
                y = y * jnp.maximum(as_ref[0, 0], 1e-8)
        y = y * scale_ref[:] + shift_ref[:]
        if cfg.activation == "relu":
            y = jnp.maximum(y, 0.0)
        elif cfg.activation == "relu6":
            y = jnp.clip(y, 0.0, 6.0)
        if not cfg.quantize_input:
            if cfg.act_method == "fp8":
                y = _fp8_quantize_tile(y, as_ref[0, 0], as_ref[0, 1],
                                       as_ref[0, 2], normalized=cfg.emit_norm,
                                       n_bits=float(cfg.act_n_bits))
            elif cfg.act_method == "int_asym":
                y = _int_asym_quantize_tile(y, as_ref[0, 0], as_ref[0, 1],
                                            cfg.act_n_bits,
                                            normalized=cfg.emit_norm)
        out_ref[:] = y.astype(out_ref.dtype)


def _qmatmul_int8_kernel(x_ref, w_ref, wq_ref, ws_ref, as_ref, scale_ref,
                         shift_ref, out_ref, acc_ref, xrow_ref, wcol_ref, *,
                         cfg: FusedQuantMatmulConfig):
    """Native-int8 (i, j, k) grid step: s8 x s8 -> s32 MXU accumulation.

    The quantized operands are *integers* (xint - zp for int_asym x, wint for
    int_sym w), so the matmul is exact integer arithmetic — fed to the MXU's
    int8 datapath (v5e: ~394 TOP/s, 2x the bf16 peak) instead of upconverting
    to bf16.  Ranges: xint in [0, 2^a - 1] and unsigned-grid wint in
    [0, 2^b - 1] exceed int8, so both are recentered by 128 where needed and
    the exact algebraic corrections are accumulated alongside:

      sum_k (xint - zp) wint
        = sum_k (xs + 128 - zp)(wsg + S_w)            xs = xint - 128
        = dot(xs, wsg) + S_w * rowsum(xs)             wsg = wint - S_w
          + (128 - zp) * colsum(wsg)                  S_w = 128 if unsigned
          + Kp * (128 - zp) * S_w                         else 0

    rowsum/colsum accumulate in f32 scratch (exact: |sums| < 2^24).  The
    identity holds per element, so K-padding (xint == zp, wint == 0 there)
    cancels exactly.  Epilogue: y = delta_x * delta_w * (dot + corr), then
    the shared y*scale + shift / activation chain.
    """
    k = pl.program_id(2)
    nk = pl.num_programs(2)
    bk = x_ref.shape[1]

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xrow_ref[:] = jnp.zeros_like(xrow_ref)
        wcol_ref[:] = jnp.zeros_like(wcol_ref)

    a_bits = float(cfg.act_n_bits)
    delta_x = jnp.maximum(as_ref[0, 0], 1e-8)
    zp = jnp.clip(jnp.round(as_ref[0, 1]), 0.0, 2.0 ** a_bits - 1.0)
    xint = jnp.clip(jnp.round(x_ref[:] / delta_x) + zp, 0.0,
                    2.0 ** a_bits - 1.0)
    xs = xint - 128.0

    signed = ws_ref[0, 1]
    s_w = 128.0 * (1.0 - signed)
    delta_w = jnp.maximum(wq_ref[:], 1e-8)
    if cfg.w_prequant:
        wsg_i8 = w_ref[:]                    # already int8 recentered grid
        wsg = wsg_i8.astype(jnp.float32)
    else:
        wsg = int8_shifted_grid(w_ref[:], wq_ref[:], signed, cfg.n_bits)
        wsg_i8 = wsg.astype(jnp.int8)

    acc_ref[:] += jax.lax.dot_general(
        xs.astype(jnp.int8), wsg_i8,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    xrow_ref[:] += jnp.sum(xs, axis=1, keepdims=True)   # bcast to (bm, 128)
    wcol_ref[:] += jnp.sum(wsg, axis=0, keepdims=True)

    @pl.when(k == nk - 1)
    def _():
        kp = float(nk * bk)          # static: grid and block are trace-time
        corr = (s_w * xrow_ref[:, :1] + (128.0 - zp) * wcol_ref[:]
                + kp * (128.0 - zp) * s_w)
        y = (acc_ref[:].astype(jnp.float32) + corr) * (delta_x * delta_w)
        y = y * scale_ref[:] + shift_ref[:]
        if cfg.activation == "relu":
            y = jnp.maximum(y, 0.0)
        elif cfg.activation == "relu6":
            y = jnp.clip(y, 0.0, 6.0)
        out_ref[:] = y.astype(out_ref.dtype)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_quant_matmul(x: jax.Array, w: jax.Array,
                       weight_channel_param: jax.Array,
                       weight_scalars: jax.Array,
                       act_scalars: jax.Array,
                       scale: jax.Array, shift: jax.Array,
                       *, cfg: FusedQuantMatmulConfig,
                       interpret: bool = False) -> jax.Array:
    """y = epilogue(fakequant(x) @ fakequant(w)).

    Args:
      x: (M, K) float32.
      w: (K, N) float32.
      weight_channel_param: (N,) per-channel maxval (fp8) / delta (int_sym);
        pass ones for weight_method="none".
      weight_scalars: (2,) f32 [mantissa_bits, sign_bits] (fp8; ignored int).
      act_scalars: (3,) f32 — fp8: [maxval, mantissa_bits, sign_bits];
        int_asym: [delta, zero_float, 0]; ignored for act_method="none".
      scale, shift: (N,) epilogue y*scale + shift (bias: scale=1 shift=b;
        folded BN: scale=gamma*rsqrt(var+eps), shift=beta-mean*scale).
      cfg: static config.
      interpret: run in interpreter mode (CPU tests).
    """
    M, K = x.shape
    K2, N = w.shape
    assert K == K2, (x.shape, w.shape)
    if cfg.emit_norm:
        assert cfg.act_method != "none" and not cfg.quantize_input, cfg
    int8_path = cfg.mxu_dtype == "int8"
    if int8_path:
        assert (cfg.weight_method == "int_sym"
                and cfg.act_method == "int_asym" and cfg.quantize_input
                and not cfg.emit_norm), cfg
        if cfg.w_prequant:
            assert w.dtype == jnp.int8, w.dtype
    out_dtype = jnp.bfloat16 if cfg.emit_norm else jnp.float32

    # Mosaic compiles for TPU only; the CPU backend (tests) runs the
    # interpreter — numerics identical.  AOT tools override via
    # ops/pallas/common.INTERPRET_OVERRIDE (forces Mosaic lowering without
    # initializing a backend — the probe hangs when the tunnel is down).
    from fp8_quantization_tpu.ops.pallas.common import use_interpret
    interpret = use_interpret(interpret)

    bm_c, bn_c, bk_c = cfg.block_m, cfg.block_n, cfg.block_k
    if (bm_c, bn_c, bk_c) == (256, 256, 512) and min(M, K, N) >= 2048:
        # measured on v5e: 512^3 blocks run 8192^3 at 67 TF/s vs 37 with the
        # small default blocks (better operand reuse per VMEM residency);
        # larger blocks (512x1024x512: 83 TF/s) exceed the 16MB VMEM budget
        # once the output-quant epilogue's buffers are added
        bm_c, bn_c, bk_c = 512, 512, 512
    bm = min(bm_c, max(8, M))
    bn = min(bn_c, max(128, N))
    bk = min(bk_c, max(128, K))

    xp = _pad_to(_pad_to(x, bm, 0), bk, 1)
    if int8_path and cfg.w_prequant:
        # pad with the shifted-grid zero (wint=0 -> wsg = -S_w) so padded
        # K rows cancel exactly in the recentering identity
        pad_val = (-128.0 * (1.0 - weight_scalars[1])).astype(jnp.int8)
        kp_ = (-w.shape[0]) % bk
        np_ = (-w.shape[1]) % bn
        wp = jnp.pad(w, ((0, kp_), (0, np_)), constant_values=pad_val)
    else:
        wp = _pad_to(_pad_to(w, bk, 0), bn, 1)
    Mp, Kp = xp.shape
    Np = wp.shape[1]

    # per-channel vectors as (1, Np) rows
    wc = _pad_to(weight_channel_param.reshape(1, -1).astype(jnp.float32), bn, 1)
    if cfg.weight_method == "fp8":
        # padded channels need a positive maxval (log2 of 0 poisons the tile)
        wc = jnp.where(wc > 0, wc, 1.0)
    sc = _pad_to(scale.reshape(1, -1).astype(jnp.float32), bn, 1)
    sh = _pad_to(shift.reshape(1, -1).astype(jnp.float32), bn, 1)

    ws = weight_scalars.reshape(1, 2).astype(jnp.float32)
    if cfg.weight_method == "fp8":
        mb = jnp.clip(jnp.round(ws[0, 0]), 1.0, cfg.n_bits - ws[0, 1])
        ws = ws.at[0, 0].set(mb)
    ascal = act_scalars.reshape(1, 3).astype(jnp.float32)
    if cfg.act_method == "fp8":
        ascal = ascal.at[0, 0].set(jnp.maximum(ascal[0, 0], 1e-30))
        mb = jnp.clip(jnp.round(ascal[0, 1]), 1.0,
                      cfg.act_n_bits - ascal[0, 2])
        ascal = ascal.at[0, 1].set(mb)

    grid = (Mp // bm, Np // bn, Kp // bk)

    if int8_path:
        kernel = functools.partial(_qmatmul_int8_kernel, cfg=cfg)
        scratch = [pltpu.VMEM((bm, bn), jnp.int32),
                   pltpu.VMEM((bm, 128), jnp.float32),
                   pltpu.VMEM((1, bn), jnp.float32)]
    else:
        kernel = functools.partial(_qmatmul_kernel, cfg=cfg)
        scratch = [pltpu.VMEM((bm, bn), jnp.float32)]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=4 * (Mp * Kp + Kp * Np + Mp * Np),
            transcendentals=Kp * Np + (Mp * Kp if cfg.quantize_input
                                       else Mp * Np)),
        compiler_params=tpu_compiler_params(cfg.vmem_limit),
        interpret=interpret,
    )(xp, wp, wc, ws, ascal, sc, sh)
    return out[:M, :N]
