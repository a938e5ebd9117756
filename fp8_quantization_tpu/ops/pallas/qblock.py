"""Pallas TPU kernel: a whole MobileNetV2 inverted-residual block, fused.

    [expand 1x1 + BN + relu6 + act-quant] ->
    [depthwise 3x3 (stride 1|2) + BN + relu6 + act-quant] ->
    [project 1x1 + BN + act-quant]  [+ residual add + block act-quant]

as ONE kernel per group of images: the t*-expanded hidden tensor exists
only in VMEM.

Why (measured, RESULTS.md round 3): MobileNetV2's deployed fp8 path trails
its own fp32 forward ~1.6x on a v5e even after IEEE-f8 activation storage
halves the HBM bytes (XLA cost analysis 3.94 -> 1.99 GB/step at batch 256)
— neither side is bandwidth-bound at MNv2's shapes, so the residual tax is
kernel STRUCTURE: for the fp32 graph XLA nests each expand conv inside the
following depthwise conv's fusion (the expanded tensor never leaves VMEM,
tools/hlo_entry_bytes.py), while the quant chains between quantized convs
break that nesting into many small kernels.  This kernel restores the
nesting for the quantized graph.

Numerics: identical op sequence to the unfused factored deployment path
(nn/layers.py) — bf16 matmul operands on the exact normalized quantizer
grid, f32 accumulation/epilogues, the reference's quantizer math via the
shared tile fns (qmatmul.py) — so outputs match the unfused bf16-engine
block to accumulation-order noise.  (One deliberate difference: interior
activations never take the deploy_act_f8 storage coarsening, because they
are never stored.)

Reference semantics being fused: mobilenet_v2.py:27-65 (InvertedResidual)
+ mobilenet_v2_quantized.py:15-26 (residual-add -> act quant) + the
per-layer forward chain of hijacker.py:70-86.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fp8_quantization_tpu.ops.pallas.common import tpu_compiler_params
from fp8_quantization_tpu.ops.pallas.qconv import _phases_s2, _taps_s2
from fp8_quantization_tpu.ops.pallas.qmatmul import (
    _fp8_quantize_tile, _int_asym_quantize_tile)

# quant-scalar rows in the packed (4, 3) SMEM operand
ROW_EXPAND, ROW_DW, ROW_PROJECT, ROW_BLOCK = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True)
class FusedBlockConfig:
    """Static configuration of one inverted-residual block."""

    expand: bool = True            # False for the t=1 stem block
    stride: int = 1                # dw stride (1, or 2 via phase decomp)
    use_res: bool = False          # residual add + block act quant
    emit_norm: bool = False        # final output as normalized bf16
    # per-stage output-quantizer methods/bits: (expand, dw, project, block);
    # "none" skips that quantizer (fp32-acts presets)
    methods: Tuple[str, str, str, str] = ("fp8", "fp8", "fp8", "fp8")
    bits: Tuple[int, int, int, int] = (8, 8, 8, 8)
    imgs_per_block: int = 1
    vmem_limit: Optional[int] = None


def _qtile(y, method: str, as_ref, row: int, n_bits: int, normalized: bool):
    """Output fake-quant of one stage (scalars preconditioned in the host
    wrapper: fp8 rows carry [maxval, mbits, sign], int_asym [delta, zp, 0])."""
    if method == "fp8":
        return _fp8_quantize_tile(y, as_ref[row, 0], as_ref[row, 1],
                                  as_ref[row, 2], normalized=normalized,
                                  n_bits=float(n_bits))
    if method == "int_asym":
        return _int_asym_quantize_tile(y, as_ref[row, 0], as_ref[row, 1],
                                       n_bits, normalized=normalized)
    return y


def _ir_block_kernel(*refs, cfg: FusedBlockConfig):
    """One grid step: a group of g images through the whole block.

    Ref order (inputs, then outputs, then scratch — optional refs present
    per cfg): x (g,H,W,cin) bf16; [w1 (cin,hid) bf16]; wd (3,3,hid) f32;
    w2 (hid,cout) bf16; as (4,3) SMEM; [s1/b1 (1,1,1,hid)]; sd/bd
    (1,1,1,hid); s2/b2 (1,1,1,cout); [xf (1,1) SMEM]; out (g,Ho,Wo,cout);
    acc (g*Ho*Wo, cout) f32 scratch.
    """
    i = 0
    x_ref = refs[i]; i += 1                                  # noqa: E702
    w1_ref = None
    if cfg.expand:
        w1_ref = refs[i]; i += 1                             # noqa: E702
    wd_ref = refs[i]; i += 1                                 # noqa: E702
    w2_ref = refs[i]; i += 1                                 # noqa: E702
    as_ref = refs[i]; i += 1                                 # noqa: E702
    if cfg.expand:
        s1_ref, b1_ref = refs[i], refs[i + 1]; i += 2        # noqa: E702
    sd_ref, bd_ref = refs[i], refs[i + 1]; i += 2            # noqa: E702
    s2_ref, b2_ref = refs[i], refs[i + 1]; i += 2            # noqa: E702
    xf_ref = None
    if cfg.use_res:
        xf_ref = refs[i]; i += 1                             # noqa: E702
    out_ref, acc_ref = refs[i], refs[i + 1]

    g, H, W, cin = x_ref.shape
    hid = wd_ref.shape[-1]
    cout = w2_ref.shape[-1]
    Ho, Wo = H // cfg.stride, W // cfg.stride
    m2 = g * Ho * Wo

    # stage 1: expand 1x1 (a pure matmul over m = g*H*W rows)
    if cfg.expand:
        a1 = jax.lax.dot_general(
            x_ref[:].reshape(g * H * W, cin), w1_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y1 = a1 * s1_ref[0, 0, 0, :] + b1_ref[0, 0, 0, :]
        y1 = jnp.clip(y1, 0.0, 6.0)                          # relu6
        h = _qtile(y1, cfg.methods[ROW_EXPAND], as_ref, ROW_EXPAND,
                   cfg.bits[ROW_EXPAND], normalized=True)
        h = h.astype(jnp.bfloat16).reshape(g, H, W, hid)
    else:
        h = x_ref[:]

    # stage 2: depthwise 3x3 — 9-tap VPU stencil (qconv.py facts: pad and
    # offset slices lower on Mosaic; stride 2 via even/odd phase planes)
    if cfg.stride == 2:
        taps = _taps_s2(*_phases_s2(h))
    else:
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [hp[:, dy:dy + H, dx:dx + W, :]
                for dy in range(3) for dx in range(3)]
    accd = None
    for t, (dy, dx) in zip(taps, ((dy, dx) for dy in range(3)
                                  for dx in range(3))):
        term = t.astype(jnp.float32) * wd_ref[dy, dx, :]
        accd = term if accd is None else accd + term
    yd = accd * sd_ref[0, 0, 0, :] + bd_ref[0, 0, 0, :]
    yd = jnp.clip(yd, 0.0, 6.0)                              # relu6
    n2 = _qtile(yd, cfg.methods[ROW_DW], as_ref, ROW_DW,
                cfg.bits[ROW_DW], normalized=True).astype(jnp.bfloat16)

    # stage 3: project 1x1 (matmul over m2 rows), linear epilogue
    acc_ref[:] = jax.lax.dot_general(
        n2.reshape(m2, hid), w2_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y2 = (acc_ref[:].reshape(g, Ho, Wo, cout) * s2_ref[0, 0, 0, :]
          + b2_ref[0, 0, 0, :])

    if cfg.use_res:
        # project's own output quant at FULL scale, then the residual add,
        # then the block activation quantizer (mobilenet_v2_quantized.py
        # :15-26 semantics).  The residual reads the kernel's bf16 operand
        # copy of x — lossless in deployment, where block inputs are
        # bf16-exact factored grid values.
        y2 = _qtile(y2, cfg.methods[ROW_PROJECT], as_ref, ROW_PROJECT,
                    cfg.bits[ROW_PROJECT], normalized=False)
        y2 = y2 + x_ref[:].astype(jnp.float32) * xf_ref[0, 0]
        y = _qtile(y2, cfg.methods[ROW_BLOCK], as_ref, ROW_BLOCK,
                   cfg.bits[ROW_BLOCK], normalized=cfg.emit_norm)
    else:
        y = _qtile(y2, cfg.methods[ROW_PROJECT], as_ref, ROW_PROJECT,
                   cfg.bits[ROW_PROJECT], normalized=cfg.emit_norm)
    out_ref[:] = y.astype(out_ref.dtype)


def _precondition_scalars(act_scalars: jax.Array,
                          cfg: FusedBlockConfig) -> jax.Array:
    """Clamp/round the packed (4, 3) quant scalars per row (the same
    preconditioning fused_quant_conv3x3 applies to its single row)."""
    s = act_scalars.reshape(4, 3).astype(jnp.float32)
    for row in range(4):
        if cfg.methods[row] == "fp8":
            s = s.at[row, 0].set(jnp.maximum(s[row, 0], 1e-30))
            mb = jnp.clip(jnp.round(s[row, 1]), 1.0,
                          cfg.bits[row] - s[row, 2])
            s = s.at[row, 1].set(mb)
    return s


def fused_inverted_residual(x: jax.Array, w1: Optional[jax.Array],
                            wd: jax.Array, w2: jax.Array,
                            act_scalars: jax.Array,
                            scale1: Optional[jax.Array],
                            shift1: Optional[jax.Array],
                            scale_d: jax.Array, shift_d: jax.Array,
                            scale2: jax.Array, shift2: jax.Array,
                            x_factor: Optional[jax.Array] = None,
                            *, cfg: FusedBlockConfig,
                            interpret: bool = False) -> jax.Array:
    """One inverted-residual block, fully fused.

    Args:
      x: (N, H, W, Cin) input norms (bf16-exact factored grid values; the
        per-tensor input factor is folded into ``scale1`` — and passed as
        ``x_factor`` for the residual materialization).
      w1: (Cin, hid) baked normalized expand weights, or None (t=1 blocks).
      wd: (3, 3, hid) baked normalized depthwise weights.
      w2: (hid, Cout) baked normalized project weights.
      act_scalars: (4, 3) quant scalars, rows = (expand, dw, project,
        block-act); fp8 rows [maxval, mantissa_bits, sign_bits], int_asym
        rows [delta, zero_float, 0].
      scale1/shift1, scale_d/shift_d, scale2/shift2: per-channel folded
        epilogues (BN running stats + baked weight factor + the upstream
        stage's activation factor), assembled by the caller exactly as the
        unfused path does.
      x_factor: scalar — the input Factored's factor (residual blocks).
    """
    n, H, W, cin = x.shape
    hid = wd.shape[-1]
    cout = w2.shape[-1]
    assert wd.shape == (3, 3, hid) and w2.shape == (hid, cout)
    assert cfg.expand == (w1 is not None)
    if cfg.expand:
        assert w1.shape == (cin, hid), (w1.shape, cin, hid)
    else:
        assert hid == cin
    assert cfg.stride in (1, 2)
    if cfg.stride == 2:
        assert H % 2 == 0 and W % 2 == 0, (H, W)
    if cfg.use_res:
        assert cfg.stride == 1 and cout == cin and x_factor is not None
    Ho, Wo = H // cfg.stride, W // cfg.stride
    g = min(cfg.imgs_per_block, n)
    while n % g:
        g -= 1

    from fp8_quantization_tpu.ops.pallas.common import use_interpret
    interpret = use_interpret(interpret)
    final_row = ROW_BLOCK if cfg.use_res else ROW_PROJECT
    out_dtype = (jnp.bfloat16
                 if cfg.emit_norm and cfg.methods[final_row] != "none"
                 else jnp.float32)

    ascal = _precondition_scalars(act_scalars, cfg)
    cvec = lambda v, c: v.reshape(1, 1, 1, c).astype(jnp.float32)  # noqa: E731

    x_spec = pl.BlockSpec((g, H, W, cin), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(                       # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    smem = lambda *shape: pl.BlockSpec(                       # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.SMEM)

    in_specs = [x_spec]
    args = [x.astype(jnp.bfloat16)]
    if cfg.expand:
        in_specs.append(full(cin, hid))
        args.append(w1.astype(jnp.bfloat16))
    in_specs += [full(3, 3, hid), full(hid, cout), smem(4, 3)]
    args += [wd.astype(jnp.float32), w2.astype(jnp.bfloat16), ascal]
    if cfg.expand:
        in_specs += [full(1, 1, 1, hid), full(1, 1, 1, hid)]
        args += [cvec(scale1, hid), cvec(shift1, hid)]
    in_specs += [full(1, 1, 1, hid), full(1, 1, 1, hid),
                 full(1, 1, 1, cout), full(1, 1, 1, cout)]
    args += [cvec(scale_d, hid), cvec(shift_d, hid),
             cvec(scale2, cout), cvec(shift2, cout)]
    if cfg.use_res:
        in_specs.append(smem(1, 1))
        args.append(jnp.asarray(x_factor, jnp.float32).reshape(1, 1))

    flops = (2 * n * H * W * cin * hid * (1 if cfg.expand else 0)
             + 18 * n * Ho * Wo * hid + 2 * n * Ho * Wo * hid * cout)
    out = pl.pallas_call(
        functools.partial(_ir_block_kernel, cfg=cfg),
        grid=(n // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, Ho, Wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Ho, Wo, cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((g * Ho * Wo, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * n * (H * W * cin + Ho * Wo * cout)
            + 2 * (cin * hid + 9 * hid + hid * cout),
            transcendentals=n * (H * W * hid + Ho * Wo * (hid + cout))),
        compiler_params=tpu_compiler_params(cfg.vmem_limit),
        interpret=interpret,
    )(*args)
    return out
