"""Quantized Flax layers: the compute path of the framework.

These replace the reference's forward-hook "hijacker" machinery
(hijacker.py:32-112, quantized_folded_bn.py:12-68, autoquant_utils.py:20-174)
with explicit modules whose forward is, per layer:

    [input act-quant]  ->  weight fake-quant  ->  conv/linear (MXU)
    -> BN (fp32, own running stats)  ->  fused activation  ->  [output act-quant]

TPU-first details:
  * NHWC activations / HWIO kernels (XLA's native TPU conv layout).
  * ``config.engine`` selects the compute path: 'parity' runs the
    conv/matmul in fp32 (bit-parity with the reference's F.conv2d on
    fake-quantized operands); 'bf16' quantizes onto the *normalized* grid
    (exact in bfloat16 — a plain bf16 cast of fake-quant outputs would be
    lossy since they carry full fp32 mantissas), runs the MXU at bf16 rate
    and applies the factored-out channel scales post-matmul; 'pallas' uses
    the fused kernel in ops/pallas/qmatmul.py for linear / deep 1x1 convs.
  * BN running stats live in the ``batch_stats`` collection; momentum
    semantics match torch's F.batch_norm (new = (1-m)*old + m*batch).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fp8_quantization_tpu.nn.activations import get_activation
from fp8_quantization_tpu.nn.config import LayerQuantConfig
from fp8_quantization_tpu.nn.factored import Factored, PrequantS8
from fp8_quantization_tpu.nn import factored
from fp8_quantization_tpu.nn.quantizers import Quantizer

Dtype = Any


def _maybe_cast(x, w, matmul_dtype):
    if matmul_dtype is None:
        return x, w
    return x.astype(matmul_dtype), w.astype(matmul_dtype)


def _pack_act_scalars(spec, astate):
    """(a_method, a_scalars(3,)) from a quantizer spec + state dict: the
    fused kernels' scalar operand layout (fp8: [maxval, mantissa_bits,
    sign_bits]; int_asym: [scale, zero_point, 0])."""
    from fp8_quantization_tpu.ops.quantizer import QMethod
    from fp8_quantization_tpu.ops.uniform import _scale_from_delta

    if spec.method == QMethod.fp_quantizer:
        return "fp8", jnp.stack([
            astate["maxval"].reshape(()),
            astate["mantissa_bits"].astype(jnp.float32),
            astate["sign_bits"].astype(jnp.float32)])
    return "int_asym", jnp.stack([
        _scale_from_delta(astate["delta"].reshape(()),
                          spec.scale_domain, spec.eps),
        astate["zero_float"].reshape(()),
        jnp.asarray(0.0, jnp.float32)])


def int8_interchange_ok(cfg: LayerQuantConfig) -> bool:
    """Can layers under this config exchange producer-side s8 operands?

    The model-level predicate for the nn/factored.PrequantS8 protocol: the
    config must select the XLA s8 datapath (int8_mxu + quantize_input) with
    the grid shapes ops/int8.py supports — mirrors the per-layer routing in
    ``QuantizedLayerBase._int8_xla_ok`` minus the call-time mode/flags,
    which the model checks at the wiring site (models/vit.py).
    """
    from fp8_quantization_tpu.ops.quantizer import QMethod

    return (cfg.int8_mxu and cfg.quantize_input and cfg.quant_a
            and cfg.act_quant.method == QMethod.asymmetric_uniform
            and not cfg.act_quant.per_channel
            and cfg.act_quant.n_bits <= 8
            and cfg.weight_quant.method == QMethod.symmetric_uniform
            and cfg.weight_quant.n_bits <= 8)


def _factored_act_ok(cfg: LayerQuantConfig) -> bool:
    """Whether this layer's output-quant can emit a Factored tensor.

    The normalized grid must be bf16-exact (<= 8 significand bits) and the
    factor must be a per-tensor scalar (scalars commute through convs;
    per-input-channel scales would not).
    """
    return (cfg.engine in ("bf16", "pallas")
            and not cfg.act_quant.per_channel
            and cfg.act_quant.n_bits <= 8)


class QuantizedLayerBase(nn.Module):
    """Shared quantizer plumbing (counterpart of QuantizationHijacker)."""

    config: LayerQuantConfig = LayerQuantConfig()
    activation: Optional[str] = None
    matmul_dtype: Optional[Dtype] = None

    def _act_quantizer(self) -> Quantizer:
        return Quantizer(spec=self.config.act_quant,
                         range_spec=self.config.act_range, name="act_q")

    def _weight_quantizer(self, num_channels: int) -> Quantizer:
        return Quantizer(spec=self.config.weight_quant,
                         range_spec=self.config.weight_range,
                         num_channels=num_channels if self.config.weight_quant.per_channel
                         else None,
                         channel_axis=-1, name="weight_q")

    def _quant_in(self, x, mode, quant_a):
        if self.config.quantize_input and quant_a and self.config.quant_a:
            return self._act_quantizer()(x, mode=mode)
        return x

    def _quant_in_engine(self, x, mode, quant_a):
        """(x', x_factor) — input quantization honoring the engine.

        Under 'bf16'/'pallas' the input is quantized onto the normalized
        grid (exact in bf16); its per-tensor factor multiplies the matmul
        output, avoiding the lossy bf16 cast of a full-scale fake-quant
        value (code-review finding).
        """
        if self.config.quantize_input and quant_a and self.config.quant_a:
            q_mod = self._act_quantizer()
            if self.config.engine in ("bf16", "pallas"):
                return q_mod(x, mode=mode, out="factored")
            return q_mod(x, mode=mode), None
        return x, None

    def _quant_w(self, w, mode, quant_w, num_channels, param_name="kernel"):
        if quant_w and self.config.quant_w:
            wq = self._weight_quantizer(num_channels)(w, mode=mode)
            self.sow("baked_weights", param_name, wq,
                     init_fn=lambda: 0., reduce_fn=lambda _, v: v)
            return wq
        return w

    def _quant_out(self, y, mode, quant_a, out: str = "value"):
        """Activation + output quantization.

        ``out='factored'`` (fixed-mode fast path): emit
        ``Factored(norm_bf16, factor)`` instead of the full-scale fp32
        fake-quant value — the quant chain fuses into this layer's epilogue
        and writes half the bytes; the consumer feeds ``norm`` straight to
        the MXU (zero-loss) and folds ``factor`` after its matmul.
        Falls back to a plain array whenever this layer does not quantize
        its output (quant_a off / quantize_input configs / >8-bit grids).
        """
        act = get_activation(self.activation)
        if act is not None:
            y = act(y)
        if (not self.config.quantize_input) and quant_a and self.config.quant_a:
            q_mod = self._act_quantizer()
            if out == "factored" and _factored_act_ok(self.config):
                norm, factor = q_mod(y, mode=mode, out="factored")
                return Factored(factored.storage_dtype(norm), factor)
            return q_mod(y, mode=mode)
        return y

    def _affine_epilogue(self, y, w_factor, x_factor, folded_shift, features,
                         mode, train_bn, bn: bool, bn_eps: float,
                         bn_momentum: float, use_bias: bool):
        """Post-matmul channel algebra: factors, then BN / folded shift / bias.

        In ``mode='fixed'`` inference the chain
        ``((y*w_factor)*x_factor)*bn_inv + bn_shift`` is FOLDED into a single
        ``y*S + B`` — the per-channel products are (C,)-sized (negligible)
        while the unfolded chain costs 3 VPU passes per element.  Bit-exact
        for the parity engine (factors are None there and `_batch_norm`'s
        eval expression is exactly ``y*inv + (beta - mean*inv)``); for the
        factored engines the reassociation differs by ~1 ulp f32, far below
        the bf16 matmul rounding those engines already carry.  Training /
        calibration modes keep the original op order (BN batch stats must see
        the full-scale tensor).
        """
        fold = mode == "fixed" and not train_bn
        if not fold:
            if w_factor is not None:
                y = y * w_factor
            if x_factor is not None:
                y = y * x_factor
            if folded_shift is not None:
                return y + folded_shift
            if bn:
                return _batch_norm(self, y, features, bn_eps, bn_momentum,
                                   train_bn)
            if use_bias:
                return y + self.param("bias", nn.initializers.zeros,
                                      (features,), jnp.float32)
            return y

        scale, shift = None, None
        if w_factor is not None:
            scale = w_factor
        if x_factor is not None:
            scale = x_factor if scale is None else scale * x_factor
        if folded_shift is not None:
            shift = folded_shift
        elif bn:
            gamma = self.param("gamma", nn.initializers.ones,
                               (features,), jnp.float32)
            beta = self.param("beta", nn.initializers.zeros,
                              (features,), jnp.float32)
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros(features, jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones(features, jnp.float32))
            inv = jax.lax.rsqrt(ra_var.value + bn_eps) * gamma
            shift = beta - ra_mean.value * inv
            scale = inv if scale is None else scale * inv
        elif use_bias:
            shift = self.param("bias", nn.initializers.zeros,
                               (features,), jnp.float32)
        if scale is not None:
            y = y * scale
        if shift is not None:
            y = y + shift
        return y

    # ---- engine paths -----------------------------------------------------

    def _engine_operands(self, x, kernel, mode, quant_w, num_channels):
        """(xm, wm, w_factor) honoring config.engine.

        'bf16'/'pallas': weights fake-quantized onto the normalized grid
        (exact in bf16, ops/quantizer.apply_factored), activations cast to
        bf16; the per-channel factor multiplies the matmul output.
        """
        eng = self.config.engine
        if quant_w and self.config.quant_w:
            wq_mod = self._weight_quantizer(num_channels)
            if eng in ("bf16", "pallas"):
                wn, w_factor = wq_mod(kernel, mode=mode, out="factored")
                # bake support (nn/bake.py): sow the normalized kernel and
                # its factor; bake writes the kernel into params and the
                # factor into the 'baked' collection so quant_w=False
                # inference drops this whole chain with identical outputs.
                self.sow("baked_weights", "kernel", wn,
                         init_fn=lambda: 0., reduce_fn=lambda _, v: v)
                self.sow("baked_weights", "w_factor",
                         jnp.asarray(w_factor, jnp.float32).reshape(-1),
                         init_fn=lambda: 0., reduce_fn=lambda _, v: v)
                return (x.astype(jnp.bfloat16), wn.astype(jnp.bfloat16),
                        w_factor)
            w = wq_mod(kernel, mode=mode)
            # no-op unless the caller makes 'baked_weights' mutable
            # (nn/bake.py: precompute fake-quantized weights for inference)
            self.sow("baked_weights", "kernel", w,
                     init_fn=lambda: 0., reduce_fn=lambda _, v: v)
            xm, wm = _maybe_cast(x, w, self.matmul_dtype)
            return xm, wm, None
        if eng in ("bf16", "pallas"):
            w_factor = None
            if self.has_variable("baked", "w_factor"):
                # baked normalized kernel: params hold bf16-exact grid values;
                # the channel factor was stowed by nn/bake.py
                wf = self.get_variable("baked", "w_factor")
                w_factor = wf.reshape((1,) * (x.ndim - 1) + (-1,))
            return (x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
                    w_factor)
        xm, wm = _maybe_cast(x, kernel, self.matmul_dtype)
        return xm, wm, None

    def _pallas_supported(self, mode, train_bn) -> bool:
        from fp8_quantization_tpu.ops.quantizer import QMethod

        cfg = self.config
        if cfg.engine != "pallas" or mode != "fixed" or train_bn:
            return False
        if self.activation not in (None, "relu", "relu6"):
            return False
        if cfg.quant_w and cfg.weight_quant.method not in (
                QMethod.fp_quantizer, QMethod.symmetric_uniform):
            return False
        if cfg.quant_a and (cfg.act_quant.method not in (
                QMethod.fp_quantizer, QMethod.asymmetric_uniform)
                or cfg.act_quant.per_channel):
            return False
        return True

    def _conv_out_dtype(self, mode, quant_a, out):
        """Matmul/conv output dtype.

        When the output is about to be re-quantized onto an <=8-bit grid
        (factored fast path) and ``config.conv_out_bf16`` opts in, the conv
        may emit bfloat16 (fp32 MXU accumulation, bf16 store): the ~2^-9
        store rounding is far below the quantizer's own step and the
        epilogue's HBM traffic halves.  fp32 otherwise.
        """
        cfg = self.config
        if (cfg.conv_out_bf16 and out == "factored" and mode == "fixed"
                and quant_a and cfg.quant_a and not cfg.quantize_input
                and _factored_act_ok(cfg)):
            return jnp.bfloat16
        return jnp.float32

    def _pallas_wins(self, x_shape, features) -> bool:
        """Shape gate for the fused kernel vs the XLA conv path.

        Measured on v5e (RESULTS.md): the fused kernel wins on deep/narrow
        1x1s (late MobileNet layers); tall-skinny early layers tile better
        as XLA convs.  ops/pallas/autotune.py overrides this heuristic with
        on-device measurement when enabled.
        """
        from fp8_quantization_tpu.ops.pallas.autotune import pallas_wins
        m = 1
        for d in x_shape[:-1]:
            m *= d
        return pallas_wins(m, x_shape[-1], features)

    def _bn_folded_kernel(self, kernel, features, bn_eps):
        """bn_mode='folded': BN scale folded into the weights *before*
        quantization (the paper's deployment assumption — per-channel weight
        scale absorbs gamma/sqrt(var+eps); changes numerics vs 'fp32_after',
        SURVEY.md §7 hard parts).  Returns (folded_kernel, shift).

        Uses running stats: folding is an inference-time transform
        (the reference's BNFusedHijacker keeps BN separate for training).
        """
        gamma = self.param("gamma", nn.initializers.ones,
                           (features,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros,
                          (features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        inv = jax.lax.rsqrt(ra_var.value + bn_eps) * gamma
        shape = [1] * (kernel.ndim - 1) + [features]
        return kernel * inv.reshape(shape), beta - ra_mean.value * inv

    def _act_quant_scalars(self, x2d, mode, quant_a):
        """(a_method, a_scalars) for a fused kernel's act-quant epilogue.

        a_scalars layout (3,): fp8 -> [maxval, mantissa_bits, sign_bits];
        int_asym -> [scale, zero_point, 0].  'none' when this layer does not
        quantize activations.
        """
        cfg = self.config
        if not (quant_a and cfg.quant_a):
            return "none", jnp.zeros((3,), jnp.float32)
        _, astate = self._act_quantizer()(x2d, mode=mode, out="state")
        return _pack_act_scalars(cfg.act_quant, astate)

    def _act_factor(self, a_method, a_scalars):
        """Per-tensor factor of the Factored output (norm * factor == value)."""
        if a_method == "fp8":
            mb = jnp.clip(jnp.round(a_scalars[1]), 1.0,
                          self.config.act_quant.n_bits - a_scalars[2])
            return a_scalars[0] / (2.0 - jnp.exp2(-mb))
        return a_scalars[0]   # int_asym: the scale itself

    def _deploy_scale(self, scale, x_factor, baked_w_factor: bool):
        """Fold the factored-input scalar and the baked per-channel weight
        factor into a fused kernel's epilogue scale (both commute through
        the matmul; shift stays unscaled — scale applies before shift)."""
        if x_factor is not None:
            scale = scale * jnp.asarray(x_factor, jnp.float32).reshape(())
        if baked_w_factor:
            scale = scale * self.get_variable("baked", "w_factor").reshape(-1)
        return scale

    def _pallas_forward(self, x2d, kernel2d, features, mode, quant_w, quant_a,
                        bn, bn_eps, use_bias, shift_override=None,
                        x_factor=None, out: str = "value"):
        """Fused quant-matmul for (M, K) x (K, N) with bias/BN + activation
        + act quant in the kernel epilogue (ops/pallas/qmatmul.py).

        ``x_factor`` (incoming Factored input): folded into the epilogue
        scale (scalars commute through the matmul).  ``out='factored'``:
        the epilogue emits the *normalized* output (bf16) and the act
        factor is returned alongside (cross-layer factored protocol).
        """
        from fp8_quantization_tpu.ops.pallas import (
            FusedQuantMatmulConfig, fused_quant_matmul)
        from fp8_quantization_tpu.ops.quantizer import QMethod

        if x2d.dtype.itemsize == 1:
            # f8-stored factored input (store_f8 mode): exact upcast before
            # the kernel — Mosaic tiling wants >=2-byte operand dtypes.
            x2d = x2d.astype(jnp.bfloat16)
        cfg = self.config
        ones = jnp.ones((features,), jnp.float32)

        # weight quantizer state
        w_method = "none"
        w_channel, w_scalars = ones, jnp.zeros((2,), jnp.float32)
        prequant = (cfg.int8_mxu and cfg.quantize_input and quant_a
                    and cfg.quant_a
                    and cfg.act_quant.method == QMethod.asymmetric_uniform
                    and self.has_variable("baked_int8", "w_int8")
                    and not self.is_mutable_collection("baked_int8"))
        if prequant:
            # baked-int8 weights (nn/bake.bake_int8_weights): the kernel
            # consumes the stored integer grid, no weight quant in the step.
            # Takes precedence over the in-kernel chain so deployment keeps
            # the standard quant_w=True call convention (un-baked layers
            # still fake-quant correctly).
            w_method = "int_sym"
            # 1x1 convs bake the 4-D (1,1,C,F) kernel; the matmul kernel
            # wants (K, N)
            kernel2d = self.get_variable(
                "baked_int8", "w_int8").reshape(-1, features)
            w_channel = self.get_variable("baked_int8", "w_delta")
            w_scalars = jnp.stack([
                jnp.asarray(0.0, jnp.float32),
                self.get_variable("baked_int8", "w_signed").reshape(())])
        elif quant_w and cfg.quant_w:
            _, wstate = self._weight_quantizer(features)(
                kernel2d, mode=mode, out="state")
            if cfg.weight_quant.method == QMethod.fp_quantizer:
                w_method = "fp8"
                w_channel = jnp.broadcast_to(
                    wstate["maxval"].reshape(-1), (features,)) \
                    if cfg.weight_quant.per_channel else \
                    jnp.full((features,), wstate["maxval"].reshape(()))
                w_scalars = jnp.stack([
                    wstate["mantissa_bits"].astype(jnp.float32),
                    wstate["sign_bits"].astype(jnp.float32)])
            else:  # symmetric_uniform
                from fp8_quantization_tpu.ops.uniform import _scale_from_delta
                w_method = "int_sym"
                scale = _scale_from_delta(wstate["delta"],
                                          cfg.weight_quant.scale_domain,
                                          cfg.weight_quant.eps)
                w_channel = (jnp.broadcast_to(scale.reshape(-1), (features,))
                             if cfg.weight_quant.per_channel
                             else jnp.full((features,), scale.reshape(())))
                # slot 1 carries the calibrated signedness for the kernel grid
                w_scalars = jnp.stack([
                    jnp.asarray(0.0, jnp.float32),
                    wstate["signed"].astype(jnp.float32)])
                if cfg.int8_mxu and cfg.quantize_input:
                    self._sow_int8_weights(kernel2d, w_channel,
                                           wstate["signed"])

        # act quantizer state (input-quant or output-quant)
        a_method, a_scalars = self._act_quant_scalars(x2d, mode, quant_a)

        # epilogue: bias or BN-with-running-stats folded to scale/shift,
        # then the factored-input scalar / baked weight factor
        scale, shift = self._fixed_scale_shift(features, bn, bn_eps,
                                               use_bias, shift_override)
        scale = self._deploy_scale(
            scale, x_factor,
            baked_w_factor=(not (quant_w and cfg.quant_w)
                            and self.has_variable("baked", "w_factor")))

        emit_norm = (out == "factored" and a_method != "none"
                     and not cfg.quantize_input and _factored_act_ok(cfg))
        # native int8 MXU datapath (config.int8_mxu): only the int_sym x
        # int_asym input-quant combination maps onto s8 x s8 -> s32
        mxu = ("int8" if (cfg.int8_mxu and w_method == "int_sym"
                          and a_method == "int_asym" and cfg.quantize_input
                          and not emit_norm)
               else "bfloat16")
        kcfg = FusedQuantMatmulConfig(
            weight_method=w_method, act_method=a_method,
            quantize_input=cfg.quantize_input, activation=self.activation,
            n_bits=cfg.weight_quant.n_bits, act_n_bits=cfg.act_quant.n_bits,
            mxu_dtype=mxu, emit_norm=emit_norm,
            w_prequant=kernel2d.dtype == jnp.int8)
        y = fused_quant_matmul(x2d, kernel2d, w_channel, w_scalars,
                               a_scalars, scale, shift, cfg=kcfg)
        if not emit_norm:
            return y
        return Factored(y, self._act_factor(a_method, a_scalars))


    def _conv3_group(self, n, h, w):
        """Images per kernel grid step: target M = g*H*W ~ 6k rows — large
        enough to amortize the epilogue and weight DMA per grid step, sized
        for the kernels' explicit 96 MiB scoped-VMEM limit (common.py).
        This is only the STARTING point: the autotune gate walks divisors
        of n downward until the kernel actually compiles, then (auto mode)
        keeps it only if it beats XLA."""
        g = max(1, 6144 // max(1, h * w))
        while g > 1 and n % g:
            g -= 1
        return g

    def _pallas_conv3x3(self, x, kernel, features, mode, quant_a, bn, bn_eps,
                        use_bias, shift_override=None, x_factor=None,
                        out: str = "value", stride: int = 1,
                        group: Optional[int] = None):
        """Fused 3x3 stride-1 conv (ops/pallas/qconv.py), deployment path:
        baked normalized weights (w_factor folded into the epilogue scale),
        factored input (x_factor likewise), folded BN/bias, activation and
        output quant in the kernel epilogue."""
        from fp8_quantization_tpu.ops.pallas.qconv import (
            FusedConvConfig, fused_quant_conv3x3)

        cfg = self.config
        if x.dtype.itemsize == 1:       # f8-stored factored input
            x = x.astype(jnp.bfloat16)

        a_method, a_scalars = self._act_quant_scalars(
            x.reshape(-1, x.shape[-1]), mode, quant_a)
        scale, shift = self._fixed_scale_shift(features, bn, bn_eps,
                                               use_bias, shift_override)
        # baked normalized kernel factor (gate requires it to be present)
        scale = self._deploy_scale(scale, x_factor, baked_w_factor=True)

        emit_norm = (out == "factored" and a_method != "none"
                     and _factored_act_ok(cfg))
        n_, h_, w__ = x.shape[:3]
        if group is None:
            group = self._conv3_group(n_, h_ // stride, w__ // stride)
        kcfg = FusedConvConfig(
            act_method=a_method, act_n_bits=cfg.act_quant.n_bits,
            activation=self.activation, emit_norm=emit_norm, stride=stride,
            imgs_per_block=group)
        y = fused_quant_conv3x3(x, kernel, a_scalars, scale, shift, cfg=kcfg)
        if not emit_norm:
            return y
        return Factored(y, self._act_factor(a_method, a_scalars))

    def _pallas_dwconv3x3(self, x, kernel, features, mode, quant_a, bn,
                          bn_eps, use_bias, shift_override=None,
                          x_factor=None, out: str = "value", stride: int = 1,
                          group: int = 1):
        """Fused depthwise 3x3 conv (ops/pallas/qconv.fused_quant_dwconv3x3),
        deployment path: baked normalized weights (per-channel w_factor
        folds into the epilogue scale — output channel c touches only input
        channel c), folded BN/bias, relu6, output quant in-kernel."""
        from fp8_quantization_tpu.ops.pallas.qconv import (
            FusedConvConfig, fused_quant_dwconv3x3)

        cfg = self.config
        if x.dtype.itemsize == 1:       # f8-stored factored input
            x = x.astype(jnp.bfloat16)

        a_method, a_scalars = self._act_quant_scalars(
            x.reshape(-1, x.shape[-1]), mode, quant_a)
        scale, shift = self._fixed_scale_shift(features, bn, bn_eps,
                                               use_bias, shift_override)
        scale = self._deploy_scale(scale, x_factor, baked_w_factor=True)

        emit_norm = (out == "factored" and a_method != "none"
                     and _factored_act_ok(cfg))
        kcfg = FusedConvConfig(
            act_method=a_method, act_n_bits=cfg.act_quant.n_bits,
            activation=self.activation, emit_norm=emit_norm, stride=stride,
            imgs_per_block=group)
        y = fused_quant_dwconv3x3(x, kernel.reshape(3, 3, features),
                                  a_scalars, scale, shift, cfg=kcfg)
        if not emit_norm:
            return y
        return Factored(y, self._act_factor(a_method, a_scalars))

    def _pallas_conv3x3_int8(self, x, kernel, features, mode, bn, bn_eps,
                             use_bias, shift_override=None, group=1,
                             prequant=False, stride: int = 1):
        """Native-int8 fused 3x3 conv (input-quant INT configs): int_asym
        input + int_sym weights on the s8 MXU datapath
        (ops/pallas/qconv._qconv3x3_int8_kernel).  Weights are quantized
        in-kernel, or — ``prequant`` (after nn/bake.bake_int8_weights) —
        arrive pre-quantized int8 from the 'baked_int8' collection with the
        whole weight round/clip chain removed from the step."""
        from fp8_quantization_tpu.ops.pallas.qconv import (
            FusedConvConfig, fused_quant_conv3x3)
        from fp8_quantization_tpu.ops.uniform import _scale_from_delta

        cfg = self.config
        _, a_scalars = self._act_quant_scalars(
            x.reshape(-1, x.shape[-1]), mode, quant_a=True)

        if prequant:
            kernel = self.get_variable("baked_int8", "w_int8")
            w_channel = self.get_variable("baked_int8", "w_delta")
            w_scalars = jnp.stack([
                jnp.asarray(0.0, jnp.float32),
                self.get_variable("baked_int8", "w_signed").reshape(())])
        else:
            k2d = kernel.reshape(-1, features)
            _, wstate = self._weight_quantizer(features)(k2d, mode=mode,
                                                         out="state")
            w_delta = _scale_from_delta(wstate["delta"],
                                        cfg.weight_quant.scale_domain,
                                        cfg.weight_quant.eps)
            w_channel = (jnp.broadcast_to(w_delta.reshape(-1), (features,))
                         if cfg.weight_quant.per_channel
                         else jnp.full((features,), w_delta.reshape(())))
            w_scalars = jnp.stack([jnp.asarray(0.0, jnp.float32),
                                   wstate["signed"].astype(jnp.float32)])
            self._sow_int8_weights(kernel, w_channel, wstate["signed"])

        scale, shift = self._fixed_scale_shift(features, bn, bn_eps,
                                               use_bias, shift_override)

        kcfg = FusedConvConfig(
            act_method="int_asym", act_n_bits=cfg.act_quant.n_bits,
            activation=self.activation, mxu_dtype="int8",
            n_bits=cfg.weight_quant.n_bits, imgs_per_block=group,
            w_prequant=prequant, stride=stride)
        return fused_quant_conv3x3(
            x, kernel, a_scalars, scale, shift,
            weight_channel_param=w_channel, weight_scalars=w_scalars,
            cfg=kcfg)

    def _fixed_scale_shift(self, features, bn, bn_eps, use_bias,
                           shift_override=None):
        """Folded epilogue (scale, shift) for fixed-mode inference: BN
        running stats / folded-BN shift / bias as a single y*S + B."""
        scale = jnp.ones((features,), jnp.float32)
        shift = jnp.zeros((features,), jnp.float32)
        if shift_override is not None:
            shift = shift_override
        elif bn:
            gamma = self.param("gamma", nn.initializers.ones,
                               (features,), jnp.float32)
            beta = self.param("beta", nn.initializers.zeros,
                              (features,), jnp.float32)
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros(features, jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones(features, jnp.float32))
            inv = jax.lax.rsqrt(ra_var.value + bn_eps) * gamma
            scale, shift = inv, beta - ra_mean.value * inv
        elif use_bias:
            shift = self.param("bias", nn.initializers.zeros,
                               (features,), jnp.float32)
        return scale, shift

    def _int8_xla_ok(self, mode, train_bn, quant_w, quant_a,
                     x_factor_in) -> bool:
        """Route this op through the XLA-native s8 datapath (ops/int8.py)?

        The default int8_mxu route: XLA lowers s8 x s8 -> s32 convs/dots
        onto the MXU at 2x bf16 rate and fuses the quant prologue /
        dequant epilogue itself — measured faster than both the bf16
        fake-quant chain AND the Pallas im2col int8 kernels at every
        probed ResNet shape (ops/int8.py module docstring).
        """
        from fp8_quantization_tpu.ops.quantizer import QMethod

        cfg = self.config
        del x_factor_in   # a Factored input is materialized at the call
        # site and re-quantized by THIS layer's input quantizer — exactly
        # the parity engine's semantics for quantize_input configs
        # (engine='parity' + int8_mxu is therefore legal: the integer
        # datapath reproduces the reference chain to f32 rounding)
        if not (cfg.int8_mxu and cfg.quantize_input and mode == "fixed"
                and not train_bn):
            return False
        if not (quant_a and cfg.quant_a
                and cfg.act_quant.method == QMethod.asymmetric_uniform
                and not cfg.act_quant.per_channel
                and cfg.act_quant.n_bits <= 8):
            return False
        if (cfg.weight_quant.method != QMethod.symmetric_uniform
                or cfg.weight_quant.n_bits > 8):
            return False
        prequant = (self.has_variable("baked_int8", "w_int8")
                    and not self.is_mutable_collection("baked_int8"))
        return prequant or (quant_w and cfg.quant_w)

    def _int8_weight_state(self, kernel, features, mode):
        """(wsg8, w_delta, signed): int8 weights on the recentered grid.

        Prequant (after nn/bake.bake_int8_weights): straight from the
        'baked_int8' collection, no weight math in the step.  Otherwise
        quantized in-graph (and sown for bake).
        """
        from fp8_quantization_tpu.ops.pallas.qmatmul import int8_shifted_grid
        from fp8_quantization_tpu.ops.uniform import _scale_from_delta

        cfg = self.config
        if (self.has_variable("baked_int8", "w_int8")
                and not self.is_mutable_collection("baked_int8")):
            return (self.get_variable("baked_int8", "w_int8"),
                    self.get_variable("baked_int8", "w_delta"),
                    self.get_variable("baked_int8", "w_signed").reshape(()))
        k2d = kernel.reshape(-1, features)
        _, wstate = self._weight_quantizer(features)(k2d, mode=mode,
                                                     out="state")
        w_delta = _scale_from_delta(wstate["delta"],
                                    cfg.weight_quant.scale_domain,
                                    cfg.weight_quant.eps)
        w_channel = (jnp.broadcast_to(w_delta.reshape(-1), (features,))
                     if cfg.weight_quant.per_channel
                     else jnp.full((features,), w_delta.reshape(())))
        signed = wstate["signed"].astype(jnp.float32).reshape(())
        self._sow_int8_weights(kernel, w_channel, wstate["signed"])
        wsg8 = int8_shifted_grid(kernel, w_channel, signed,
                                 cfg.weight_quant.n_bits).astype(jnp.int8)
        return wsg8, w_channel, signed

    def _int8_act_state(self, x2d, mode):
        """(a_delta, a_zero) from the asymmetric-uniform act quantizer."""
        from fp8_quantization_tpu.ops.uniform import _scale_from_delta

        cfg = self.config
        _, astate = self._act_quantizer()(x2d, mode=mode, out="state")
        a_delta = _scale_from_delta(astate["delta"].reshape(()),
                                    cfg.act_quant.scale_domain,
                                    cfg.act_quant.eps)
        return a_delta, astate["zero_float"].reshape(())

    def _sow_int8_weights(self, kernel, w_channel, signed):
        """Stow the recentered-int8 weights for nn/bake.bake_int8_weights.

        A no-op unless the caller makes 'baked_int8' mutable (the sown
        values are dead code otherwise and DCE'd by XLA).  Stored: the int8
        grid weights, the per-channel delta, and the grid signedness — all
        a deployment step needs to run the kernels with w_prequant=True.
        """
        from fp8_quantization_tpu.ops.pallas.qmatmul import int8_shifted_grid

        if self.is_initializing():
            # init makes EVERY collection mutable — storing the
            # uncalibrated grid here would shadow the real bake
            return
        wsg = int8_shifted_grid(kernel, w_channel, signed.astype(jnp.float32),
                                self.config.weight_quant.n_bits)
        keep = lambda _, v: v  # noqa: E731
        self.sow("baked_int8", "w_int8", wsg.astype(jnp.int8),
                 init_fn=lambda: 0., reduce_fn=keep)
        self.sow("baked_int8", "w_delta", w_channel,
                 init_fn=lambda: 0., reduce_fn=keep)
        self.sow("baked_int8", "w_signed",
                 signed.astype(jnp.float32).reshape(()),
                 init_fn=lambda: 0., reduce_fn=keep)


def _batch_norm(mdl: nn.Module, y, features: int, eps: float, momentum: float,
                train_bn: bool):
    """fp32 BN after the quantized op — reference parity
    (quantized_folded_bn.py:39-48: weights quantized pre-BN-scaling;
    BN keeps its own running stats / gamma / beta in full precision)."""
    gamma = mdl.param("gamma", nn.initializers.ones, (features,), jnp.float32)
    beta = mdl.param("beta", nn.initializers.zeros, (features,), jnp.float32)
    ra_mean = mdl.variable("batch_stats", "mean",
                           lambda: jnp.zeros(features, jnp.float32))
    ra_var = mdl.variable("batch_stats", "var",
                          lambda: jnp.ones(features, jnp.float32))
    if train_bn and not mdl.is_initializing():
        axes = tuple(range(y.ndim - 1))
        mean = jnp.mean(y, axis=axes)
        var = jnp.var(y, axis=axes)
        n = y.size / features
        # torch F.batch_norm updates running_var with the *unbiased* batch var
        ra_mean.value = (1 - momentum) * ra_mean.value + momentum * mean
        ra_var.value = ((1 - momentum) * ra_var.value
                        + momentum * var * n / max(n - 1, 1))
    else:
        mean, var = ra_mean.value, ra_var.value
    inv = jax.lax.rsqrt(var + eps) * gamma
    return y * inv + (beta - mean * inv)


class QuantConv(QuantizedLayerBase):
    """Quantized 2-D convolution, optionally BN-fused.

    Reference: QuantConv / BNQConv (autoquant_utils.py:33-43,107-117) +
    BNFusedHijacker (quantized_folded_bn.py:12-68).
    """

    features: int = 0
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = ((0, 0), (0, 0))
    feature_group_count: int = 1
    use_bias: bool = False
    bn: bool = False
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    # space-to-depth stem transform (ops/s2d.py): run the 7x7/s2/p3 conv as
    # an EXACT 4x4/s1 conv on the block-2 s2d input — applied after weight
    # fake-quant, so numerics are unchanged for every quant method.  Opt-in
    # (QuantizedResNet.stem_s2d); only the general XLA conv path consumes it.
    #   False    off
    #   True     transform the input in-graph (one extra HBM pass)
    #   "input"  the input ALREADY arrives s2d'd (N, H/2, W/2, 4*cin) — the
    #            serving pipeline delivers the transform (a free host-side
    #            memory shuffle, the MLPerf-TPU pattern); the kernel param
    #            keeps its original (7,7,cin,F) shape for checkpoint parity
    s2d: Union[bool, str] = False

    def _conv_fused_state(self, x, mode, quant_w, quant_a, train_bn):
        """Deployment introspection for block-level fusion
        (ops/pallas/qblock.py): this layer's baked normalized kernel, folded
        epilogue (scale, shift) and output-quant scalars, WITHOUT running
        the conv — the parent block stitches the stages into one kernel.
        Returns None when the layer is not in the baked deployment state
        the block kernel assumes (same gates as the per-layer fused paths).
        """
        cfg = self.config
        x, _ = factored.split(x)
        in_features = x.shape[-1]
        if (mode != "fixed" or train_bn or (quant_w and cfg.quant_w)
                or not self.has_variable("baked", "w_factor")
                or cfg.quantize_input or cfg.int8_mxu
                or (self.bn and cfg.bn_mode == "folded")):
            return None
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (*self.kernel_size, in_features // self.feature_group_count,
             self.features), jnp.float32)
        a_method, a_scalars = self._act_quant_scalars(
            jnp.zeros((1, 8), jnp.float32), mode, quant_a)
        scale, shift = self._fixed_scale_shift(self.features, self.bn,
                                               self.bn_eps, self.use_bias)
        scale = scale * self.get_variable("baked", "w_factor").reshape(-1)
        return dict(kernel=kernel, scale=scale, shift=shift,
                    a_method=a_method, a_scalars=a_scalars.reshape(3),
                    factor=(self._act_factor(a_method, a_scalars)
                            if a_method != "none" else None),
                    factored_ok=_factored_act_ok(cfg),
                    n_bits=cfg.act_quant.n_bits)

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, train_bn: bool = False,
                 out: str = "value"):
        if mode == "fp32":
            mode, quant_w, quant_a = "fixed", False, False
        if out == "fused_state":
            return self._conv_fused_state(x, mode, quant_w, quant_a,
                                          train_bn)
        x, x_factor_in = factored.split(x)
        in_features = x.shape[-1]
        if self.s2d == "input":
            # pre-s2d serving input: the array carries 4*cin channels but
            # the param (and all quant state) stays in original geometry
            in_features //= 4
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (*self.kernel_size, in_features // self.feature_group_count,
             self.features), jnp.float32)

        folded_shift = None
        if self.bn and self.config.bn_mode == "folded":
            if train_bn:
                raise ValueError("bn_mode='folded' is an inference-time mode; "
                                 "train with bn_mode='fp32_after'")
            kernel, folded_shift = self._bn_folded_kernel(
                kernel, self.features, self.bn_eps)

        from fp8_quantization_tpu.ops.pallas import autotune as _at
        int8_xla = (self._int8_xla_ok(mode, train_bn, quant_w, quant_a,
                                      x_factor_in)
                    and not self.s2d)   # s2d rides the general conv path

        # fully fused Pallas path: 1x1 conv == matmul (MobileNetV2's dominant
        # op); quant + matmul + BN/bias + act + out-quant in one kernel.
        # 1x1 stride-2 (ResNet downsample shortcuts) == the same matmul on
        # the even/even phase slice — the slice is plain XLA, outside the
        # kernel, and only survives if the kernel path is actually taken.
        # int8 configs skip it for the XLA-native s8 route below (measured
        # faster) unless autotune 'always' mode forces the Pallas kernels.
        if (self._pallas_supported(mode, train_bn)
                and not (int8_xla and _at.MODE != "always")
                and self.kernel_size == (1, 1)
                and self.feature_group_count == 1
                and self.padding in ("VALID", ((0, 0), (0, 0)))
                and (self.strides == (1, 1)
                     or (self.strides == (2, 2) and x.shape[1] % 2 == 0
                         and x.shape[2] % 2 == 0))):
            xs = x if self.strides == (1, 1) else x[:, ::2, ::2, :]
            if self._pallas_wins(xs.shape, self.features):
                n, h, w_, c = xs.shape
                y2d = self._pallas_forward(
                    xs.reshape(-1, c), kernel.reshape(c, self.features),
                    self.features, mode, quant_w, quant_a,
                    self.bn and folded_shift is None, self.bn_eps,
                    self.use_bias, shift_override=folded_shift,
                    x_factor=x_factor_in, out=out)
                if isinstance(y2d, Factored):
                    return Factored(y2d.norm.reshape(n, h, w_, self.features),
                                    y2d.factor)
                return y2d.reshape(n, h, w_, self.features)

        # fused 3x3 paths (ops/pallas/qconv.py), gated by on-device
        # measurement (autotune.conv3_group):
        #  - deployment (baked normalized weights, output-quant configs)
        #  - native-int8 (input-quant INT configs, int8_mxu)
        # stride 2 (ResNet downsample blocks) joins via the kernel's
        # even/odd phase decomposition (needs even H, W — always true for
        # the zoo's 56/28/14 downsample inputs).
        # cin >= 8: an RGB-deep (cin=3) im2col can't tile the 128-lane
        # registers, and its odd-K int8 dot trips lowering bugs on both
        # XLA:CPU (mixed i8/i32 add) and Mosaic (unsupported shape cast) —
        # stem convs belong to XLA regardless.
        if (self._pallas_supported(mode, train_bn)
                and self.kernel_size == (3, 3)
                and self.feature_group_count == 1
                and self.padding == ((1, 1), (1, 1))
                and x.shape[-1] >= 8
                and (self.strides == (1, 1)
                     or (self.strides == (2, 2) and x.shape[1] % 2 == 0
                         and x.shape[2] % 2 == 0))):
            from fp8_quantization_tpu.ops.quantizer import QMethod

            cfg_ = self.config
            stride = self.strides[0]
            deploy_ok = (not (quant_w and cfg_.quant_w)
                         and self.has_variable("baked", "w_factor")
                         and not cfg_.quantize_input)
            int8_base = (cfg_.int8_mxu and cfg_.quantize_input and quant_a
                         and cfg_.quant_a and x_factor_in is None
                         and cfg_.weight_quant.method
                         == QMethod.symmetric_uniform
                         and cfg_.act_quant.method
                         == QMethod.asymmetric_uniform)
            int8_prequant = (
                int8_base and self.has_variable("baked_int8", "w_int8")
                and not self.is_mutable_collection("baked_int8"))
            int8_ok = (int8_base and quant_w
                       and cfg_.quant_w) or int8_prequant
            if deploy_ok or int8_ok:
                from fp8_quantization_tpu.ops.pallas.autotune import (
                    conv3_group, conv3_int8_group)
                n, h, w_, _ = x.shape
                g0 = self._conv3_group(n, h // stride, w_ // stride)
                if int8_ok:
                    # the int8 kernel's VMEM envelope is tighter (i32-vreg
                    # operands): group size resolved by compile-probe
                    gi = conv3_int8_group(n, h, x.shape[-1], self.features,
                                          g0, prequant=int8_prequant,
                                          stride=stride)
                    if gi:
                        return self._pallas_conv3x3_int8(
                            x, kernel, self.features, mode,
                            self.bn and folded_shift is None, self.bn_eps,
                            self.use_bias, shift_override=folded_shift,
                            group=gi, prequant=int8_prequant, stride=stride)
                else:
                    gb = conv3_group(n, h, x.shape[-1], self.features, g0,
                                     stride=stride)
                    if gb:
                        return self._pallas_conv3x3(
                            x, kernel, self.features, mode, quant_a,
                            self.bn and folded_shift is None, self.bn_eps,
                            self.use_bias, shift_override=folded_shift,
                            x_factor=x_factor_in, out=out, stride=stride,
                            group=gb)

        # XLA-native s8 datapath (ops/int8.py) — the DEFAULT int8_mxu
        # route: s8 x s8 -> s32 on the MXU through XLA's own conv tiling,
        # quant prologue + dequant/BN/act epilogue fused by the compiler.
        # General over kernel size / stride / padding (stem 7x7 and 1x1
        # shortcuts included); groups limited to 1 or pure depthwise (the
        # rowsum zero-point correction is per-group).
        if int8_xla and (self.feature_group_count == 1
                         or (self.feature_group_count == in_features
                             and self.features == in_features)):
            from fp8_quantization_tpu.ops.int8 import int8_conv
            if x_factor_in is not None:
                x = x.astype(jnp.float32) * x_factor_in
            wsg8, w_delta, signed = self._int8_weight_state(
                kernel, self.features, mode)
            a_delta, a_zero = self._int8_act_state(
                x.reshape(-1, in_features), mode)
            scale, shift = self._fixed_scale_shift(
                self.features, self.bn and folded_shift is None,
                self.bn_eps, self.use_bias, folded_shift)
            return int8_conv(
                x, wsg8, w_delta, signed, a_delta, a_zero,
                self.config.act_quant.n_bits, strides=self.strides,
                padding=self.padding,
                feature_group_count=self.feature_group_count,
                scale=scale, shift=shift,
                act_fn=get_activation(self.activation),
                out_bf16=self.config.conv_out_bf16,
                signed_static=self.config.int8_assume_signed)

        # fused depthwise 3x3 (MobileNetV2's dw stage): 9-tap VPU stencil +
        # folded BN + relu6 + out-quant in one kernel — collapses the
        # composed path's multiple HBM round trips.  Deployment (baked
        # weights) only; gated by on-device measurement (autotune.dw_group).
        if (self._pallas_supported(mode, train_bn)
                and self.kernel_size == (3, 3)
                and self.feature_group_count == in_features
                and self.features == in_features
                and in_features >= 32   # lane packing; measurement decides
                and self.padding == ((1, 1), (1, 1))
                and (self.strides == (1, 1)
                     or (self.strides == (2, 2) and x.shape[1] % 2 == 0
                         and x.shape[2] % 2 == 0))
                and not (quant_w and self.config.quant_w)
                and self.has_variable("baked", "w_factor")
                and not self.config.quantize_input):
            from fp8_quantization_tpu.ops.pallas.autotune import dw_group
            n, h, w_, _ = x.shape
            stride = self.strides[0]
            gd = dw_group(n, h, in_features,
                          self._conv3_group(n, h // stride, w_ // stride),
                          stride=stride)
            if gd:
                return self._pallas_dwconv3x3(
                    x, kernel, self.features, mode, quant_a,
                    self.bn and folded_shift is None, self.bn_eps,
                    self.use_bias, shift_override=folded_shift,
                    x_factor=x_factor_in, out=out, stride=stride, group=gd)

        if x_factor_in is None:
            x, x_factor = self._quant_in_engine(x, mode, quant_a)
        else:
            x_factor = x_factor_in   # input arrived pre-quantized (Factored)
        xm, wm, w_factor = self._engine_operands(x, kernel, mode, quant_w,
                                                 self.features)
        strides, padding = self.strides, self.padding
        if (self.s2d and self.kernel_size == (7, 7)
                and self.strides == (2, 2)
                and self.padding == ((3, 3), (3, 3))
                and self.feature_group_count == 1
                and xm.ndim == 4
                and (self.s2d == "input"
                     or (xm.shape[1] % 2 == 0 and xm.shape[2] % 2 == 0))):
            from fp8_quantization_tpu.ops.s2d import (s2d_stem_kernel,
                                                      space_to_depth)
            if self.s2d != "input":
                xm = space_to_depth(xm)
            wm, strides, padding = s2d_stem_kernel(wm)
        y = jax.lax.conv_general_dilated(
            xm, wm, window_strides=strides, padding=padding,
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self._conv_out_dtype(mode, quant_a, out))
        y = self._affine_epilogue(
            y.astype(jnp.float32), w_factor, x_factor, folded_shift,
            self.features, mode, train_bn, self.bn, self.bn_eps,
            self.bn_momentum, self.use_bias)
        return self._quant_out(y, mode, quant_a, out=out)


class QuantConv1d(QuantizedLayerBase):
    """Quantized 1-D convolution (NWC / WIO).

    Reference: QuantConv1d (autoquant_utils.py:20-31).  Our channel-last
    convention also covers the reference's transposed-conv per-channel
    transpose trick (autoquant_utils.py:46-58) for free: output channels are
    ALWAYS the last kernel axis here, for convs and transposed convs alike.
    """

    features: int = 0
    kernel_size: int = 3
    strides: int = 1
    padding: Union[str, Sequence[Tuple[int, int]]] = ((0, 0),)
    feature_group_count: int = 1
    use_bias: bool = True
    bn: bool = False
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, train_bn: bool = False,
                 out: str = "value"):
        if mode == "fp32":
            mode, quant_w, quant_a = "fixed", False, False
        x, x_factor_in = factored.split(x)
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (self.kernel_size, x.shape[-1] // self.feature_group_count,
             self.features), jnp.float32)

        folded_shift = None
        if self.bn and self.config.bn_mode == "folded":
            if train_bn:
                raise ValueError("bn_mode='folded' is an inference-time mode")
            kernel, folded_shift = self._bn_folded_kernel(
                kernel, self.features, self.bn_eps)

        if x_factor_in is None:
            x, x_factor = self._quant_in_engine(x, mode, quant_a)
        else:
            x_factor = x_factor_in
        xm, wm, w_factor = self._engine_operands(x, kernel, mode, quant_w,
                                                 self.features)
        y = jax.lax.conv_general_dilated(
            xm, wm, window_strides=(self.strides,), padding=self.padding,
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=self._conv_out_dtype(
                mode, quant_a, out)).astype(jnp.float32)
        y = self._affine_epilogue(
            y, w_factor, x_factor, folded_shift, self.features, mode,
            train_bn, self.bn, self.bn_eps, self.bn_momentum, self.use_bias)
        return self._quant_out(y, mode, quant_a, out=out)


class QuantConvTranspose(QuantizedLayerBase):
    """Quantized N-D transposed convolution (channel-last).

    Reference: QuantConvTranspose1d/QuantConvTranspose
    (autoquant_utils.py:61-86).  The reference needs a transpose trick
    because torch stores transposed-conv kernels (I, O, *): per-channel
    quantization must hit O.  Our kernels are (*spatial, I, O) with O last —
    the same channel_axis=-1 path as every other layer, no trick.
    """

    features: int = 0
    kernel_size: Tuple[int, ...] = (3, 3)
    strides: Tuple[int, ...] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, train_bn: bool = False,
                 out: str = "value"):
        if mode == "fp32":
            mode, quant_w, quant_a = "fixed", False, False
        x, x_factor_in = factored.split(x)
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (*self.kernel_size, x.shape[-1], self.features), jnp.float32)

        if x_factor_in is None:
            x, x_factor = self._quant_in_engine(x, mode, quant_a)
        else:
            x_factor = x_factor_in
        xm, wm, w_factor = self._engine_operands(x, kernel, mode, quant_w,
                                                 self.features)
        y = jax.lax.conv_transpose(
            xm, wm, strides=self.strides, padding=self.padding,
            preferred_element_type=self._conv_out_dtype(
                mode, quant_a, out)).astype(jnp.float32)
        y = self._affine_epilogue(
            y, w_factor, x_factor, None, self.features, mode, train_bn,
            False, 1e-5, 0.1, self.use_bias)
        return self._quant_out(y, mode, quant_a, out=out)


class QuantLinear(QuantizedLayerBase):
    """Quantized dense layer.  Reference: QuantLinear (autoquant_utils.py:89-91),
    BNQLinear (:120-122)."""

    features: int = 0
    use_bias: bool = True
    bn: bool = False
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, train_bn: bool = False,
                 out: str = "value", emit_s8=None):
        if out == "in_state":
            # PrequantS8 probe (models/vit.py): expose this layer's frozen
            # input-quant scalars so its PRODUCER can run the s8 prologue
            # inside its own epilogue fusion.  Reads/creates the same
            # 'act_q' state the real call uses (per-tensor => shape-free);
            # the dummy never reaches an estimator in fixed mode.  Pattern
            # precedent: QuantizedActivation's out='fused_state'.
            if (not self.is_initializing()
                    and self.is_mutable_collection("quant")):
                # a mutable 'quant' collection means estimators are live
                # (calibration): the dummy would overwrite range state with
                # zeros.  Every legitimate probe site is fixed-mode-only
                # (_i8_fast); fail loudly on misuse.
                raise ValueError(
                    "out='in_state' probed while the 'quant' collection is "
                    "mutable — the PrequantS8 probe is a fixed-mode "
                    "(frozen-estimator) protocol")
            return self._int8_act_state(jnp.zeros((1, 8), jnp.float32), mode)
        if mode == "fp32":
            mode, quant_w, quant_a = "fixed", False, False
        pre_in = x if isinstance(x, PrequantS8) else None
        if pre_in is not None:
            x, x_factor_in = pre_in.xs8, None
        else:
            x, x_factor_in = factored.split(x)
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (in_features, self.features), jnp.float32)

        folded_shift = None
        if self.bn and self.config.bn_mode == "folded":
            if train_bn:
                raise ValueError("bn_mode='folded' is an inference-time mode; "
                                 "train with bn_mode='fp32_after'")
            kernel, folded_shift = self._bn_folded_kernel(
                kernel, self.features, self.bn_eps)

        # XLA-native s8 datapath (see QuantConv): default int8_mxu route
        # for the dense layer; 'always' autotune mode forces the Pallas
        # fused int8 matmul instead (research escape hatch).
        from fp8_quantization_tpu.ops.pallas import autotune as _at
        use_int8 = (self._int8_xla_ok(mode, train_bn, quant_w, quant_a,
                                      x_factor_in) and _at.MODE != "always")
        if pre_in is not None and not use_int8:
            # producer emitted s8 but this layer's int8 route is gated off
            # (e.g. autotune MODE='always'): recover the real-valued input
            x = factored.materialize(pre_in)
        if use_int8:
            from fp8_quantization_tpu.ops.int8 import int8_matmul
            if pre_in is not None:
                # producer-side interchange: x IS the recentered s8 operand
                # on THIS layer's input grid; prologue already done
                a_delta, a_zero = pre_in.delta, pre_in.zero
            else:
                if x_factor_in is not None:
                    x = x.astype(jnp.float32) * x_factor_in
                a_delta, a_zero = self._int8_act_state(
                    x.reshape(-1, in_features), mode)
            x2d = x.reshape(-1, in_features)
            wsg8, w_delta, signed = self._int8_weight_state(
                kernel, self.features, mode)
            scale, shift = self._fixed_scale_shift(
                self.features, self.bn and folded_shift is None,
                self.bn_eps, self.use_bias, folded_shift)
            y2d = int8_matmul(x2d, wsg8, w_delta, signed, a_delta, a_zero,
                              self.config.act_quant.n_bits, scale=scale,
                              shift=shift,
                              act_fn=get_activation(self.activation),
                              out_bf16=self.config.conv_out_bf16,
                              signed_static=self.config.int8_assume_signed,
                              x_prequant=pre_in is not None,
                              emit_s8=emit_s8)
            y = y2d.reshape(*x.shape[:-1], self.features)
            if emit_s8 is not None:
                return PrequantS8(y, *emit_s8)
            return y

        if (self._pallas_supported(mode, train_bn)
                and self._pallas_wins(x.shape, self.features)):
            # fused kernel is 2-D; collapse leading batch dims and restore
            x2d = x.reshape(-1, x.shape[-1])
            y2d = self._pallas_forward(
                x2d, kernel, self.features, mode, quant_w, quant_a,
                self.bn and folded_shift is None, self.bn_eps, self.use_bias,
                shift_override=folded_shift, x_factor=x_factor_in, out=out)
            shape = (*x.shape[:-1], self.features)
            if isinstance(y2d, Factored):
                return Factored(y2d.norm.reshape(shape), y2d.factor)
            return y2d.reshape(shape)

        if x_factor_in is None:
            x, x_factor = self._quant_in_engine(x, mode, quant_a)
        else:
            x_factor = x_factor_in
        xm, wm, w_factor = self._engine_operands(x, kernel, mode, quant_w,
                                                 self.features)
        y = jnp.dot(xm, wm, preferred_element_type=self._conv_out_dtype(
            mode, quant_a, out)).astype(jnp.float32)
        y = self._affine_epilogue(
            y, w_factor, x_factor, folded_shift, self.features, mode,
            train_bn, self.bn, self.bn_eps, self.bn_momentum, self.use_bias)
        return self._quant_out(y, mode, quant_a, out=out)


class QuantLayerNorm(QuantizedLayerBase):
    """Quantized LayerNorm (gamma quantized as the 'weight').

    Reference: QuantLayerNorm (autoquant_utils.py:166-174) — present for
    transformer-style models; unused by the CNN zoo.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, out: str = "value", emit_s8=None, **_):
        if mode == "fp32":
            mode, quant_w, quant_a = "fixed", False, False
        # normalization is not scale-invariant in its shift: materialize
        x = factored.materialize(x).astype(jnp.float32)
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        x = self._quant_in(x, mode, quant_a)
        w = self._quant_w(scale, mode, quant_w, features, param_name="scale")

        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * w + bias
        if emit_s8 is not None:
            # producer-side s8 interchange (PrequantS8): the consumer
            # matmul's quant prologue runs HERE, inside the LN fusion that
            # already holds y in registers — the interchange tensor is
            # written once, as 1-byte s8 (models/vit.py int8 fast path)
            from fp8_quantization_tpu.ops.int8 import prequant_s8
            return PrequantS8(prequant_s8(y, *emit_s8), *emit_s8)
        return self._quant_out(y, mode, quant_a, out=out)


class QuantizedActivation(nn.Module):
    """Standalone activation quantizer (e.g. after a residual add).

    Reference: QuantizedActivation (base_quantized_classes.py:156-173).
    """

    config: LayerQuantConfig = LayerQuantConfig()

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_a: bool = True,
                 update_range: bool = True, out: str = "value"):
        if out == "fused_state":
            # block-fusion introspection (see QuantConv._conv_fused_state)
            cfg = self.config
            if mode == "fixed" and quant_a and cfg.quant_a:
                q_mod = Quantizer(spec=cfg.act_quant,
                                  range_spec=cfg.act_range, name="act_q")
                _, astate = q_mod(jnp.zeros((1, 8), jnp.float32),
                                  mode="fixed", out="state")
                a_method, a_scalars = _pack_act_scalars(cfg.act_quant, astate)
                if a_method == "fp8":
                    mb = jnp.clip(jnp.round(a_scalars[1]), 1.0,
                                  cfg.act_quant.n_bits - a_scalars[2])
                    fac = a_scalars[0] / (2.0 - jnp.exp2(-mb))
                else:
                    fac = a_scalars[0]
            else:
                a_method = "none"
                a_scalars, fac = jnp.zeros((3,), jnp.float32), None
            return dict(a_method=a_method, a_scalars=a_scalars, factor=fac,
                        factored_ok=_factored_act_ok(self.config),
                        n_bits=self.config.act_quant.n_bits)
        x = factored.materialize(x)
        if mode != "fp32" and quant_a and self.config.quant_a:
            q_mod = Quantizer(spec=self.config.act_quant,
                              range_spec=self.config.act_range, name="act_q")
            if out == "factored" and _factored_act_ok(self.config):
                norm, factor = q_mod(x, mode=mode, update_range=update_range,
                                     out="factored")
                return Factored(factored.storage_dtype(norm), factor)
            return q_mod(x, mode=mode, update_range=update_range)
        return x
