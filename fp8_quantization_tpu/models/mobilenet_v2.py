"""Quantized MobileNetV2 (tonylins variant) in Flax (NHWC / HWIO).

Topology mirrors the reference's models/mobilenet_v2.py (width-mult table at
:74-83, AvgPool2d inside features at :101) as quantized by
models/mobilenet_v2_quantized.py: every conv+bn(+relu6) window is a BN-fused
quantized conv; residual blocks end with add -> block activation quantizer
(:21-26); the avg pool is quantized by the *tied* quantizer of the final
1x1 conv without range update (tie_activation_quantizers,
autoquant_utils.py:309-336); classifier = dropout + quantized linear.

The final conv's output quantizer is hoisted to the model scope so the
avgpool tie is plain linen module re-use (same trick as resnet.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn

from fp8_quantization_tpu.nn.config import LayerQuantConfig
from fp8_quantization_tpu.nn.factored import fadd, fmean, materialize
from fp8_quantization_tpu.nn.layers import QuantConv, QuantizedActivation, QuantLinear

# (expand_ratio t, channels c, repeats n, stride s) — mobilenet_v2.py:74-83
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class QuantInvertedResidual(nn.Module):
    """[pw-expand + relu6] -> dw + relu6 -> pw-linear, optional residual.

    Reference: mobilenet_v2.py:27-65 + mobilenet_v2_quantized.py:15-26.
    ``dw_config`` allows the fc4_dw8 preset's depthwise override (:52-60).
    """

    features: int
    strides: Tuple[int, int]
    expand_ratio: int
    config: LayerQuantConfig
    dw_config: Optional[LayerQuantConfig] = None
    expand_config: Optional[LayerQuantConfig] = None
    block_act_config: Optional[LayerQuantConfig] = None

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, train_bn: bool = False,
                 out: str = "value"):
        kw = dict(mode=mode, quant_w=quant_w, quant_a=quant_a,
                  train_bn=train_bn, out=out)
        inp = (x.norm if hasattr(x, "norm") else x).shape[-1]
        hidden = round(inp * self.expand_ratio)
        use_res = self.strides == (1, 1) and inp == self.features

        expand_mod = None
        if self.expand_ratio != 1:
            expand_mod = QuantConv(
                features=hidden, kernel_size=(1, 1), strides=(1, 1),
                padding=((0, 0), (0, 0)), bn=True, activation="relu6",
                config=self.expand_config or self.config, name="expand")
        dw_mod = QuantConv(
            features=hidden, kernel_size=(3, 3), strides=self.strides,
            padding=((1, 1), (1, 1)), feature_group_count=hidden,
            bn=True, activation="relu6",
            config=self.dw_config or self.config, name="dw")
        proj_mod = QuantConv(
            features=self.features, kernel_size=(1, 1), strides=(1, 1),
            padding=((0, 0), (0, 0)), bn=True, activation=None,
            config=self.config, name="project")
        blk_mod = None
        if use_res:
            blk_mod = QuantizedActivation(
                config=self.block_act_config or self.config, name="block_act")

        # whole-block fused kernel (ops/pallas/qblock.py): all three stages
        # + quant epilogues in VMEM per group of images, gated by on-device
        # measurement.  Falls through to the per-layer path when the block
        # is not in baked deployment state or the gate says XLA.
        if mode == "fixed" and not train_bn and self.config.engine == "pallas":
            y = self._fused_forward(x, expand_mod, dw_mod, proj_mod, blk_mod,
                                    hidden, use_res, mode, quant_w, quant_a,
                                    train_bn, out)
            if y is not None:
                return y

        y = x
        if expand_mod is not None:
            y = expand_mod(y, **kw)
        y = dw_mod(y, **kw)
        y = proj_mod(y, **kw)

        if use_res:
            y = fadd(x, y)
            y = blk_mod(y, mode=mode, quant_a=quant_a, out=out)
        return y

    def _fused_forward(self, x, expand_mod, dw_mod, proj_mod, blk_mod,
                       hidden, use_res, mode, quant_w, quant_a, train_bn,
                       out):
        """Assemble and launch the fused inverted-residual kernel, or None.

        Stage scales are assembled exactly as the unfused factored path
        folds them (nn/layers._deploy_scale): each stage's epilogue scale
        carries its baked weight factor, its BN inverse, and the UPSTREAM
        stage's activation factor; shifts stay unscaled.
        """
        import jax.numpy as jnp

        from fp8_quantization_tpu.nn import factored as fct
        from fp8_quantization_tpu.nn.factored import Factored
        from fp8_quantization_tpu.ops.pallas import autotune as at
        from fp8_quantization_tpu.ops.pallas.qblock import (
            FusedBlockConfig, fused_inverted_residual)

        xv, xf = fct.split(x)
        if xv.ndim != 4 or xv.shape[-1] < 8:
            return None
        n, H, W, cin = xv.shape
        stride = self.strides[0]
        if self.strides != (stride, stride) or stride not in (1, 2):
            return None
        if stride == 2 and (H % 2 or W % 2):
            return None

        kwf = dict(mode=mode, quant_w=quant_w, quant_a=quant_a,
                   train_bn=train_bn, out="fused_state")
        st1 = expand_mod(xv, **kwf) if expand_mod is not None else None
        if expand_mod is not None and st1 is None:
            return None
        dummy_h = jnp.zeros((1, 1, 1, hidden), jnp.float32)
        std = dw_mod(dummy_h, **kwf)
        stp = proj_mod(dummy_h, **kwf)
        if std is None or stp is None:
            return None
        stb = (blk_mod(xv, mode=mode, quant_a=quant_a, out="fused_state")
               if use_res else None)

        # VMEM heuristic start: the expanded hidden tensor dominates
        # (~12 bytes/elem of live temporaries); the gate compile-walks down
        g0 = min(n, max(1, int(40e6) // (12 * H * W * hidden)))
        gi = at.ir_group(n, H, cin, hidden, self.features, g0,
                         stride=stride, expand=expand_mod is not None,
                         use_res=use_res)
        if not gi:
            return None

        one = jnp.asarray(1.0, jnp.float32)
        xfac = one if xf is None else jnp.asarray(xf, jnp.float32).reshape(())
        if st1 is not None:
            w1 = st1["kernel"].reshape(cin, hidden)
            scale1, shift1 = st1["scale"] * xfac, st1["shift"]
            f1 = st1["factor"] if st1["factor"] is not None else one
        else:
            w1, scale1, shift1 = None, None, None
            f1 = xfac
        wd = std["kernel"].reshape(3, 3, hidden)
        scale_d = std["scale"] * f1
        fd = std["factor"] if std["factor"] is not None else one
        w2 = stp["kernel"].reshape(hidden, self.features)
        scale2 = stp["scale"] * fd

        zeros3 = jnp.zeros((3,), jnp.float32)
        methods = (st1["a_method"] if st1 else "none", std["a_method"],
                   stp["a_method"], stb["a_method"] if stb else "none")
        bits = (st1["n_bits"] if st1 else 8, std["n_bits"], stp["n_bits"],
                stb["n_bits"] if stb else 8)
        ascal = jnp.stack([st1["a_scalars"] if st1 else zeros3,
                           std["a_scalars"], stp["a_scalars"],
                           stb["a_scalars"] if stb else zeros3])

        final = stb if use_res else stp
        emit = (out == "factored" and final["a_method"] != "none"
                and final["factored_ok"])
        kcfg = FusedBlockConfig(
            expand=st1 is not None, stride=stride, use_res=use_res,
            emit_norm=emit, methods=methods, bits=bits, imgs_per_block=gi)
        y = fused_inverted_residual(
            xv, w1, wd, w2, ascal, scale1, shift1, scale_d, std["shift"],
            scale2, stp["shift"], x_factor=xfac if use_res else None,
            cfg=kcfg)
        if emit:
            return Factored(fct.storage_dtype(y), final["factor"])
        return y


class QuantizedMobileNetV2(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    # override for reduced variants (tests / ablations); default = paper table
    settings: Tuple[Tuple[int, int, int, int], ...] = INVERTED_RESIDUAL_SETTING
    config: LayerQuantConfig = LayerQuantConfig()
    stem_config: Optional[LayerQuantConfig] = None
    head_config: Optional[LayerQuantConfig] = None       # final 1x1 conv
    fc_config: Optional[LayerQuantConfig] = None         # classifier linear
    dw_config: Optional[LayerQuantConfig] = None         # depthwise convs
    expand_config: Optional[LayerQuantConfig] = None     # pw-expand convs
    block_act_config: Optional[LayerQuantConfig] = None  # residual-add quant
    tie_avgpool: bool = True
    # classifier dropout (reference mobilenet_v2.py:69,107 — nn.Dropout
    # before the linear head; default 0.0 so PTQ parity is unaffected, the
    # paper's QAT fine-tune recipe sets it >0).  Active in training forwards
    # (train_bn=True) and draws from the 'dropout' rng stream.
    dropout_rate: float = 0.0

    def weight_spec_fn(self):
        """Param-path -> weight QuantizerSpec, resolving quant_setup preset
        overrides (stem/head/classifier/depthwise) so oscillation dampening
        and freezing (training/oscillation.py) use each layer's ACTUAL grid —
        e.g. fc4_dw8's 8-bit depthwise convs and 4-bit classifier."""
        def fn(path):
            top = path[0] if path else ""
            if top == "stem":
                return (self.stem_config or self.config).weight_quant
            if top == "head":
                return (self.head_config or self.config).weight_quant
            if top == "classifier":
                return (self.fc_config or self.config).weight_quant
            if (top.startswith("block") and len(path) > 1
                    and path[1] == "dw"):
                return (self.dw_config or self.config).weight_quant
            if (top.startswith("block") and len(path) > 1
                    and path[1] == "expand"):
                return (self.expand_config or self.config).weight_quant
            return self.config.weight_quant

        return fn

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, train_bn: bool = False):
        kw = dict(mode=mode, quant_w=quant_w, quant_a=quant_a, train_bn=train_bn)
        cfg = self.config
        # cross-layer factored fast path (see resnet.py / nn/factored.py)
        if mode == "fixed" and cfg.engine in ("bf16", "pallas"):
            kw["out"] = "factored"
        input_channel = int(32 * self.width_mult)
        last_channel = (int(1280 * self.width_mult)
                        if self.width_mult > 1.0 else 1280)

        x = QuantConv(features=input_channel, kernel_size=(3, 3), strides=(2, 2),
                      padding=((1, 1), (1, 1)), bn=True, activation="relu6",
                      config=self.stem_config or cfg, name="stem")(x, **kw)

        for i, (t, c, n, s) in enumerate(self.settings):
            out_c = int(c * self.width_mult)
            for b in range(n):
                strides = (s, s) if b == 0 else (1, 1)
                x = QuantInvertedResidual(
                    features=out_c, strides=strides, expand_ratio=t, config=cfg,
                    dw_config=self.dw_config,
                    expand_config=self.expand_config,
                    block_act_config=self.block_act_config,
                    name=f"block{i}_{b}")(x, **kw)

        # final 1x1 conv: its output quantizer is hoisted here so the avgpool
        # can re-use it (tied, no range update)
        head_cfg = self.head_config or cfg
        x = QuantConv(features=last_channel, kernel_size=(1, 1), strides=(1, 1),
                      padding=((0, 0), (0, 0)), bn=True, activation="relu6",
                      config=head_cfg.fp32_acts() if not head_cfg.quantize_input
                      else head_cfg,
                      name="head")(x, **kw)
        head_q = QuantizedActivation(config=head_cfg, name="head_act")
        if not head_cfg.quantize_input:
            x = head_q(x, mode=mode, quant_a=quant_a,
                       out=kw.get("out", "value"))

        x = fmean(x, axis=(1, 2))
        if self.tie_avgpool and not head_cfg.quantize_input:
            x = head_q(x, mode=mode, quant_a=quant_a, update_range=False,
                       out=kw.get("out", "value"))

        if self.dropout_rate > 0.0:
            from fp8_quantization_tpu.nn.factored import Factored
            drop = nn.Dropout(rate=self.dropout_rate)
            if isinstance(x, Factored):   # dropout scales by 1/keep: commutes
                x = Factored(drop(x.norm, deterministic=not train_bn), x.factor)
            else:
                x = drop(x, deterministic=not train_bn)

        x = QuantLinear(features=self.num_classes, use_bias=True,
                        config=self.fc_config or cfg, name="classifier")(
            x, **{**kw, "out": "value"})   # logits stay a plain array
        return materialize(x)


def mobilenet_v2_configs(base: LayerQuantConfig, quant_setup: Optional[str]):
    """quant_setup presets -> per-layer overrides.

    Reference: mobilenet_v2_quantized.py:45-85.
    """
    setup = quant_setup or "all"
    cfgs = dict(config=base, stem_config=None, head_config=None, fc_config=None,
                dw_config=None, block_act_config=None, tie_avgpool=True)
    if setup == "all":
        return cfgs
    if setup == "FP_logits":
        cfgs["fc_config"] = base.fp32_acts()
        return cfgs
    if setup == "fc4":
        cfgs["stem_config"] = base.with_weight_bits(8)
        cfgs["fc_config"] = base.with_weight_bits(4)
        return cfgs
    if setup == "fc4_dw8":
        cfgs["stem_config"] = base.with_weight_bits(8)
        cfgs["fc_config"] = base.with_weight_bits(4)
        cfgs["dw_config"] = base.with_weight_bits(8)
        return cfgs
    if setup == "dw_bf16_acts":
        # TPU deployment preset (round 5, RESULTS.md): weights quantized
        # everywhere, activations quantized everywhere EXCEPT the
        # VPU-bound expand->dw chain, whose fake-quant epilogues are the
        # measured structural tax on a bf16-MXU chip (the quant select in
        # the expand epilogue breaks fp32-style expand->dw fusion nesting;
        # dropping both lifted MNv2 from 0.70x to 1.03x of fp32 at batch
        # 1024).  Reference precedent for per-layer-class act overrides:
        # LSQ_paper's fp32 block_act / FP_logits
        # (mobilenet_v2_quantized.py:45-85).
        cfgs["expand_config"] = base.fp32_acts()
        cfgs["dw_config"] = base.fp32_acts()
        return cfgs
    if setup == "LSQ":
        cfgs["stem_config"] = base.with_weight_bits(8)
        cfgs["head_config"] = base.with_act_bits(8)
        cfgs["fc_config"] = base.with_weight_bits(8).fp32_acts()
        return cfgs
    if setup == "LSQ_paper":
        qin = base.replace(quantize_input=True)
        cfgs["config"] = qin
        cfgs["stem_config"] = qin.with_weight_bits(8).fp32_acts()
        cfgs["head_config"] = qin
        cfgs["block_act_config"] = qin.fp32_acts()
        cfgs["fc_config"] = qin.with_weight_bits(8).with_act_bits(8)
        cfgs["tie_avgpool"] = False
        return cfgs
    raise ValueError(
        f"Quantization setup '{setup}' not supported for MobilenetV2")


def mobilenetv2_quantized(base: LayerQuantConfig, quant_setup: Optional[str] = None,
                          num_classes: int = 1000, width_mult: float = 1.0,
                          settings=INVERTED_RESIDUAL_SETTING,
                          dropout_rate: float = 0.0) -> QuantizedMobileNetV2:
    return QuantizedMobileNetV2(num_classes=num_classes, width_mult=width_mult,
                                settings=settings, dropout_rate=dropout_rate,
                                **mobilenet_v2_configs(base, quant_setup))
