"""Quantized ResNet-18/50 in Flax (NHWC / HWIO).

Topology mirrors torchvision's resnet18/resnet50 as quantized by the
reference (models/resnet_quantized.py): every conv+bn(+relu) window becomes a
BN-fused quantized conv; each residual block ends with add -> relu -> block
activation quantizer (resnet_quantized.py:39-46); the global average pool is
quantized with the *tied* quantizer of the last block, without updating its
range (:84-89); the final fc is a quantized linear.

Design difference vs the reference: instead of rewriting an existing module
tree at runtime (autoquant_utils.py:292-381), the quantized topology is the
model definition itself, and the `quant_setup` presets
(all/LSQ/LSQ_paper/FP_logits/fc4, resnet_quantized.py:94-124) become
per-layer config overrides computed at build time.

Block-output quantizers live in the *parent* scope so the avgpool tie is
plain linen module re-use (one module instance, called twice).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from fp8_quantization_tpu.nn.config import LayerQuantConfig
from fp8_quantization_tpu.nn.factored import fadd, fmax_pool, fmean, materialize
from fp8_quantization_tpu.nn.layers import QuantConv, QuantLinear, QuantizedActivation


def _same_pad(k: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    p = k // 2
    return ((p, p), (p, p))


class BasicBlockFeatures(nn.Module):
    """conv3x3-bn-relu -> conv3x3-bn (quantized), no residual/act.

    Reference: QuantizedBlock features for BasicBlock (resnet_quantized.py:29-30).
    """

    features: int
    strides: Tuple[int, int]
    config: LayerQuantConfig

    @nn.compact
    def __call__(self, x, **kw):
        x = QuantConv(features=self.features, kernel_size=(3, 3),
                      strides=self.strides, padding=_same_pad(3), bn=True,
                      activation="relu", config=self.config, name="conv1")(x, **kw)
        x = QuantConv(features=self.features, kernel_size=(3, 3),
                      strides=(1, 1), padding=_same_pad(3), bn=True,
                      activation=None, config=self.config, name="conv2")(x, **kw)
        return x


class BottleneckFeatures(nn.Module):
    """conv1x1-bn-relu -> conv3x3-bn-relu -> conv1x1-bn (expansion 4).

    Reference: QuantizedBlock features for Bottleneck (resnet_quantized.py:18-28).
    """

    features: int          # bottleneck width; output is 4x
    strides: Tuple[int, int]
    config: LayerQuantConfig

    @nn.compact
    def __call__(self, x, **kw):
        x = QuantConv(features=self.features, kernel_size=(1, 1), strides=(1, 1),
                      padding=((0, 0), (0, 0)), bn=True, activation="relu",
                      config=self.config, name="conv1")(x, **kw)
        x = QuantConv(features=self.features, kernel_size=(3, 3),
                      strides=self.strides, padding=_same_pad(3), bn=True,
                      activation="relu", config=self.config, name="conv2")(x, **kw)
        x = QuantConv(features=self.features * 4, kernel_size=(1, 1),
                      strides=(1, 1), padding=((0, 0), (0, 0)), bn=True,
                      activation=None, config=self.config, name="conv3")(x, **kw)
        return x


class QuantizedResNet(nn.Module):
    """ResNet-18/50 with per-layer quantization configs.

    ``stage_sizes``/``bottleneck`` select the variant; configs are produced by
    :func:`resnet_config_overrides` from a base config + quant_setup preset.
    """

    stage_sizes: Sequence[int]
    bottleneck: bool
    num_classes: int = 1000
    config: LayerQuantConfig = LayerQuantConfig()
    stem_config: Optional[LayerQuantConfig] = None      # features[0] overrides
    fc_config: Optional[LayerQuantConfig] = None        # fc overrides
    last_block_config: Optional[LayerQuantConfig] = None  # last block act/convs
    block_act_config: Optional[LayerQuantConfig] = None  # block-output act quant
    tie_avgpool: bool = True                             # False for LSQ_paper
    # exact space-to-depth stem (ops/s2d.py): 7x7/s2 conv on (224,224,3)
    # becomes 4x4/s1 on (112,112,12) — same numerics, MXU-friendly shape.
    # True: transform in-graph; "input": the serving pipeline delivers
    # pre-s2d (N,112,112,12) images (free host-side shuffle, MLPerf-TPU
    # pattern).  Deployment opt-in; the fused Pallas stem path (gated off
    # on v5e) is skipped when enabled because the transform covers the
    # same block.
    stem_s2d: Union[bool, str] = False

    def weight_spec_fn(self):
        """Param-path -> weight QuantizerSpec, resolving quant_setup preset
        overrides (stem/fc/last-block) so oscillation dampening/freezing
        (training/oscillation.py) uses each layer's ACTUAL grid — e.g. the
        fc4 preset's 4-bit fc and 8-bit stem."""
        num_blocks = sum(self.stage_sizes)
        last_name, idx = None, 0
        for stage, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                if idx == num_blocks - 1:
                    last_name = f"layer{stage + 1}_{b}"
                idx += 1

        def fn(path):
            top = path[0] if path else ""
            if top == "stem":
                return (self.stem_config or self.config).weight_quant
            if top == "fc":
                return (self.fc_config or self.config).weight_quant
            if top == last_name:   # block features; downsample keeps base cfg
                return (self.last_block_config or self.config).weight_quant
            return self.config.weight_quant

        return fn

    def _fused_stem(self, stem_mod, x, mode, quant_w, quant_a, train_bn,
                    out):
        """Launch the fused stem kernel (conv7x7/2 + BN + relu + maxpool +
        out-quant, ops/pallas/qstem.py), or None to use the layer path.

        The stem input is the raw (unquantized, full-scale) image, so no
        x-factor folds into the epilogue scale; the fused state's scale
        already carries the baked weight factor and the BN inverse."""
        from fp8_quantization_tpu.nn import factored as fct
        from fp8_quantization_tpu.nn.factored import Factored
        from fp8_quantization_tpu.ops.pallas import autotune as at
        from fp8_quantization_tpu.ops.pallas.qstem import (
            FusedStemConfig, fused_quant_stem)

        if (mode != "fixed" or train_bn or self.config.engine != "pallas"
                or isinstance(x, Factored) or self.stem_s2d):
            return None
        if x.ndim != 4:
            return None
        n, H, W, cin = x.shape
        if H != W or H % 32 or cin > 8:
            return None
        st = stem_mod(x, mode=mode, quant_w=quant_w, quant_a=quant_a,
                      train_bn=train_bn, out="fused_state")
        if st is None:
            return None
        # the gate pins the group internally (g=1 is the only config the
        # compiler's whole-output VMEM staging allows at 224px, measured)
        g0 = 1
        gi, kp = at.stem_group(n, H, cin, 64, g0)
        if not gi:
            return None
        emit = (out == "factored" and st["a_method"] != "none"
                and st["factored_ok"])
        kcfg = FusedStemConfig(act_method=st["a_method"],
                               act_n_bits=st["n_bits"], emit_norm=emit,
                               imgs_per_block=gi, k_pad=kp)
        y = fused_quant_stem(x, st["kernel"], st["a_scalars"], st["scale"],
                             st["shift"], cfg=kcfg)
        if emit:
            return Factored(fct.storage_dtype(y), st["factor"])
        return y

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, train_bn: bool = False):
        kw = dict(mode=mode, quant_w=quant_w, quant_a=quant_a, train_bn=train_bn)
        cfg = self.config
        stem_cfg = self.stem_config or cfg
        fc_cfg = self.fc_config or cfg
        block_act_cfg = self.block_act_config or cfg

        # Fast inference interchange (nn/factored.py): in fixed mode under
        # the bf16/pallas engines, layers exchange Factored(norm_bf16,
        # factor) pairs — quant epilogues write bf16, matmuls consume the
        # exact normalized grid.  Layers that can't emit (fp32 acts,
        # quantize_input presets) return plain arrays; the f* helpers and
        # layer entries accept both.
        if mode == "fixed" and cfg.engine in ("bf16", "pallas"):
            kw["out"] = "factored"

        # stem: conv7x7/2 + bn + relu (BN-fused quantized), then maxpool 3x3/2
        stem_mod = QuantConv(features=64, kernel_size=(7, 7), strides=(2, 2),
                             padding=_same_pad(7), bn=True, activation="relu",
                             config=stem_cfg, s2d=self.stem_s2d, name="stem")
        # fused stem kernel (ops/pallas/qstem.py): conv + BN + relu + pool +
        # out-quant in one pass — the composed chain's 112x112 pre-pool
        # tensor (822 MB at batch 512) never leaves VMEM.  Deployment only,
        # gated by on-device measurement; falls through to the layer +
        # fmax_pool path otherwise.
        xs = self._fused_stem(stem_mod, x, mode, quant_w, quant_a, train_bn,
                              kw.get("out", "value"))
        if xs is not None:
            x = xs
        else:
            x = stem_mod(x, **kw)
            x = fmax_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        num_blocks = sum(self.stage_sizes)
        block_idx = 0
        last_q = None
        for stage, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                is_last = block_idx == num_blocks - 1
                bcfg = (self.last_block_config or cfg) if is_last else cfg
                ba_cfg = (self.last_block_config or block_act_cfg) if is_last \
                    else block_act_cfg
                strides = (2, 2) if (stage > 0 and b == 0) else (1, 1)
                width = widths[stage]
                out_feats = width * (4 if self.bottleneck else 1)

                in_feats = (x.norm if hasattr(x, "norm") else x).shape[-1]
                needs_downsample = (strides != (1, 1)
                                    or in_feats != out_feats)
                if needs_downsample:
                    residual = QuantConv(
                        features=out_feats, kernel_size=(1, 1), strides=strides,
                        padding=((0, 0), (0, 0)), bn=True, activation=None,
                        config=cfg, name=f"layer{stage + 1}_{b}_downsample")(x, **kw)
                else:
                    residual = x

                feat_cls = BottleneckFeatures if self.bottleneck else BasicBlockFeatures
                y = feat_cls(features=width, strides=strides, config=bcfg,
                             name=f"layer{stage + 1}_{b}")(x, **kw)

                # add -> relu -> block act quantizer (resnet_quantized.py:39-46)
                y = nn.relu(fadd(y, residual))
                q = QuantizedActivation(config=ba_cfg,
                                        name=f"layer{stage + 1}_{b}_act")
                x = q(y, mode=mode, quant_a=quant_a,
                      out=kw.get("out", "value"))
                last_q = q
                block_idx += 1

        # global avg pool, quantized by the tied last-block quantizer without
        # range update (resnet_quantized.py:84-89)
        x = fmean(x, axis=(1, 2))
        if self.tie_avgpool and last_q is not None:
            x = last_q(x, mode=mode, quant_a=quant_a, update_range=False,
                       out=kw.get("out", "value"))

        x = QuantLinear(features=self.num_classes, use_bias=True,
                        config=fc_cfg, name="fc")(
            x, **{**kw, "out": "value"})   # logits stay a plain array
        return materialize(x)


def resnet_configs(base: LayerQuantConfig, quant_setup: Optional[str]):
    """quant_setup presets -> per-layer config overrides.

    Reference: resnet_quantized.py:94-124.
    """
    setup = quant_setup or "all"
    cfgs = dict(config=base, stem_config=None, fc_config=None,
                last_block_config=None, block_act_config=None, tie_avgpool=True)
    if setup == "all":
        return cfgs
    if setup == "FP_logits":
        # no activation quantization of logits (:117-119)
        cfgs["fc_config"] = base.fp32_acts()
        return cfgs
    if setup == "fc4":
        # first layer weights 8 bits, fc weights 4 bits (:120-122)
        cfgs["stem_config"] = base.with_weight_bits(8)
        cfgs["fc_config"] = base.with_weight_bits(4)
        return cfgs
    if setup == "LSQ":
        # first+last layer 8 bits, fp32 logits (:94-105)
        cfgs["stem_config"] = base.with_weight_bits(8)
        cfgs["last_block_config"] = base.with_act_bits(8)
        cfgs["fc_config"] = base.with_weight_bits(8).fp32_acts()
        return cfgs
    if setup == "LSQ_paper":
        # input quantization everywhere except the first layer; block act
        # quantizers fp32; avgpool untied; fc 8w/8a (:106-116)
        qin = base.replace(quantize_input=True)
        cfgs["config"] = qin
        cfgs["stem_config"] = qin.with_weight_bits(8).fp32_acts()
        # only the *block-output* QuantizedActivations go fp32 (:113-116);
        # conv input quantizers inside the blocks stay quantized
        cfgs["block_act_config"] = qin.fp32_acts()
        cfgs["fc_config"] = qin.with_weight_bits(8).with_act_bits(8)
        cfgs["tie_avgpool"] = False
        return cfgs
    raise ValueError(f"Quantization setup '{setup}' not supported for Resnet")


def resnet18_quantized(base: LayerQuantConfig, quant_setup: Optional[str] = None,
                       num_classes: int = 1000,
                       stem_s2d: Union[bool, str] = False) -> QuantizedResNet:
    return QuantizedResNet(stage_sizes=(2, 2, 2, 2), bottleneck=False,
                           num_classes=num_classes, stem_s2d=stem_s2d,
                           **resnet_configs(base, quant_setup))


def resnet50_quantized(base: LayerQuantConfig, quant_setup: Optional[str] = None,
                       num_classes: int = 1000,
                       stem_s2d: Union[bool, str] = False) -> QuantizedResNet:
    return QuantizedResNet(stage_sizes=(3, 4, 6, 3), bottleneck=True,
                           num_classes=num_classes, stem_s2d=stem_s2d,
                           **resnet_configs(base, quant_setup))
