"""Quantized Vision Transformer (capability extension beyond the reference).

The reference ships ``QuantLayerNorm`` "for transformers"
(autoquant_utils.py:166-174) but its zoo is CNN-only.  This model exercises
the quantized-layer stack in its intended transformer setting: patch-embed
(QuantConv) -> [QuantLayerNorm -> quantized MHSA -> residual ->
QuantLayerNorm -> quantized MLP -> residual] x depth -> head (QuantLinear).

Quantization placement follows the CNN zoo's conventions: every
linear/conv quantizes weights + its output activations; residual adds are
followed by a standalone activation quantizer (the QuantizedBlock pattern,
resnet_quantized.py:39-46); softmax/attention arithmetic stays fp32 (the
paper quantizes matmul operands, not probabilities).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from fp8_quantization_tpu.nn import factored
from fp8_quantization_tpu.nn.config import LayerQuantConfig
from fp8_quantization_tpu.nn.factored import Factored, fadd
from fp8_quantization_tpu.nn.layers import (
    QuantConv, QuantLayerNorm, QuantLinear, QuantizedActivation)


class QuantSelfAttention(nn.Module):
    """Multi-head self-attention with quantized qkv/out projections."""

    dim: int
    num_heads: int
    config: LayerQuantConfig

    @nn.compact
    def __call__(self, x, **kw):
        # x may arrive Factored (ln1's fixed-mode fast path); the qkv layer
        # consumes it directly — only the shape is read here
        b, n, d = (x.norm if isinstance(x, Factored) else x).shape
        h = self.num_heads
        hd = d // h

        qkv = QuantLinear(features=3 * d, use_bias=True, config=self.config,
                          name="qkv")(x, **kw)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, hd), 3, axis=2)
        q, k, v = (t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
                   for t in (q, k, v))

        # Deployment fast path: Pallas flash attention (tiled online
        # softmax — the (B,H,S,S) logits never reach HBM; the naive chain
        # below is 100% of ViT-S/16's measured step traffic, RESULTS.md).
        # bf16 operands / f32 softmax stats; seq padded + masked to the
        # kernel's 128 blocks (ops/pallas/attention.py).  Gated per shape
        # by on-device measurement; fp32 and quantized forwards share it,
        # so the quantization A/B stays honest.
        fused = False
        if kw.get("mode") == "fixed" and self.config.engine == "pallas":
            from fp8_quantization_tpu.ops.pallas import autotune as at
            from fp8_quantization_tpu.ops.pallas.attention import flash_mha
            if at.attn_wins(b, h, n, hd):
                y = flash_mha(q, k, v, sm_scale=1.0 / float(hd) ** 0.5)
                fused = True
        if not fused:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
            attn = nn.softmax(attn, axis=-1)
            y = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, d)
        return QuantLinear(features=d, use_bias=True, config=self.config,
                           name="proj")(y, **kw)


class QuantEncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int
    config: LayerQuantConfig

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, train_bn: bool = False):
        kw = dict(mode=mode, quant_w=quant_w, quant_a=quant_a)
        # Fixed-mode fast interchange (nn/factored.py, matching
        # models/resnet.py): quant outputs whose consumer is a matmul — the
        # LN outputs feeding qkv/mlp1 and the MLP hidden activation feeding
        # mlp2 — emit Factored(norm bf16, factor) so the consumer feeds the
        # exact normalized grid to the MXU via the cast/pallas fast paths.
        # Outputs consumed by fp32 arithmetic (attention math, residual
        # adds) stay plain arrays.
        fkw = dict(kw)
        fast = mode == "fixed" and self.config.engine in ("bf16", "pallas")
        if fast:
            fkw["out"] = "factored"
        # Residual-add act quantizers also emit Factored on the fast path:
        # their consumers are the LNs (scale-invariant — they materialize
        # the factor into their own read pass) and the next residual add
        # (fadd materializes in-fusion), so the f32 block-state tensor is
        # never stored — bf16 norms halve the res-chain HBM traffic
        # (trace attribution: the standalone res-act quant passes were
        # ~2 ms of the batch-128 step's 3.2 ms quantization tax).
        y = QuantLayerNorm(config=self.config, name="ln1")(x, **fkw)
        y = QuantSelfAttention(dim=self.dim, num_heads=self.num_heads,
                               config=self.config, name="attn")(y, **kw)
        x = fadd(x, y)
        x = QuantizedActivation(config=self.config, name="res1_act")(
            x, mode=mode, quant_a=quant_a,
            out="factored" if fast else "value")

        y = QuantLayerNorm(config=self.config, name="ln2")(x, **fkw)
        y = QuantLinear(features=self.dim * self.mlp_ratio, use_bias=True,
                        activation="gelu", config=self.config,
                        name="mlp1")(y, **fkw)
        y = QuantLinear(features=self.dim, use_bias=True, config=self.config,
                        name="mlp2")(y, **kw)
        x = fadd(x, y)
        return QuantizedActivation(config=self.config, name="res2_act")(
            x, mode=mode, quant_a=quant_a,
            out="factored" if fast else "value")


class QuantizedViT(nn.Module):
    """ViT classifier with quantized projections/norms throughout."""

    num_classes: int = 1000
    patch_size: int = 16
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    config: LayerQuantConfig = LayerQuantConfig()
    head_config: Optional[LayerQuantConfig] = None

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, train_bn: bool = False):
        kw = dict(mode=mode, quant_w=quant_w, quant_a=quant_a,
                  train_bn=train_bn)
        p = self.patch_size
        x = QuantConv(features=self.dim, kernel_size=(p, p), strides=(p, p),
                      padding=((0, 0), (0, 0)), use_bias=True,
                      config=self.config, name="patch_embed")(x, **kw)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, d), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), x], axis=1)
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02),
                         (1, gh * gw + 1, d), jnp.float32)
        x = x + pos

        bkw = dict(mode=mode, quant_w=quant_w, quant_a=quant_a,
                   train_bn=train_bn)
        for i in range(self.depth):
            x = QuantEncoderBlock(dim=d, num_heads=self.num_heads,
                                  mlp_ratio=self.mlp_ratio,
                                  config=self.config, name=f"block{i}")(x, **bkw)

        fkw = dict(mode=mode, quant_w=quant_w, quant_a=quant_a)
        if mode == "fixed" and self.config.engine in ("bf16", "pallas"):
            fkw["out"] = "factored"
        x = QuantLayerNorm(config=self.config, name="ln_final")(x, **fkw)
        # cls-token slice commutes with the per-tensor factor
        norm, fac = factored.split(x)
        x = norm[:, 0] if fac is None else Factored(norm[:, 0], fac)
        return QuantLinear(features=self.num_classes, use_bias=True,
                           config=self.head_config or self.config,
                           name="head")(x, mode=mode, quant_w=quant_w,
                                        quant_a=quant_a)


def vit_small_quantized(base: LayerQuantConfig, quant_setup: Optional[str] = None,
                        num_classes: int = 1000, **kw) -> QuantizedViT:
    """ViT-S/16.  ``quant_setup='FP_logits'`` keeps head logits fp32."""
    head = base.fp32_acts() if quant_setup == "FP_logits" else None
    return QuantizedViT(num_classes=num_classes, patch_size=16, dim=384,
                        depth=12, num_heads=6, config=base,
                        head_config=head, **kw)
