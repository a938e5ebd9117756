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
from fp8_quantization_tpu.nn.factored import Factored, PrequantS8, fadd
from fp8_quantization_tpu.nn.layers import (
    QuantConv, QuantLayerNorm, QuantLinear, QuantizedActivation,
    int8_interchange_ok)


def _i8_fast(cfg: LayerQuantConfig, mode: str, quant_a: bool,
             quant_w: bool = True, baked: bool = False,
             train_bn: bool = False) -> bool:
    """Producer-side s8 interchange (nn/factored.PrequantS8) active?

    Fixed-mode deployment of the XLA s8 datapath only: each int8 matmul's
    quant prologue runs inside its producer's epilogue fusion and layers
    exchange 1-byte s8 operands — measured 14.1 ms of quant-prologue
    passes + 6.8 ms of s8 layout reshapes in the consumer-side batch-128
    ViT-S/16 step (RESULTS.md round 4) that this protocol deletes.
    Calibration/training modes keep the consumer-side graph (estimators
    must see each layer's real-valued input).

    Mirrors the call-time gates of QuantizedLayerBase._int8_xla_ok: the s8
    route is only taken with quantized weights — live (``quant_w`` and the
    config toggle) or pre-baked onto the integer grid (``baked``) — and
    never under train_bn.  Computed ONCE at the model root (QuantizedViT)
    and threaded down, so the stream layout and the per-layer routing can
    never disagree (a quant_w=False ablation call previously still padded
    and emitted s8 that every consumer had to materialize away).
    """
    return (mode == "fixed" and not train_bn and quant_a
            and (baked or (quant_w and cfg.quant_w))
            and int8_interchange_ok(cfg))


class QuantSelfAttention(nn.Module):
    """Multi-head self-attention with quantized qkv/out projections."""

    dim: int
    num_heads: int
    config: LayerQuantConfig

    @nn.compact
    def __call__(self, x, probe=None, seq_len: int = 0, n_real: int = 0,
                 i8: bool = False, **kw):
        d = self.dim
        qkv_layer = QuantLinear(features=3 * d, use_bias=True,
                                config=self.config, name="qkv")
        if probe == "qkv_in_state":
            # PrequantS8 probe relay: the encoder block fetches qkv's
            # input-quant scalars so ln1 can emit the s8 operand directly
            return qkv_layer(None, out="in_state")
        # Two stream layouts (see QuantizedViT.__call__):
        #   seq_len == 0 — 3-D (B, S, D), the bf16/fp8 deployment layout;
        #   seq_len  > 0 — 2-D (B*S_pad, D) tile-aligned token rows, the
        #     int8 layout; x may then be PrequantS8.  n_real < seq_len
        #     means rows beyond n_real are pads: their KEYS are masked out
        #     of the softmax so real-row outputs are bit-identical to the
        #     unpadded computation (pad QUERY rows stay row-isolated — no
        #     other op in the encoder mixes rows).
        # x may arrive Factored (ln1's fixed-mode fast path) or PrequantS8;
        # the qkv layer consumes either — only the shape is read here.
        shape = (x.norm if isinstance(x, Factored)
                 else x.xs8 if isinstance(x, PrequantS8) else x).shape
        n = seq_len if seq_len else shape[1]
        b = shape[0] // n if seq_len else shape[0]
        h = self.num_heads
        hd = d // h

        qkv = qkv_layer(x, **kw)
        # Explicit (B, H, S, hd) head transposes, kept deliberately: an
        # attempt to fold them into the einsums ("bqhd,bkhd->bhqk") made
        # the bf16 attention dots ~7 ms/step SLOWER at ViT-S shapes — the
        # strided-head operands defeat XLA's dot tiling; the materialized
        # copies are cheaper (measured round 4, RESULTS.md).
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
        masked = 0 < n_real < n
        fused = False
        if (kw.get("mode") == "fixed" and self.config.engine == "pallas"
                and not masked):
            from fp8_quantization_tpu.ops.pallas import autotune as at
            from fp8_quantization_tpu.ops.pallas.attention import flash_mha
            if at.attn_wins(b, h, n, hd):
                y = flash_mha(q, k, v, sm_scale=1.0 / float(hd) ** 0.5)
                fused = True
        if not fused:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
            if masked:
                # additive key mask: pad keys contribute softmax weight 0,
                # so real-row outputs equal the unpadded computation
                attn = attn + jnp.where(
                    jnp.arange(n) < n_real, 0.0, -1e9).astype(attn.dtype)
            attn = nn.softmax(attn, axis=-1)
            y = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        y = y.transpose(0, 2, 1, 3)
        y = y.reshape(b * n, d) if seq_len else y.reshape(b, n, d)
        proj = QuantLinear(features=d, use_bias=True, config=self.config,
                           name="proj")
        if i8:
            # proj's prologue fuses into the attention-output transpose
            # materialization (which happens either way): write s8 once
            # instead of bf16 + a standalone consumer-side quant pass
            from fp8_quantization_tpu.ops.int8 import prequant_s8
            pd, pz = proj(None, out="in_state")
            bits = float(self.config.act_quant.n_bits)
            y = PrequantS8(prequant_s8(y, pd, pz, bits), pd, pz, bits)
        return proj(y, **kw)


class QuantEncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int
    config: LayerQuantConfig

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, train_bn: bool = False,
                 seq_len: int = 0, n_real: int = 0, i8: bool = False):
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
        attn = QuantSelfAttention(dim=self.dim, num_heads=self.num_heads,
                                  config=self.config, name="attn")
        mlp1 = QuantLinear(features=self.dim * self.mlp_ratio, use_bias=True,
                           activation="gelu", config=self.config, name="mlp1")
        mlp2 = QuantLinear(features=self.dim, use_bias=True,
                           config=self.config, name="mlp2")
        ln1kw, ln2kw, mlp1kw = dict(fkw), dict(fkw), dict(fkw)
        if i8:
            # int8 producer-side interchange: probe each consumer matmul's
            # frozen input-quant scalars, then have its producer (the LN /
            # the gelu epilogue) emit the recentered s8 operand directly.
            # Covers every int8 matmul edge in the block: ln1->qkv,
            # attn-out->proj (inside QuantSelfAttention), ln2->mlp1,
            # mlp1->mlp2.  Residual-state edges (fadd, res-act -> LN) stay
            # on the Factored protocol: LNs need real values.
            bits = float(self.config.act_quant.n_bits)
            qd, qz = attn(None, probe="qkv_in_state")
            m1d, m1z = mlp1(None, out="in_state")
            m2d, m2z = mlp2(None, out="in_state")
            ln1kw = dict(kw, emit_s8=(qd, qz, bits))
            ln2kw = dict(kw, emit_s8=(m1d, m1z, bits))
            mlp1kw = dict(kw, emit_s8=(m2d, m2z, bits))
        y = QuantLayerNorm(config=self.config, name="ln1")(x, **ln1kw)
        y = attn(y, seq_len=seq_len, n_real=n_real, i8=i8, **kw)
        x = fadd(x, y)
        x = QuantizedActivation(config=self.config, name="res1_act")(
            x, mode=mode, quant_a=quant_a,
            out="factored" if fast else "value")

        y = QuantLayerNorm(config=self.config, name="ln2")(x, **ln2kw)
        y = mlp1(y, **mlp1kw)
        y = mlp2(y, **kw)
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

        # Stream layout fork (measured round 4, RESULTS.md):
        #   * bf16/fp8 engines keep the 3-D (B, S, D) stream — XLA handles
        #     the per-matmul 2-D collapse transparently for bf16 operands
        #     (reshape family ~0 ms); flattening the model itself to 2-D
        #     COST fp32 ~5 ms/step of re-tiling reshapes (197 rows is not
        #     a tile multiple).
        #   * the int8 fast path runs a 2-D (B*S_pad, D) stream with S
        #     padded up to the bf16 tile height (16): the 2-D s8 rows are
        #     tile-aligned for any batch (B*S divides 32 at B=128), but
        #     the bf16 attention-boundary reshapes
        #     ((B*S,3D)<->(B,S,3,H,hd)) re-tile when S is off-tile and
        #     XLA materializes them as standalone reshapes (3.7 ms/step
        #     at S=197).  16 not 32: padding S to the s8 tile (224) costs
        #     O(S^2) attention compute (+29%, measured 34.3 ms — worse
        #     than not padding); 208 costs +11% attention for free
        #     boundary reshapes.  Pad KEY rows are masked out of the
        #     softmax (exact); pad QUERY rows are row-isolated garbage,
        #     dropped at the cls slice.  Calibration modes never pad
        #     (_i8_fast is fixed-mode-only), so estimators see only real
        #     rows.
        n = gh * gw + 1
        # baked integer weights (nn/bake.bake_int8_weights) satisfy the
        # quantized-weights gate even when the step runs quant_w=False —
        # the root probes the collection once (patch_embed is always baked
        # when any layer is)
        baked = self.has_variable("baked_int8", "patch_embed")
        i8 = _i8_fast(self.config, mode, quant_a, quant_w, baked, train_bn)
        # engine='pallas' keeps the unpadded stream: sequence padding would
        # mask the softmax keys, which disqualifies the flash_mha kernel
        # (ADVICE r4) — off-tile boundary reshapes are the lesser cost
        n_pad = (-n) % 16 if i8 and self.config.engine != "pallas" else 0
        seq = n + n_pad
        bkw = dict(mode=mode, quant_w=quant_w, quant_a=quant_a,
                   train_bn=train_bn, i8=i8)
        if i8:
            if n_pad:
                x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
            x = x.reshape(b * seq, d)
            bkw.update(seq_len=seq, n_real=n if n_pad else 0)
        for i in range(self.depth):
            x = QuantEncoderBlock(dim=d, num_heads=self.num_heads,
                                  mlp_ratio=self.mlp_ratio,
                                  config=self.config, name=f"block{i}")(x, **bkw)

        fkw = dict(mode=mode, quant_w=quant_w, quant_a=quant_a)
        if mode == "fixed" and self.config.engine in ("bf16", "pallas"):
            fkw["out"] = "factored"
        x = QuantLayerNorm(config=self.config, name="ln_final")(x, **fkw)
        # cls-token rows (the slice commutes with the per-tensor factor)
        norm, fac = factored.split(x)
        norm = (norm.reshape(b, seq, -1) if i8 else norm)[:, 0]
        x = norm if fac is None else Factored(norm, fac)
        head_cfg = self.head_config or self.config
        head = QuantLinear(features=self.num_classes, use_bias=True,
                           config=head_cfg, name="head")
        if _i8_fast(head_cfg, mode, quant_a, quant_w, baked, train_bn):
            # tiny (B, D) tensor — prequant the cls slice so the head joins
            # the s8 interchange (slice commutes with the elementwise grid)
            from fp8_quantization_tpu.ops.int8 import prequant_s8
            hd_, hz_ = head(None, out="in_state")
            bits = float(head_cfg.act_quant.n_bits)
            x = PrequantS8(prequant_s8(factored.materialize(x), hd_, hz_,
                                       bits), hd_, hz_, bits)
        return head(x, mode=mode, quant_w=quant_w, quant_a=quant_a)


def vit_small_quantized(base: LayerQuantConfig, quant_setup: Optional[str] = None,
                        num_classes: int = 1000, **kw) -> QuantizedViT:
    """ViT-S/16.  ``quant_setup='FP_logits'`` keeps head logits fp32."""
    head = base.fp32_acts() if quant_setup == "FP_logits" else None
    return QuantizedViT(num_classes=num_classes, patch_size=16, dim=384,
                        depth=12, num_heads=6, config=base,
                        head_config=head, **kw)
