"""Torch checkpoint -> Flax variables conversion.

The reference loads torchvision resnet18/50 weights and the tonylins
MobileNetV2 tar (resnet_quantized.py:136-167, mobilenet_v2_quantized.py:95-113).
This module maps those state_dicts onto our NHWC/HWIO pytrees:

  conv weight  OIHW -> HWIO   (transpose 2,3,1,0)
  linear weight (out,in) -> (in,out)
  bn weight/bias -> gamma/beta (params); running_mean/var -> batch_stats

Depthwise convs: torch stores (C,1,kh,kw) with groups=C; flax HWIO with
feature_group_count=C wants (kh,kw,1,C) — the same transpose handles it.
The per-channel axis moves from dim 0 to dim -1, which is exactly the central
convention switch documented in ops/quantizer.py.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

Arrays = Dict[str, np.ndarray]


def load_torch_state_dict(path: str) -> Arrays:
    """Load a .pth/.tar checkpoint into numpy arrays (torch CPU only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k.replace("module.", ""): v.numpy() for k, v in sd.items()
            if hasattr(v, "numpy")}


def _conv(sd: Arrays, key: str) -> np.ndarray:
    return np.transpose(sd[key], (2, 3, 1, 0))


def _bn(sd: Arrays, prefix: str):
    params = {"gamma": sd[f"{prefix}.weight"], "beta": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _bnconv(sd: Arrays, conv_key: str, bn_prefix: str):
    bn_p, bn_s = _bn(sd, bn_prefix)
    return {"kernel": _conv(sd, conv_key), **bn_p}, bn_s


def convert_resnet(sd: Arrays, stage_sizes: Sequence[int],
                   bottleneck: bool) -> Tuple[dict, dict]:
    """torchvision resnet18/50 state_dict -> (params, batch_stats) pytrees
    matching models/resnet.py module names."""
    params, stats = {}, {}
    params["stem"], stats["stem"] = _bnconv(sd, "conv1.weight", "bn1")

    n_convs = 3 if bottleneck else 2
    for stage, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            name = f"layer{stage + 1}_{b}"
            blk_p, blk_s = {}, {}
            for ci in range(1, n_convs + 1):
                blk_p[f"conv{ci}"], blk_s[f"conv{ci}"] = _bnconv(
                    sd, f"{t}.conv{ci}.weight", f"{t}.bn{ci}")
            params[name], stats[name] = blk_p, blk_s
            if f"{t}.downsample.0.weight" in sd:
                params[f"{name}_downsample"], stats[f"{name}_downsample"] = \
                    _bnconv(sd, f"{t}.downsample.0.weight", f"{t}.downsample.1")

    params["fc"] = {"kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]}
    return params, stats


def convert_mobilenet_v2(sd: Arrays) -> Tuple[dict, dict]:
    """tonylins MobileNetV2 state_dict -> (params, batch_stats) pytrees
    matching models/mobilenet_v2.py module names.

    Layout (mobilenet_v2.py:36-59): features.0 = conv_bn stem;
    features.1..17 = InvertedResidual (conv Sequential indices depend on
    expand_ratio); features.18 = conv_1x1_bn head; classifier.1 = Linear.
    """
    from fp8_quantization_tpu.models.mobilenet_v2 import INVERTED_RESIDUAL_SETTING

    params, stats = {}, {}
    params["stem"], stats["stem"] = _bnconv(sd, "features.0.0.weight",
                                            "features.0.1")
    feat_idx = 1
    for i, (t, _c, n, _s) in enumerate(INVERTED_RESIDUAL_SETTING):
        for b in range(n):
            prefix = f"features.{feat_idx}.conv"
            name = f"block{i}_{b}"
            blk_p, blk_s = {}, {}
            if t == 1:
                layout = {"dw": 0, "project": 3}
            else:
                layout = {"expand": 0, "dw": 3, "project": 6}
            for mod, j in layout.items():
                blk_p[mod], blk_s[mod] = _bnconv(
                    sd, f"{prefix}.{j}.weight", f"{prefix}.{j + 1}")
            params[name], stats[name] = blk_p, blk_s
            feat_idx += 1

    params["head"], stats["head"] = _bnconv(sd, f"features.{feat_idx}.0.weight",
                                            f"features.{feat_idx}.1")
    params["classifier"] = {"kernel": sd["classifier.1.weight"].T,
                            "bias": sd["classifier.1.bias"]}
    return params, stats


def convert_vit(sd: Arrays, depth: int = 12) -> Tuple[dict, dict]:
    """timm ``vit_small_patch16_224``-style state_dict -> (params, {}) pytrees
    matching models/vit.py module names.

    timm layout: ``cls_token``, ``pos_embed``, ``patch_embed.proj.{weight,
    bias}`` (OIHW conv), ``blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2}``, final ``norm``, ``head``.  LayerNorm weight/bias map
    to our QuantLayerNorm scale/bias; Linear weights transpose (out,in) ->
    (in,out).  ViTs carry no BatchNorm, so batch_stats is empty.

    The reference zoo is CNN-only (SURVEY §2) — this loader exists so the
    ViT extension has a real checkpoint path instead of falling into
    convert_resnet (VERDICT.md round-1 missing item 5).
    """
    def _linear(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def _ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "patch_embed": {"kernel": _conv(sd, "patch_embed.proj.weight"),
                        "bias": sd["patch_embed.proj.bias"]},
        "ln_final": _ln("norm"),
        "head": _linear("head"),
    }
    for i in range(depth):
        t = f"blocks.{i}"
        params[f"block{i}"] = {
            "ln1": _ln(f"{t}.norm1"),
            "attn": {"qkv": _linear(f"{t}.attn.qkv"),
                     "proj": _linear(f"{t}.attn.proj")},
            "ln2": _ln(f"{t}.norm2"),
            "mlp1": _linear(f"{t}.mlp.fc1"),
            "mlp2": _linear(f"{t}.mlp.fc2"),
        }
    return params, {}


def merge_variables(init_variables: dict, params: dict, batch_stats: dict) -> dict:
    """Replace params/batch_stats in an init() variables dict, with shape
    checks (loading replaces the reference's lazy-shape dummy-forward dance,
    base_quantized_model.py:34-62 — our shapes are static so a plain
    structural check suffices)."""
    def _check(path, new, old):
        if tuple(np.shape(new)) != tuple(np.shape(old)):
            raise ValueError(f"shape mismatch at {path}: "
                             f"{np.shape(new)} vs expected {np.shape(old)}")
        return np.asarray(new, dtype=np.float32)

    out = dict(init_variables)

    def _merge(tree, new, path=""):
        missing = set(tree) - set(new)
        if missing:
            raise ValueError(f"missing keys at {path}: {sorted(missing)}")
        return {k: (_merge(tree[k], new[k], f"{path}/{k}")
                    if isinstance(tree[k], dict)
                    else _check(f"{path}/{k}", new[k], tree[k]))
                for k in tree}

    out["params"] = _merge(out["params"], params)
    if "batch_stats" in out:
        out["batch_stats"] = _merge(out["batch_stats"], batch_stats)
    return out
