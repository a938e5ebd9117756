#!/usr/bin/env python
"""Full-scale dress rehearsal of the real-data PTQ path (VERDICT r1 item 5).

One command, no code edits:

    python tools/dress_rehearsal.py [--workdir /tmp/rehearsal] [--images 2000]
        [--archs resnet18,mobilenet_v2,vit_small] [--platform tpu]

It (a) writes RANDOM torch checkpoints in the exact on-disk layouts the real
weights ship in — torchvision resnet18, tonylins mobilenet_v2 (the layout the
reference's MobileNetV2 loads, reference mobilenet_v2_quantized.py:95-113),
timm ViT-S/16 — (b) writes a 1000-class ImageFolder val tree of synthetic
JPEGs, and (c) drives `cli/image_net.py validate-quantized` end to end for
each architecture with the BASELINE.md #2-#4 flag sets:

    conversion (--model-dir) -> calibration -> fixed-range evaluation

The printed top-1 is chance level (weights are random); the point is that the
ENTIRE volume path — torch .pth parsing, layout conversion, ImageFolder decode
at 1000 classes, calibration, batched eval on the attached device — runs
turnkey.  The moment real ImageNet + real checkpoints exist, pointing
--images-dir/--model-dir at them produces the BASELINE numbers with the same
command lines (printed at the end).
"""

import argparse
import io
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _bn_keys(torch, sd, prefix, c):
    sd[f"{prefix}.weight"] = torch.rand(c) + 0.5
    sd[f"{prefix}.bias"] = torch.randn(c) * 0.1
    sd[f"{prefix}.running_mean"] = torch.randn(c) * 0.1
    sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(1000)


def _resnet18_state_dict(torch):
    """torchvision resnet18 key layout (resnet.py in torchvision; the layout
    the reference's quantize path loads, reference resnet_quantized.py:136-152).
    torchvision is not installed in this env, so the layout is generated
    explicitly — models/convert.convert_resnet documents the same key map."""
    sd = {}
    sd["conv1.weight"] = torch.randn(64, 3, 7, 7) * 0.05
    _bn_keys(torch, sd, "bn1", 64)
    chans = [64, 64, 128, 256, 512]
    for stage in range(1, 5):
        cin, cout = chans[stage - 1], chans[stage]
        for b in range(2):
            t = f"layer{stage}.{b}"
            c1_in = cin if b == 0 else cout
            sd[f"{t}.conv1.weight"] = torch.randn(cout, c1_in, 3, 3) * 0.05
            _bn_keys(torch, sd, f"{t}.bn1", cout)
            sd[f"{t}.conv2.weight"] = torch.randn(cout, cout, 3, 3) * 0.05
            _bn_keys(torch, sd, f"{t}.bn2", cout)
            if b == 0 and stage > 1:
                sd[f"{t}.downsample.0.weight"] = torch.randn(cout, cin, 1, 1) * 0.05
                _bn_keys(torch, sd, f"{t}.downsample.1", cout)
    sd["fc.weight"] = torch.randn(1000, 512) * 0.02
    sd["fc.bias"] = torch.zeros(1000)
    return sd


def _mobilenet_v2_state_dict(torch):
    """tonylins MobileNetV2 key layout (the tar the reference loads,
    reference mobilenet_v2_quantized.py:95-113 / mobilenet_v2.py:36-59)."""
    from fp8_quantization_tpu.models.mobilenet_v2 import (
        INVERTED_RESIDUAL_SETTING)

    sd = {}
    sd["features.0.0.weight"] = torch.randn(32, 3, 3, 3) * 0.05
    _bn_keys(torch, sd, "features.0.1", 32)
    cin, feat = 32, 1
    for t, c, n, _s in INVERTED_RESIDUAL_SETTING:
        for b in range(n):
            pre = f"features.{feat}.conv"
            hidden = cin * t
            if t == 1:
                sd[f"{pre}.0.weight"] = torch.randn(hidden, 1, 3, 3) * 0.05
                _bn_keys(torch, sd, f"{pre}.1", hidden)
                sd[f"{pre}.3.weight"] = torch.randn(c, hidden, 1, 1) * 0.05
                _bn_keys(torch, sd, f"{pre}.4", c)
            else:
                sd[f"{pre}.0.weight"] = torch.randn(hidden, cin, 1, 1) * 0.05
                _bn_keys(torch, sd, f"{pre}.1", hidden)
                sd[f"{pre}.3.weight"] = torch.randn(hidden, 1, 3, 3) * 0.05
                _bn_keys(torch, sd, f"{pre}.4", hidden)
                sd[f"{pre}.6.weight"] = torch.randn(c, hidden, 1, 1) * 0.05
                _bn_keys(torch, sd, f"{pre}.7", c)
            cin = c
            feat += 1
    sd[f"features.{feat}.0.weight"] = torch.randn(1280, cin, 1, 1) * 0.05
    _bn_keys(torch, sd, f"features.{feat}.1", 1280)
    sd["classifier.1.weight"] = torch.randn(1000, 1280) * 0.02
    sd["classifier.1.bias"] = torch.zeros(1000)
    return sd


def make_checkpoints(workdir: Path, archs):
    """Random state_dicts in the reference layouts (torch CPU)."""
    import torch

    paths = {}
    torch.manual_seed(0)

    if "resnet18" in archs:
        p = workdir / "resnet18_random.pth"
        torch.save(_resnet18_state_dict(torch), p)
        paths["resnet18_quantized"] = p

    if "mobilenet_v2" in archs:
        p = workdir / "mobilenet_v2_random.pth"
        torch.save(_mobilenet_v2_state_dict(torch), p)
        paths["mobilenet_v2_quantized"] = p

    if "vit_small" in archs:
        # timm ViT-S/16 state-dict layout (models/convert.convert_vit)
        d, depth, heads = 384, 12, 6
        sd = {"cls_token": torch.randn(1, 1, d) * 0.02,
              "pos_embed": torch.randn(1, 197, d) * 0.02,
              "patch_embed.proj.weight": torch.randn(d, 3, 16, 16) * 0.02,
              "patch_embed.proj.bias": torch.zeros(d),
              "norm.weight": torch.ones(d), "norm.bias": torch.zeros(d),
              "head.weight": torch.randn(1000, d) * 0.02,
              "head.bias": torch.zeros(1000)}
        for i in range(depth):
            pre = f"blocks.{i}."
            sd.update({
                pre + "norm1.weight": torch.ones(d),
                pre + "norm1.bias": torch.zeros(d),
                pre + "attn.qkv.weight": torch.randn(3 * d, d) * 0.02,
                pre + "attn.qkv.bias": torch.zeros(3 * d),
                pre + "attn.proj.weight": torch.randn(d, d) * 0.02,
                pre + "attn.proj.bias": torch.zeros(d),
                pre + "norm2.weight": torch.ones(d),
                pre + "norm2.bias": torch.zeros(d),
                pre + "mlp.fc1.weight": torch.randn(4 * d, d) * 0.02,
                pre + "mlp.fc1.bias": torch.zeros(4 * d),
                pre + "mlp.fc2.weight": torch.randn(d, 4 * d) * 0.02,
                pre + "mlp.fc2.bias": torch.zeros(d),
            })
        p = workdir / "vit_small_random.pth"
        torch.save(sd, p)
        paths["vit_small_quantized"] = p
    return paths


def make_imagefolder(root: Path, num_images: int, num_classes: int = 1000,
                     size: int = 256):
    """1000-class ImageFolder val tree of synthetic JPEGs."""
    import numpy as np
    from PIL import Image

    val = root / "val"
    if val.exists() and sum(1 for _ in val.rglob("*.jpg")) >= num_images:
        return root
    rng = np.random.RandomState(0)
    t0 = time.time()
    for i in range(num_images):
        cls = i % num_classes
        d = val / f"n{cls:08d}"
        d.mkdir(parents=True, exist_ok=True)
        # structured noise so calibration sees non-degenerate statistics
        base = rng.normal(128, 8, (8, 8, 3))
        img = np.clip(np.kron(base, np.ones((size // 8, size // 8, 1)))
                      + rng.normal(0, 40, (size, size, 3)), 0, 255)
        Image.fromarray(img.astype("uint8")).save(
            d / f"img_{i:06d}.jpg", quality=85)
    print(f"wrote {num_images} JPEGs across {num_classes} classes "
          f"in {time.time() - t0:.1f}s", flush=True)
    return root


BASELINE_FLAGS = {
    # BASELINE.md configs #2-#4: FP8 PTQ (per-channel weights, set-maxval),
    # the paper's W8A8 evaluation recipe
    "resnet18_quantized": [
        "--qmethod", "fp_quantizer", "--per-channel", "--fp8-set-maxval",
        "--weight-quant-method", "current_minmax",
        "--act-quant-method", "allminmax", "--fp8-mantissa-bits", "4"],
    "mobilenet_v2_quantized": [
        "--qmethod", "fp_quantizer", "--per-channel", "--fp8-set-maxval",
        "--weight-quant-method", "current_minmax",
        "--act-quant-method", "allminmax", "--fp8-mantissa-bits", "4"],
    "vit_small_quantized": [
        "--qmethod", "fp_quantizer", "--per-channel", "--fp8-set-maxval",
        "--weight-quant-method", "current_minmax",
        "--act-quant-method", "allminmax", "--fp8-mantissa-bits", "4"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/fp8tpu_rehearsal")
    ap.add_argument("--images", type=int, default=2000,
                    help="synthetic val JPEGs (50000 = full ImageNet val)")
    ap.add_argument("--archs", default="resnet18,mobilenet_v2,vit_small")
    ap.add_argument("--platform", default=None,
                    help="forwarded to the CLI (cpu/tpu; default = attached)")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--max-eval-batches", type=int, default=None)
    ap.add_argument("--engine", default="bf16")
    ap.add_argument("--images-dir", default=None,
                    help="REAL ImageNet root (train/ + val/): skip the "
                         "synthetic JPEG tree and evaluate on it — the "
                         "rehearsal becomes the real BASELINE run")
    ap.add_argument("--model-dirs", default=None,
                    help="comma-separated arch=path.pth REAL checkpoints: "
                         "skip the synthetic checkpoints for those archs")
    args = ap.parse_args()

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    archs = args.archs.split(",")

    real_ckpts = (dict(kv.split("=", 1) for kv in args.model_dirs.split(","))
                  if args.model_dirs else {})
    synth_archs = [a for a in archs if a not in real_ckpts]
    ckpts = make_checkpoints(workdir, synth_archs) if synth_archs else {}
    ckpts.update({a: Path(p) for a, p in real_ckpts.items()})
    data_root = (Path(args.images_dir) if args.images_dir
                 else make_imagefolder(workdir / "imagenet", args.images))

    results, cmds = {}, {}
    for arch, ckpt in ckpts.items():
        cmd = [sys.executable, str(REPO / "cli" / "image_net.py"),
               "validate-quantized",
               "--architecture", arch,
               "--model-dir", str(ckpt),
               "--images-dir", str(data_root),
               "--batch-size", str(args.batch_size),
               "--engine", args.engine,
               *BASELINE_FLAGS[arch]]
        if args.platform:
            cmd += ["--platform", args.platform]
        if args.max_eval_batches:
            cmd += ["--max-eval-batches", str(args.max_eval_batches)]
        cmds[arch] = " ".join(cmd[1:])
        print(f"\n=== {arch} ===\n{' '.join(cmd)}", flush=True)
        t0 = time.time()
        out = subprocess.run(cmd, capture_output=True, text=True)
        wall = time.time() - t0
        last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if out.returncode != 0 or not last:
            print(out.stdout[-3000:])
            print(out.stderr[-3000:])
            raise SystemExit(f"{arch} FAILED (rc={out.returncode})")
        results[arch] = {**json.loads(last[-1]), "wall_s": round(wall, 1)}
        print(json.dumps(results[arch]), flush=True)

    print("\n=== rehearsal summary (random weights -> chance-level top-1; "
          "the PATH is what passed) ===")
    print(json.dumps(results, indent=2))
    print("\nTo produce the BASELINE.md numbers with real assets, re-run with "
          "--model-dir <real .pth> and --images-dir <real ImageNet root>:")
    for arch, c in cmds.items():
        print(f"  {c}")


if __name__ == "__main__":
    main()
