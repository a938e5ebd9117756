#!/usr/bin/env python
"""ImageNet PTQ / QAT entry points — counterpart of the reference's
``image_net.py`` (reference: image_net.py:28-100).  Flag names match the
reference CLI (utils/click_options.py) for repro parity; the ``--cuda`` flag
becomes ``--platform`` (tpu/cpu), and new TPU-only flags add the mesh shape.

Commands:
  validate-quantized   calibrate -> fix ranges -> (optional BN re-est) -> eval
  train-quantized      QAT fine-tune through the STE (the path the reference
                       ships infrastructure for but never wires, SURVEY.md §3.4)
"""

import json
import logging
import os
import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=os.environ.get("LOGLEVEL", "INFO"))
log = logging.getLogger("image_net")


def _quant_options(f):
    opts = [
        click.option("--images-dir", type=str, default=None,
                     help="ImageNet root with train/ and val/ (synthetic data "
                          "when omitted)"),
        click.option("--architecture", type=click.Choice(
            ["mobilenet_v2_quantized", "resnet18_quantized",
             "resnet50_quantized", "vit_small_quantized"]),
            default="resnet18_quantized"),
        click.option("--model-dir", type=str, default=None,
                     help="torch checkpoint (.pth/.tar) to convert and load"),
        click.option("--batch-size", type=int, default=64),
        click.option("--num-workers", type=int, default=8),
        click.option("--interpolation", type=click.Choice(
            ["nearest", "bilinear", "bicubic", "lanczos", "box", "hamming"]),
            default="bilinear"),
        click.option("--seed", type=int, default=10),
        click.option("--deterministic/--nondeterministic", default=False,
                     help="seed python/numpy RNGs from --seed and audit-log "
                          "it (reference click_options.py:47; XLA-on-TPU "
                          "execution is deterministic by construction, so "
                          "unlike cudnn there is no perf trade-off)"),
        click.option("--platform", type=str, default=None,
                     help="force jax platform (cpu/tpu)"),
        click.option("--data-parallel", type=int, default=1,
                     help="mesh 'data' axis size (chips)"),
        click.option("--model-parallel", type=int, default=1,
                     help="mesh 'model' axis size (tensor parallel)"),
        # quantization_options (click_options.py:320-440)
        click.option("--qmethod", type=click.Choice(
            ["symmetric_uniform", "asymmetric_uniform", "fp_quantizer"]),
            default="fp_quantizer"),
        click.option("--qmethod-act", type=str, default=None),
        click.option("--n-bits", type=int, default=8),
        click.option("--n-bits-act", type=int, default=None),
        click.option("--per-channel/--no-per-channel", default=False),
        click.option("--percentile", type=float, default=None),
        click.option("--weight-quant-method", type=click.Choice(
            ["current_minmax", "allminmax", "running_minmax", "MSE",
             "line_search"]),   # per-channel 1-D grid line search
            default="current_minmax"),
        click.option("--act-quant-method", type=click.Choice(
            ["current_minmax", "allminmax", "running_minmax", "MSE",
             "line_search"]),
            default="allminmax"),
        click.option("--act-momentum", type=float, default=None),
        click.option("--num-candidates", type=int, default=None,
                     help="MSE search-grid size (reference "
                          "click_options.py:381-388; None keeps the "
                          "reference's 111-point grid)"),
        click.option("--act-num-candidates", type=int, default=None,
                     help="act-quant MSE grid size; falls back to "
                          "--num-candidates"),
        click.option("--quant-setup", type=click.Choice(
            ["all", "FP_logits", "fc4", "fc4_dw8", "LSQ", "LSQ_paper"]),
            default="all"),
        click.option("--weight-quant/--no-weight-quant", default=True),
        click.option("--act-quant/--no-act-quant", default=True),
        click.option("--num-est-batches", type=int, default=1),
        click.option("--quantize-input/--no-quantize-input", default=False),
        # fp8_options (click_options.py:443-474)
        click.option("--fp8-maxval", type=float, default=None),
        click.option("--fp8-mantissa-bits", type=int, default=4),
        click.option("--fp8-set-maxval/--no-fp8-set-maxval", default=False),
        click.option("--fp8-learn-maxval/--no-fp8-learn-maxval", default=False),
        click.option("--fp8-learn-mantissa-bits/--no-fp8-learn-mantissa-bits",
                     default=False),
        click.option("--fp8-mse-include-mantissa-bits/"
                     "--no-fp8-mse-include-mantissa-bits", default=True),
        click.option("--fp8-allow-unsigned/--no-fp8-allow-unsigned",
                     default=False),
        # TPU-native extensions (no reference counterpart)
        click.option("--engine", type=click.Choice(["parity", "bf16", "pallas"]),
                     default="parity",
                     help="compute engine: parity=fp32 reference semantics, "
                          "bf16=normalized-grid MXU, pallas=fused kernels"),
        click.option("--bn-mode", type=click.Choice(["fp32_after", "folded"]),
                     default="fp32_after",
                     help="BN after quantized conv (reference parity) or "
                          "folded into per-channel weight scales (deployment)"),
        click.option("--deploy-cast-quant/--no-deploy-cast-quant",
                     default=False,
                     help="fixed-mode FP8 fake-quant as one saturating IEEE "
                          "f8 cast (bit-exact; ops/fp8.fp8_quantize_cast)"),
        click.option("--conv-out-bf16/--no-conv-out-bf16", default=False,
                     help="bf16 conv stores into fused quant epilogues "
                          "(~2^-9 rounding, halves epilogue HBM traffic)"),
        click.option("--int8-mxu/--no-int8-mxu", default=False,
                     help="engine=pallas + INT configs: feed the MXU's "
                          "native s8xs8->s32 datapath (v5e rates int8 at "
                          "~2x bf16 peak) instead of bf16 upconversion"),
        click.option("--deploy-act-f8/--no-deploy-act-f8", default=False,
                     help="store factored activations as IEEE f8 arrays "
                          "(halves inter-layer HBM traffic; sub-smallest-"
                          "normal region coarsens to the IEEE subnormal "
                          "grid — delta pinned in tests)"),
        click.option("--grad-estimator", type=click.Choice(
            ["ste", "stoch_round", "ewgs", "stacked_sigmoid"]), default="ste"),
        click.option("--stem-s2d/--no-stem-s2d", default=False,
                     help="ResNet only: run the 7x7/s2 stem as an exact "
                          "space-to-depth 4x4/s1 conv (ops/s2d.py) — same "
                          "logits, MXU-friendly shape"),
    ]
    for o in reversed(opts):
        f = o(f)
    return f


def _setup(kw):
    """Common setup: platform, config, model, data, variables."""
    if kw["platform"]:
        import jax
        jax.config.update("jax_platforms", kw["platform"])
    import jax

    if kw.get("deterministic"):
        import random

        import numpy as _np
        random.seed(kw["seed"])
        _np.random.seed(kw["seed"])
        log.info("deterministic run: python/numpy RNGs seeded with %d "
                 "(jax PRNG already keyed on --seed; TPU/XLA execution is "
                 "deterministic by construction)", kw["seed"])

    from fp8_quantization_tpu.data.imagenet import make_dataloaders
    from fp8_quantization_tpu.models import QUANT_ARCHITECTURES
    from fp8_quantization_tpu.nn.config import make_layer_config

    config = make_layer_config(
        qmethod=kw["qmethod"], act_qmethod=kw["qmethod_act"],
        n_bits=kw["n_bits"], n_bits_act=kw["n_bits_act"],
        per_channel_weights=kw["per_channel"],
        weight_range_method=kw["weight_quant_method"],
        act_range_method=kw["act_quant_method"],
        percentile=kw["percentile"], act_momentum=kw["act_momentum"],
        num_candidates=kw["num_candidates"],
        act_num_candidates=kw["act_num_candidates"],
        quantize_input=kw["quantize_input"],
        fp8_maxval=kw["fp8_maxval"], fp8_mantissa_bits=kw["fp8_mantissa_bits"],
        fp8_set_maxval=kw["fp8_set_maxval"],
        fp8_learn_maxval=kw["fp8_learn_maxval"],
        fp8_learn_mantissa_bits=kw["fp8_learn_mantissa_bits"],
        fp8_mse_include_mantissa_bits=kw["fp8_mse_include_mantissa_bits"],
        fp8_allow_unsigned=kw["fp8_allow_unsigned"],
        engine=kw["engine"], bn_mode=kw["bn_mode"],
        grad_estimator=kw["grad_estimator"],
        deploy_cast_quant=kw.get("deploy_cast_quant", False),
        conv_out_bf16=kw.get("conv_out_bf16", False),
        deploy_act_f8=kw.get("deploy_act_f8", False),
        int8_mxu=kw.get("int8_mxu", False))

    arch = kw["architecture"]
    extra = ({"stem_s2d": True} if kw.get("stem_s2d")
             and "resnet" in arch else {})
    model = QUANT_ARCHITECTURES[arch](config, quant_setup=kw["quant_setup"],
                                      **extra)
    train_data, val_data = make_dataloaders(
        kw["images_dir"], batch_size=kw["batch_size"],
        num_workers=kw["num_workers"], seed=kw["seed"],
        interpolation=kw["interpolation"])

    import jax.numpy as jnp
    import numpy as np

    x0 = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(kw["seed"]), x0)

    if kw["model_dir"]:
        from fp8_quantization_tpu.models.convert import (
            convert_mobilenet_v2, convert_resnet, convert_vit,
            load_torch_state_dict, merge_variables)

        sd = load_torch_state_dict(kw["model_dir"])
        if arch == "mobilenet_v2_quantized":
            params, stats = convert_mobilenet_v2(sd)
        elif arch.startswith("vit"):
            params, stats = convert_vit(sd)
        else:
            stages = (2, 2, 2, 2) if "18" in arch else (3, 4, 6, 3)
            params, stats = convert_resnet(sd, stages, bottleneck="50" in arch)
        variables = merge_variables(variables, params, stats)
        log.info("loaded torch checkpoint %s", kw["model_dir"])
    elif kw["images_dir"]:
        log.warning("no --model-dir given: evaluating randomly-initialized "
                    "weights (accuracy will be chance level)")

    mesh = None
    if kw["data_parallel"] * kw["model_parallel"] > 1:
        from fp8_quantization_tpu.parallel import make_mesh
        mesh = make_mesh(data=kw["data_parallel"], model=kw["model_parallel"])
    return model, config, variables, train_data, val_data, mesh


@click.group()
def fp8_cmd_group():
    pass


@fp8_cmd_group.command()
@_quant_options
@click.option("--load-type", type=click.Choice(["fp32", "quantized"]),
              default="fp32",
              help="fp32: calibrate from scratch; quantized: restore a "
                   "previously saved calibrated state and skip calibration "
                   "(reference: image_net.py:42-47, --load-type)")
@click.option("--load-checkpoint-dir", type=str, default=None,
              help="orbax checkpoint dir for --load-type quantized")
@click.option("--save-checkpoint-dir", type=str, default=None,
              help="save the calibrated (quantized) state after calibration")
@click.option("--reestimate-bn-stats/--no-reestimate-bn-stats", default=False)
@click.option("--bake-weights/--no-bake-weights", default=False,
              help="precompute fake-quantized weights once and evaluate with "
                   "the per-step weight-quant chain removed (bit-identical)")
@click.option("--format-search-passes", type=int, default=0,
              help="network-aware global FP8 format allocation: N coordinate-"
                   "descent sweeps minimizing quantized-vs-fp32 logits MSE "
                   "over per-quantizer mantissa bits (beyond the reference's "
                   "local per-tensor MSE; calibration/format_search.py)")
@click.option("--max-eval-batches", type=int, default=None)
def validate_quantized(**kw):
    """PTQ: calibrate ranges, freeze, evaluate top-1/top-5/loss.

    Reference: image_net.py:36-97 (validate_quantized).
    """
    model, config, variables, train_data, val_data, mesh = _setup(kw)

    from fp8_quantization_tpu.calibration.calibrate import calibrate, evaluate

    if train_data is None:
        # no train split: calibrate on the first few val batches WITHOUT
        # materializing the whole split (round-1 held O(dataset) in host
        # memory for a num_est_batches-sized need)
        from itertools import islice
        cal_data = list(islice(iter(val_data), kw["num_est_batches"]))
    else:
        cal_data = train_data
    if kw["load_type"] == "quantized":
        if not kw["load_checkpoint_dir"]:
            raise click.UsageError(
                "--load-type quantized requires --load-checkpoint-dir")
        from fp8_quantization_tpu.utils.checkpoint import restore_checkpoint
        variables = restore_checkpoint(kw["load_checkpoint_dir"], variables)
        log.info("restored quantized state from %s (calibration skipped)",
                 kw["load_checkpoint_dir"])
    elif mesh is not None:
        from fp8_quantization_tpu.parallel import (
            calibrate_sharded, evaluate_sharded)
        variables = calibrate_sharded(
            model, variables, cal_data, mesh,
            num_batches=kw["num_est_batches"],
            tensor_parallel=kw["model_parallel"] > 1,
            quant_w=kw["weight_quant"], quant_a=kw["act_quant"])
        log.info("calibration done (%d batches)", kw["num_est_batches"])
    else:
        variables = calibrate(model, variables, cal_data,
                              num_batches=kw["num_est_batches"],
                              quant_w=kw["weight_quant"],
                              quant_a=kw["act_quant"])
        log.info("calibration done (%d batches)", kw["num_est_batches"])

    if kw["save_checkpoint_dir"]:
        from fp8_quantization_tpu.utils.checkpoint import save_checkpoint
        save_checkpoint(kw["save_checkpoint_dir"], variables)
        log.info("calibrated state saved to %s", kw["save_checkpoint_dir"])

    if kw["reestimate_bn_stats"]:
        from fp8_quantization_tpu.training import reestimate_bn_stats
        n = max(1, int(0.02 * len(cal_data)))  # 2% of train (image_net.py:87-91)
        variables = reestimate_bn_stats(model, variables, cal_data,
                                        num_batches=n)
        log.info("BN stats re-estimated on %d batches", n)

    if kw["format_search_passes"] > 0:
        from fp8_quantization_tpu.calibration.format_search import (
            network_format_search)
        from itertools import islice
        variables, assignment, history = network_format_search(
            model, variables,
            list(islice(iter(cal_data), kw["num_est_batches"])),
            passes=kw["format_search_passes"],
            quant_w=kw["weight_quant"], quant_a=kw["act_quant"])
        log.info("global format search: network MSE %.3e -> %.3e; "
                 "assignment: %s", history[0], history[-1],
                 json.dumps(assignment))

    quant_w = kw["weight_quant"]
    if kw["bake_weights"]:
        import jax.numpy as jnp

        from fp8_quantization_tpu.nn.bake import bake_weights
        variables = bake_weights(model, variables,
                                 jnp.zeros((1, 224, 224, 3), jnp.float32))
        quant_w = False
        log.info("weights baked: per-step weight quantization disabled")

    if mesh is not None:
        from fp8_quantization_tpu.parallel import evaluate_sharded
        metrics = evaluate_sharded(model, variables, val_data, mesh,
                                   tensor_parallel=kw["model_parallel"] > 1,
                                   max_batches=kw["max_eval_batches"],
                                   quant_w=quant_w, quant_a=kw["act_quant"])
    else:
        metrics = evaluate(model, variables, val_data,
                           quant_w=quant_w,
                           quant_a=kw["act_quant"],
                           max_batches=kw["max_eval_batches"])
    print(json.dumps(metrics))


def _scan_real_assets():
    """Auto-detect mounted ImageNet trees and pretrained torch checkpoints.

    Scans the standard mount points (plus $IMAGENET_DIR / $MODEL_DIR) at
    shallow depth so the real-data legs run without builder intervention
    the moment assets appear in an environment.  Returns
    {"imagenet_root": path|None, "checkpoints": {arch: path},
     "scanned": [paths]}.
    """
    import os
    from pathlib import Path

    data_roots = [os.environ.get("IMAGENET_DIR"), "/data", "/datasets",
                  "/mnt/data", "/mnt/imagenet", "/mnt/disks",
                  "/root/data", "/srv/datasets",
                  str(Path.home() / "imagenet")]
    ckpt_roots = [os.environ.get("MODEL_DIR"), "/models", "/checkpoints",
                  "/root/models", "/root/checkpoints", "/data/models",
                  str(Path.home() / ".cache/torch/hub/checkpoints")]

    def _looks_imagenet(d: "Path") -> bool:
        # ImageFolder layout: val/ (or the root itself) holding many
        # class dirs — WordNet ids (n01440764) or at least 100 subdirs
        for cand in (d / "val", d / "validation", d):
            try:
                subs = [p.name for p in list(cand.iterdir())[:1200]
                        if p.is_dir()]
            except OSError:
                continue
            wn = sum(1 for s in subs if s.startswith("n0") or
                     s.startswith("n1"))
            if wn >= 50 or len(subs) >= 100:
                return True
        return False

    imagenet_root, scanned = None, []
    for root in data_roots:
        if not root:
            continue
        d = Path(root)
        scanned.append(str(d))
        if not d.is_dir():
            continue
        cands = [d] + [p for p in d.iterdir() if p.is_dir()][:32]
        for c in cands:
            if _looks_imagenet(c):
                imagenet_root = str(c)
                break
        if imagenet_root:
            break

    checkpoints = {}
    arch_keys = {"resnet18": "resnet18", "resnet50": "resnet50",
                 "mobilenet": "mobilenet_v2", "mobilenetv2": "mobilenet_v2",
                 "vit": "vit_small", "deit": "vit_small"}
    for root in ckpt_roots:
        if not root:
            continue
        d = Path(root)
        scanned.append(str(d))
        if not d.is_dir():
            continue
        files = [p for p in d.rglob("*") if p.suffix in
                 (".pth", ".pt", ".tar") and p.is_file()]
        for f in files[:200]:
            name = f.name.lower()
            for key, arch in arch_keys.items():
                if key in name and arch not in checkpoints:
                    checkpoints[arch] = str(f)
    return {"imagenet_root": imagenet_root, "checkpoints": checkpoints,
            "scanned": scanned}


@fp8_cmd_group.command()
@click.option("--workdir", default="/tmp/fp8tpu_rehearsal")
@click.option("--images-dir", type=str, default=None,
              help="REAL ImageNet root; omitted -> auto-detect, then "
                   "synthetic 1000-class tree")
@click.option("--model-dirs", type=str, default=None,
              help="comma-separated arch=ckpt.pth; omitted -> auto-detect, "
                   "then synthetic ckpts")
@click.option("--archs", default="resnet18,mobilenet_v2,vit_small")
@click.option("--platform", type=str, default=None)
@click.option("--batch-size", type=int, default=64)
@click.option("--images", type=int, default=2000)
@click.option("--max-eval-batches", type=int, default=None)
@click.option("--report-out", type=str, default=None,
              help="write the readiness report JSON here")
@click.option("--scan-only", is_flag=True,
              help="print the asset-scan report and the exact command a "
                   "real run would execute, without running it")
def preflight(**kw):
    """One-command readiness check of the real-data PTQ path.

    First auto-detects mounted ImageNet trees / pretrained checkpoints
    (standard mount points + $IMAGENET_DIR/$MODEL_DIR) and reports exactly
    what a real run would execute.  Then drives tools/dress_rehearsal.py:
    torch-checkpoint conversion -> ImageFolder decode -> calibration ->
    fixed-range eval for every arch.  Without real assets it runs on
    synthetic checkpoints + JPEGs (chance top-1; the PATH is what's
    validated); detected or explicit real assets make the same command
    produce the BASELINE.md deltas.
    """
    import subprocess
    import sys
    from pathlib import Path

    scan = _scan_real_assets()
    images_dir = kw["images_dir"] or scan["imagenet_root"]
    model_dirs = kw["model_dirs"]
    if not model_dirs and scan["checkpoints"]:
        model_dirs = ",".join(f"{a}={p}"
                              for a, p in scan["checkpoints"].items())

    repo = Path(__file__).resolve().parent.parent
    cmd = [sys.executable, str(repo / "tools" / "dress_rehearsal.py"),
           "--workdir", kw["workdir"], "--archs", kw["archs"],
           "--batch-size", str(kw["batch_size"]),
           "--images", str(kw["images"])]
    if images_dir:
        cmd += ["--images-dir", images_dir]
    if model_dirs:
        cmd += ["--model-dirs", model_dirs]
    if kw["platform"]:
        cmd += ["--platform", kw["platform"]]
    if kw["max_eval_batches"]:
        cmd += ["--max-eval-batches", str(kw["max_eval_batches"])]

    report = {"scan": scan,
              "resolved_images_dir": images_dir,
              "resolved_model_dirs": model_dirs,
              "mode": ("REAL assets" if images_dir or model_dirs
                       else "synthetic (no real assets found)"),
              "command": " ".join(cmd)}
    print(json.dumps(report, indent=2))
    if kw["report_out"]:
        Path(kw["report_out"]).write_text(json.dumps(report, indent=2))
    if kw["scan_only"]:
        return
    raise SystemExit(subprocess.call(cmd))


@fp8_cmd_group.command()
@_quant_options
@click.option("--optimizer", type=str, default="SGD")
@click.option("--learning-rate", type=float, default=1e-3)
@click.option("--momentum", type=float, default=0.9)
@click.option("--weight-decay", type=float, default=0.0)
@click.option("--learning-rate-schedule", type=str, default=None,
              help="e.g. multistep:10:20 or cosine:1:0.01")
@click.option("--max-epochs", type=int, default=1)
@click.option("--sep-quant-optimizer/--no-sep-quant-optimizer", default=False)
@click.option("--quant-optimizer", type=str, default="Adam")
@click.option("--quant-learning-rate", type=float, default=1e-5)
@click.option("--oscillations-dampen-weight", type=float, default=0.0,
              help="oscillation dampening strength (0 = off); the reference "
                   "parses this flag but never implements it — we do")
@click.option("--oscillations-dampen-weight-final", type=float, default=None)
@click.option("--oscillations-dampen-anneal-start", type=float, default=0.25)
@click.option("--oscillations-freeze-threshold", type=float, default=0.0,
              help="freeze weights whose oscillation frequency EMA exceeds "
                   "this (0 = off)")
@click.option("--oscillations-freeze-threshold-final", type=float, default=None)
@click.option("--oscillations-freeze-anneal-start", type=float, default=0.25)
@click.option("--oscillations-freeze-ema-momentum", type=float, default=0.99)
@click.option("--learn-ranges/--estimate-ranges-train", "learn_ranges",
              default=True,
              help="learn ranges through the STE vs keep re-estimating "
                   "(Qstates learn_ranges vs estimate_ranges_train)")
@click.option("--reestimate-bn-stats/--no-reestimate-bn-stats", default=True)
@click.option("--grad-scaling/--no-grad-scaling", default=False)
@click.option("--save-checkpoint-dir", type=str, default=None)
@click.option("--tb-logging-dir", type=str, default=None,
              help="metrics JSONL directory (reference flag name)")
@click.option("--max-train-batches", type=int, default=None,
              help="cap batches per epoch (smoke tests)")
def train_quantized(**kw):
    """QAT: fine-tune weights + quant ranges through the STE.

    Wires the reference's dormant QAT infrastructure end to end
    (SURVEY.md §3.4: qat_utils + optimizer_utils + supervised_driver).
    """
    model, config, variables, train_data, val_data, mesh = _setup(kw)
    if train_data is None:
        # make_dataloaders returns None for a val-only ImageFolder tree;
        # QAT needs labelled training batches (the reference's train split,
        # imagenet_dataloaders.py:89-99) — fail with the fix, not a
        # NoneType iteration deep in the calibration loop
        raise click.UsageError(
            f"--images-dir {kw['images_dir']} has no train/ split; "
            "train-quantized needs one (validate-quantized works val-only)")

    from fp8_quantization_tpu.calibration.calibrate import calibrate, evaluate
    from fp8_quantization_tpu.training import (
        init_qat_state, make_optimizer, make_train_step, reestimate_bn_stats,
        train_epoch)

    variables = calibrate(model, variables, train_data,
                          num_batches=kw["num_est_batches"])

    steps_per_epoch = len(train_data) if hasattr(train_data, "__len__") else 1000
    model_tx = make_optimizer(kw["optimizer"], kw["learning_rate"],
                              momentum=kw["momentum"],
                              weight_decay=kw["weight_decay"],
                              scheduler=kw["learning_rate_schedule"],
                              max_steps=steps_per_epoch * kw["max_epochs"],
                              steps_per_epoch=steps_per_epoch)
    quant_tx = (make_optimizer(kw["quant_optimizer"], kw["quant_learning_rate"])
                if kw["sep_quant_optimizer"] else None)
    oscillation = None
    if kw["oscillations_dampen_weight"] > 0 or kw["oscillations_freeze_threshold"] > 0:
        from fp8_quantization_tpu.training.oscillation import OscillationConfig
        oscillation = OscillationConfig(
            dampen_weight=kw["oscillations_dampen_weight"],
            dampen_weight_final=kw["oscillations_dampen_weight_final"],
            dampen_anneal_start=kw["oscillations_dampen_anneal_start"],
            freeze_threshold=kw["oscillations_freeze_threshold"],
            freeze_threshold_final=kw["oscillations_freeze_threshold_final"],
            freeze_anneal_start=kw["oscillations_freeze_anneal_start"],
            freeze_ema_momentum=kw["oscillations_freeze_ema_momentum"],
            total_steps=steps_per_epoch * kw["max_epochs"])
    state, aux = init_qat_state(variables, config, model_tx, quant_tx,
                                oscillation=oscillation, model=model)
    if mesh is not None:
        from fp8_quantization_tpu.parallel import shard_qat_state
        state = shard_qat_state(mesh, state,
                                tensor_parallel=kw["model_parallel"] > 1)

    from fp8_quantization_tpu.utils.metrics import MetricsLogger

    mlog = MetricsLogger(kw["tb_logging_dir"], run_name=kw["architecture"])
    mode = "learn" if kw["learn_ranges"] else "calibrate_train"
    step_fn = make_train_step(model, aux, mode=mode)

    def _batches():
        for i, b in enumerate(train_data):
            if kw["max_train_batches"] and i >= kw["max_train_batches"]:
                break
            yield b

    for epoch in range(kw["max_epochs"]):
        state, metrics = train_epoch(model, state, aux, _batches(),
                                     mode=mode, step_fn=step_fn)
        mlog.log(epoch, metrics, prefix="train/")

        eval_vars = state.variables()
        if kw["reestimate_bn_stats"]:
            eval_vars = reestimate_bn_stats(model, eval_vars, _batches(),
                                            num_batches=50)
        val_metrics = evaluate(model, eval_vars, val_data)
        mlog.log(epoch, val_metrics, prefix="val/")

        if kw["save_checkpoint_dir"]:
            from fp8_quantization_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(kw["save_checkpoint_dir"], state, step=epoch)

    print(json.dumps(val_metrics))


if __name__ == "__main__":
    fp8_cmd_group()
