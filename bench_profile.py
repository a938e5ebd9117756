#!/usr/bin/env python
"""Step-time / MFU breakdown of the quantized inference path (VERDICT item 4).

Times a matrix of ResNet-18 configurations with interleaved windows on the
attached device and prints, per variant: step ms, img/s, TFLOP/s, MFU vs the
v5e's 197 TF/s bf16 peak, plus XLA's own cost analysis (flops, bytes
accessed) for the compiled executable — the number that separates
"HBM-bound" from "tax in the epilogue math".

Usage: python bench_profile.py [--batch 128] [--trace DIR]
"""

import argparse
import logging
import os
import time

logging.basicConfig(level=os.environ.get("LOGLEVEL", "WARNING"))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fp8tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12   # TF/s per chip


_SETUP_CACHE = {}


MODEL_GFLOP = {"resnet18": 3.648, "resnet50": 8.21, "mobilenet_v2": 0.628,
               "vit_small": 9.2}   # fwd, 224px, MAC=2 flops (resnet18 =
                                   # 1.824 GMACs; audited via tools/roofline)


def build(engine: str, conv_out_bf16: bool, batch: int, cast_quant=False,
          arch: str = "resnet18", act_f8: bool = False, qscheme: str = "fp8",
          stem_s2d: bool = False, int8_signed: bool = False,
          quantize_input: bool = False, cast_ieee: bool = False):
    """Model + baked variables + input.  Calibration/bake are shared per
    engine bake-format ('parity' vs factored) to keep tunnel traffic low."""
    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.models import (mobilenetv2_quantized,
                                             resnet18_quantized,
                                             resnet50_quantized,
                                             vit_small_quantized)
    from fp8_quantization_tpu.nn.bake import prepare_for_deployment_host
    from fp8_quantization_tpu.nn.config import make_layer_config

    if qscheme == "int8":
        # native int8 MXU datapath: int_sym weights quantized IN-KERNEL
        # (not baked — the s8 path needs the integer grid), int_asym input
        config = make_layer_config(
            qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
            per_channel_weights=True, quantize_input=True,
            weight_range_method="current_minmax",
            act_range_method="allminmax", engine=engine, int8_mxu=True,
            conv_out_bf16=conv_out_bf16, int8_assume_signed=int8_signed)
    else:
        config = make_layer_config(
            qmethod="fp_quantizer", per_channel_weights=True,
            fp8_mantissa_bits=4, fp8_set_maxval=True,
            weight_range_method="current_minmax",
            act_range_method="allminmax", engine=engine,
            conv_out_bf16=conv_out_bf16, deploy_cast_quant=cast_quant,
            deploy_act_f8=act_f8, quantize_input=quantize_input,
            deploy_cast_ieee=cast_ieee)
    ctor = {"mobilenet_v2": mobilenetv2_quantized,
            "vit_small": vit_small_quantized,
            "resnet18": resnet18_quantized,
            "resnet50": resnet50_quantized}[arch]
    # stem_s2d is apply-time only (exact transform, identical variables), so
    # the calibrate/bake cache below is shared with the non-s2d variants —
    # and the cache is always POPULATED by the plain-input twin (an s2d
    # model cannot init/calibrate on 3-channel images; previously this only
    # worked when a non-s2d variant happened to build first)
    extra = ({"stem_s2d": stem_s2d} if stem_s2d and "resnet" in arch
             else {})
    model = ctor(config, num_classes=1000, **extra)
    setup_model = ctor(config, num_classes=1000) if extra else model
    if "x" not in _SETUP_CACHE:
        # generated ON DEVICE: the axon tunnel uploads ~2 MB/s, a batch-256
        # fp32 input is 154 MB — host-side RandomState would eat the window
        _SETUP_CACHE["x"] = jax.random.normal(
            jax.random.PRNGKey(0), (batch, 224, 224, 3), jnp.float32)
    x = _SETUP_CACHE["x"]
    fmt = ("parity" if engine == "parity" else "factored") + (
        "+cast" if cast_quant else "") + ("+int8" if qscheme == "int8" else "") \
        + ("+qin" if quantize_input else "")
    import sys

    def _mark(msg):
        print(f"[profile]   {msg}", file=sys.stderr, flush=True)

    if fmt not in _SETUP_CACHE:
        # jitted: eager init is per-op LATENCY-bound over the axon tunnel
        # (hundreds of dispatches -> minutes for MobileNetV2)
        variables = jax.jit(setup_model.init)(jax.random.PRNGKey(0), x[:8])
        jax.block_until_ready(variables)
        _mark("init done")
        variables = calibrate(setup_model, variables, [x[:8]])
        jax.block_until_ready(variables["quant"])
        _mark("calibrate done")
        if qscheme == "int8":
            # baked-int8 weights: kernels consume the stored integer grid
            # (w_prequant) — no weight quant chain in the step.  ViT:
            # pos_embed is input-size-bound, the bake forward must match.
            from fp8_quantization_tpu.nn.bake import bake_int8_weights_host
            _SETUP_CACHE[fmt] = bake_int8_weights_host(
                setup_model, variables,
                example_shape=((1, 224, 224, 3) if arch == "vit_small"
                               else (1, 64, 64, 3)))
        else:
            # eager transform -> host backend (latency over the tunnel).
            # ViT: pos_embed is input-size-bound, so the transform's example
            # must match the bench resolution (CNNs only need stride depth).
            shape = ((1, 224, 224, 3) if arch == "vit_small"
                     else (1, 64, 64, 3))
            _SETUP_CACHE[fmt] = prepare_for_deployment_host(
                setup_model, variables, example_shape=shape)
        _mark("bake/prepare done")
    return model, _SETUP_CACHE[fmt], x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--trace", default=None,
                    help="capture a jax.profiler trace of each variant here")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--arch", default="resnet18",
                    choices=list(MODEL_GFLOP))
    ap.add_argument("--pallas", action="store_true",
                    help="add an engine=pallas variant (measured autotune "
                         "gating) instead of forcing XLA-only")
    ap.add_argument("--int8", action="store_true",
                    help="add the native-int8-MXU variant (int_sym weights "
                         "+ int_asym input quant on the s8xs8->s32 kernel)")
    ap.add_argument("--input-bf16", action="store_true",
                    help="feed bf16 input images (the serving-pipeline "
                         "dtype): removes the fp32->bf16 convert pass the "
                         "trace attribution measured at 0.70 ms/step and "
                         "halves the stem conv's input read; applied to "
                         "EVERY variant incl. the fp32 baseline so the "
                         "quantization ratio stays honest")
    ap.add_argument("--variants", default=None,
                    help="comma-separated variant-name substrings to keep "
                         "(fp32_bf16ops always kept as the baseline); use to "
                         "fit an A/B into one tunnel window")
    ap.add_argument("--stem-s2d", action="store_true",
                    help="add exact space-to-depth stem variants (ResNet): "
                         "fp32_s2d + fp8_cast_convbf16_s2d A/B rows")
    ap.add_argument("--no-baseline", action="store_true",
                    help="skip the fp32 baseline build too (axon compiles "
                         "are NOT cached across processes — a single-variant "
                         "absolute measurement avoids rebuilding fp32 when "
                         "its number is already known)")
    args = ap.parse_args()

    keep = args.variants.split(",") if args.variants else None

    variants = {}

    stats = {}

    def add(name, engine, conv_bf16, quant_a, cast_quant=False, act_f8=False,
            qscheme="fp8", stem_s2d=False, int8_signed=False,
            quantize_input=False, cast_ieee=False):
        if name == "fp32_bf16ops":
            if args.no_baseline:
                return
        elif keep is not None and not any(
                name == s[1:] if s.startswith("=") else s in name
                for s in keep):
            return
        import sys
        print(f"[profile] building {name}", file=sys.stderr, flush=True)
        model, variables, x = build(engine, conv_bf16, args.batch, cast_quant,
                                    args.arch, act_f8, qscheme, stem_s2d,
                                    int8_signed, quantize_input, cast_ieee)
        if args.input_bf16:
            x = x.astype(jnp.bfloat16)
        if stem_s2d == "input":
            # serving pipeline delivers pre-s2d images (free host shuffle);
            # transform once outside the timed fn
            from fp8_quantization_tpu.ops.s2d import space_to_depth
            x = jax.jit(space_to_depth)(x)
        quant_w = qscheme == "int8"        # int8: in-kernel weight quant
        fn = jax.jit(lambda v, xx: model.apply(
            v, xx, mode="fixed", quant_w=quant_w, quant_a=quant_a))
        # compile HERE: the pallas autotune gate (at.MODE) is read at trace
        # time, so each variant must lower while its intended mode is active
        compiled = fn.lower(variables, x).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        stats[name] = {"flops": ca.get("flops", float("nan")),
                       "bytes": ca.get("bytes accessed", float("nan"))}
        variants[name] = (compiled, variables, x)

    import fp8_quantization_tpu.ops.pallas.autotune as at
    at.MODE = "never"                      # XLA-only first; pallas separately
    add("fp32_bf16ops", "bf16", False, False)
    add("fp8_factored", "bf16", False, True)
    add("fp8_cast", "bf16", False, True, cast_quant=True)
    add("fp8_cast_convbf16", "bf16", True, True, cast_quant=True)
    add("fp8_cast_convbf16_actf8", "bf16", True, True, cast_quant=True,
        act_f8=True)
    # quantize_input placement A/B (VERDICT r3 item 3): quant runs as each
    # CONSUMER's input prologue instead of the producer's epilogue
    add("fp8_cast_convbf16_qin", "bf16", True, True, cast_quant=True,
        quantize_input=True)
    # pure-saturating-cast act rounding (no subnormal select; RESULTS r4)
    add("fp8_cast_convbf16_ieee", "bf16", True, True, cast_quant=True,
        cast_ieee=True)
    if args.stem_s2d:
        add("fp32_s2d", "bf16", False, False, stem_s2d=True)
        add("fp8_cast_convbf16_s2d", "bf16", True, True, cast_quant=True,
            stem_s2d=True)
        add("fp32_s2dinput", "bf16", False, False, stem_s2d="input")
        add("fp8_cast_convbf16_s2dinput", "bf16", True, True,
            cast_quant=True, stem_s2d="input")
    if args.pallas:
        at.MODE = "auto"                   # measured per-shape gating
        add("fp8_pallas_convbf16", "pallas", True, True, cast_quant=True)
    if args.int8:
        at.MODE = "never"  # pure XLA-native s8 route (ops/int8.py), no
        # Pallas gates — the clean s8 datapath row for any arch (incl. ViT)
        add("int8_xla", "bf16", False, True, qscheme="int8")
        add("int8_xla_bf16s", "bf16", True, True, qscheme="int8")
        add("int8_xla_opt", "bf16", True, True, qscheme="int8",
            int8_signed=True)
        at.MODE = "auto"   # XLA-native s8 route (ops/int8.py) by default;
        # the Pallas int8 kernels only where the measured gate says they win
        add("int8_mxu", "pallas", False, True, qscheme="int8")
        at.MODE = "always"  # FORCE the repo's own fused int8 Pallas
        # kernels at model level (VERDICT r3 item 1: they had never been
        # model-raced) — in-kernel input quant, s8 im2col, baked weights
        add("int8_pallas", "pallas", False, True, qscheme="int8")
        at.MODE = "auto"

    # interleaved timing.  Two input buffers, alternated per iteration:
    # the dev tunnel short-circuits repeated identical (executable, args)
    # dispatches through a result cache — observed as impossible 0.3 ms
    # "steps" on the int8 variants (memory: tpu-tunnel-quirks).
    times = {name: [] for name in variants}
    alt = {}
    for name, (fn, variables, x) in variants.items():
        alt[name] = jnp.roll(x, 1, axis=0)
        out = None
        for xx in (x, alt[name]):
            out = fn(variables, xx)
        jax.block_until_ready(out)
    for _ in range(args.reps):
        for name, (fn, variables, x) in variants.items():
            xs = (x, alt[name])
            t0 = time.perf_counter()
            out = None
            for i in range(args.iters):
                out = fn(variables, xs[i % 2])
            jax.block_until_ready(out)
            times[name].append((time.perf_counter() - t0) / args.iters)

    model_flops = MODEL_GFLOP[args.arch] * 1e9 * args.batch
    print(f"{'variant':26s} {'ms':>8s} {'img/s':>9s} {'TF/s':>7s} "
          f"{'MFU%':>6s} {'XLA GF':>8s} {'XLA GB':>7s}")
    base_ms = None
    for name in variants:
        t = sorted(times[name])[len(times[name]) // 2]
        if base_ms is None:
            base_ms = t
        tfs = model_flops / t / 1e12
        print(f"{name:26s} {t * 1e3:8.2f} {args.batch / t:9.0f} {tfs:7.1f} "
              f"{100 * model_flops / t / V5E_BF16_PEAK:6.1f} "
              f"{stats[name]['flops'] / 1e9:8.1f} "
              f"{stats[name]['bytes'] / 1e9:7.2f}"
              + (f"   ({t / base_ms:.3f}x fp32)" if name != "fp32_bf16ops"
                 else ""))

    if args.trace:
        for name, (fn, variables, x) in variants.items():
            with jax.profiler.trace(f"{args.trace}/{name}"):
                for _ in range(3):
                    out = fn(variables, x)
                jax.block_until_ready(out)
        print(f"traces written to {args.trace}/<variant>")


if __name__ == "__main__":
    main()
