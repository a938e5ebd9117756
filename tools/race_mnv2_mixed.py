#!/usr/bin/env python
"""Race mixed MobileNetV2 deployment presets (VERDICT r4 item 2b).

The round-4 per-fusion table pinned MNv2's 0.69x fp8 ratio on the
depthwise chain: dw+project fusions run at ~29-46% of HBM speed-of-light
vs fp32's 60-88% because the fake-quant epilogues double the VPU work of
fusions that are VPU-bound to begin with, and block1_0's expand->dw
nesting breaks (~1.0 ms).  On a bf16-MXU chip the dw convs execute in
bf16 either way, so a deployment config may legitimately leave the
VPU-bound chain's ACTIVATION quantizers off (paper precedent for special
dw treatment: the fc4_dw8 preset,
/root/reference/models/mobilenet_v2_quantized.py:49-60; precedent for
fp32 acts on chosen layers: FP_logits / LSQ_paper's block_act).

Variants (weights stay quantized everywhere unless noted):

  fp8    all-quantized champion (the current bench config)
  dwa    dw act quantizers off (dw_config = fp32_acts)
  dwxa   expand AND dw act quantizers off — the expand epilogue loses its
         subnormal-fixup select, which is what blocks fp32-style
         expand->dw nesting (round-4 ieee-cast forensics)
  nodw   dw entirely unquantized (weights too — the VERDICT's "leave the
         depthwise chain in bf16")

Each variant interleaved with its own fp32 windows.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fp8tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

MNV2_GFLOP = 0.628
V5E_BF16_PEAK = 197e12


def bench_pair(fn_a, args_a, fn_b, args_b, iters=10, warmup=3, repeats=4):
    for fn, args in ((fn_a, args_a), (fn_b, args_b)):
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
    times = {0: [], 1: []}
    for _ in range(repeats):
        for idx, fn, args in ((0, fn_a, args_a), (1, fn_b, args_b)):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            times[idx].append((time.perf_counter() - t0) / iters)
    med = lambda ts: sorted(ts)[len(ts) // 2]  # noqa: E731
    return med(times[0]), med(times[1])


def build(batch, variant):
    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.models.mobilenet_v2 import QuantizedMobileNetV2
    from fp8_quantization_tpu.nn.bake import prepare_for_deployment_host
    from fp8_quantization_tpu.nn.config import make_layer_config

    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True,
        fp8_mantissa_bits=4, fp8_set_maxval=True,
        weight_range_method="current_minmax",
        act_range_method="allminmax", engine="bf16",
        deploy_cast_quant=True, conv_out_bf16=True)
    kw = {}
    if variant == "dwa":
        kw["dw_config"] = cfg.fp32_acts()
    elif variant == "dwxa":
        kw["dw_config"] = cfg.fp32_acts()
        kw["expand_config"] = cfg.fp32_acts()
    elif variant == "nodw":
        kw["dw_config"] = cfg.fp32_acts().replace(quant_w=False)
    model = QuantizedMobileNetV2(num_classes=1000, config=cfg, **kw)

    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3),
                          jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1, :64, :64, :])
    variables = calibrate(model, variables, [x[:128]])
    variables = prepare_for_deployment_host(model, variables,
                                            example_shape=(1, 64, 64, 3))
    xb = x.astype(jnp.bfloat16)
    q_fn = jax.jit(lambda v, xx: model.apply(v, xx, mode="fixed",
                                             quant_w=False))
    fp32_fn = jax.jit(lambda v, xx: model.apply(v, xx, mode="fixed",
                                                quant_w=False, quant_a=False))
    return q_fn, fp32_fn, (variables, xb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[256, 1024])
    ap.add_argument("--variants", nargs="+",
                    default=["dwa", "dwxa", "nodw", "fp8"])
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    for batch in args.batches:
        for variant in args.variants:
            q_fn, fp32_fn, fargs = build(batch, variant)
            t_q, t_f = bench_pair(q_fn, fargs, fp32_fn, fargs)
            if args.trace:
                tdir = f"{args.trace}/{variant}_b{batch}"
                with jax.profiler.trace(tdir):
                    for _ in range(3):
                        out = q_fn(*fargs)
                    jax.block_until_ready(out)
                print(f"# trace -> {tdir}", flush=True)
            flops = MNV2_GFLOP * 1e9 * batch
            print(json.dumps({
                "variant": variant, "batch": batch,
                "q_ms": round(t_q * 1e3, 2), "fp32_ms": round(t_f * 1e3, 2),
                "img_s": round(batch / t_q, 1),
                "fp32_img_s": round(batch / t_f, 1),
                "vs_fp32": round(t_f / t_q, 4),
                "mfu": round(flops / t_q / V5E_BF16_PEAK, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
