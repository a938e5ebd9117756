#!/usr/bin/env python
"""Measure and export the committed autotune seed cache (VERDICT r4 item 3).

Traces every pallas-engine deployment forward the repo's models take at
the bench/test operating points, which fires each autotune gate
(ops/pallas/autotune.py) exactly where a user's run would: the races
execute on the attached TPU, verdicts land in the live /tmp cache, and
``export_seed()`` copies them to
``fp8_quantization_tpu/ops/pallas/autotune_seed/v5_<device_kind>.json``
for committing.  A fresh checkout then gets measurement-backed gate
decisions (same format, loaded at lower priority than live measurements)
instead of re-racing on chip or falling back to heuristics.

Usage: python tools/harvest_autotune_seed.py [--batches 128 1024]
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

T0 = time.perf_counter()


def mark(msg):
    print(f"[harvest +{time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def trace_model(arch, batch, qscheme="fp8"):
    """Build the pallas-engine deployed model and TRACE its jitted step —
    tracing fires the gates (the probes measure on-device from a worker
    thread, ops/pallas/autotune._off_trace); no full-model compile needed."""
    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.models import (mobilenetv2_quantized,
                                             resnet18_quantized,
                                             vit_small_quantized)
    from fp8_quantization_tpu.nn.config import make_layer_config

    if qscheme == "fp8":
        cfg = make_layer_config(
            qmethod="fp_quantizer", per_channel_weights=True,
            fp8_mantissa_bits=4, fp8_set_maxval=True,
            weight_range_method="current_minmax",
            act_range_method="allminmax", engine="pallas",
            deploy_cast_quant=True, conv_out_bf16=True)
    else:
        cfg = make_layer_config(
            qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
            per_channel_weights=True, quantize_input=True,
            weight_range_method="current_minmax",
            act_range_method="allminmax", engine="pallas",
            int8_mxu=True, conv_out_bf16=True, int8_assume_signed=True)
    ctor = {"resnet18": resnet18_quantized,
            "mobilenet_v2": mobilenetv2_quantized,
            "vit_small": vit_small_quantized}[arch]
    model = ctor(cfg, num_classes=1000)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3),
                          jnp.float32)
    ex = x[:1] if arch == "vit_small" else x[:1, :64, :64, :]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ex)
    variables = calibrate(model, variables, [x[:64]])
    if qscheme == "int8":
        from fp8_quantization_tpu.nn.bake import bake_int8_weights_host
        variables = bake_int8_weights_host(model, variables,
                                           example_shape=(1, 224, 224, 3)
                                           if arch == "vit_small"
                                           else (1, 64, 64, 3))
        quant_w = True
    else:
        from fp8_quantization_tpu.nn.bake import prepare_for_deployment_host
        variables = prepare_for_deployment_host(
            model, variables,
            example_shape=(1, 224, 224, 3) if arch == "vit_small"
            else (1, 64, 64, 3))
        quant_w = False
    xb = x.astype(jnp.bfloat16)
    fn = jax.jit(lambda v, xx: model.apply(v, xx, mode="fixed",
                                           quant_w=quant_w))
    fn.lower(jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables),
        jax.ShapeDtypeStruct(xb.shape, xb.dtype))
    mark(f"{arch} b{batch} {qscheme}: traced (gates resolved)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[128, 1024])
    ap.add_argument("--archs", nargs="+",
                    default=["resnet18", "mobilenet_v2", "vit_small"])
    args = ap.parse_args()

    from fp8_quantization_tpu.ops.pallas import autotune as at

    for arch in args.archs:
        batches = [128] if arch == "vit_small" else args.batches
        for batch in batches:   # ViT operates at 128 (S*B logits explode)
            try:
                trace_model(arch, batch, "fp8")
            except Exception as e:   # noqa: BLE001 — one OOM'ing probe
                # must not discard the verdicts already raced into /tmp
                mark(f"{arch} b{batch}: trace failed ({type(e).__name__}); "
                     f"verdicts measured so far are kept")
    dst = at.export_seed()
    with open(dst) as f:
        n = len(json.load(f))
    print(json.dumps({"seed": dst, "entries": n,
                      "decisions": len(at.decisions())}))


if __name__ == "__main__":
    main()
