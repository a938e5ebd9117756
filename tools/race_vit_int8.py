#!/usr/bin/env python
"""Race the producer-side s8 interchange (nn/factored.PrequantS8) on ViT.

VERDICT r4 item 1: the round-4 trace proved int8's dot-fusion time on
ViT-S/16 is 11.8 ms vs fp8's 20.1 at batch 128, and that the consumer-side
quantize_input interchange eats the win (14.1 ms of standalone quant
prologues + 6.8 ms of s8 layout reshapes).  The PrequantS8 protocol
(shipped end of round 4, CPU-bit-exact via tests/test_int8_interchange.py)
moves every prologue into its producer's epilogue fusion and exchanges
1-byte s8 operands.  This script races it on the real chip:

  fp32   unquantized bf16-ops forward (the ratio denominator)
  fp8    deployed fp8 (prepare_for_deployment, the current bench row)
  i8x    int8 XLA s8 datapath WITH the producer-side interchange
  i8c    same variables, interchange forced OFF (the consumer-side graph
         round 4 measured at 36.5 ms) — isolates the protocol's win

Each quantized variant is timed INTERLEAVED with its own fp32 windows
(the dev-tunnel chip drifts ~2x across minutes).  Reference grid
semantics: s8 grids per
/root/reference/quantization/quantizers/uniform_quantizers.py:259-331.
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

VIT_GFLOP = 9.2  # fwd, 224px, MACs x2 (tools/roofline.py audit)
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


def build(batch, scheme):
    """Returns (apply_fn, args) for one deployed variant at this batch."""
    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.models import vit_small_quantized
    from fp8_quantization_tpu.nn.config import make_layer_config

    if scheme.startswith("fp8"):
        cfg = make_layer_config(
            qmethod="fp_quantizer", per_channel_weights=True,
            fp8_mantissa_bits=4, fp8_set_maxval=True,
            weight_range_method="current_minmax",
            act_range_method="allminmax",
            # 'fp8pl': pallas engine (flash attention where its gate wins)
            engine="pallas" if scheme == "fp8pl" else "bf16",
            deploy_cast_quant=True, conv_out_bf16=True,
            # 'fp8f8': IEEE-f8 interchange storage — res-chain bytes halve
            deploy_act_f8=scheme == "fp8f8",
            # 'fp8ie': ieee-subnorm cast (no fixup select in the quant
            # epilogues; round-4 MNv2 forensics)
            deploy_cast_ieee=scheme == "fp8ie")
    else:  # int8 s8 datapath (bench.py resnet18 int8 row's config)
        cfg = make_layer_config(
            qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
            per_channel_weights=True, quantize_input=True,
            weight_range_method="current_minmax",
            act_range_method="allminmax", engine="bf16",
            int8_mxu=True, conv_out_bf16=True, int8_assume_signed=True)

    model = vit_small_quantized(cfg, num_classes=1000)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3),
                          jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    variables = calibrate(model, variables, [x[:128]])
    if scheme == "fp8":
        from fp8_quantization_tpu.nn.bake import prepare_for_deployment_host
        variables = prepare_for_deployment_host(
            model, variables, example_shape=(1, 224, 224, 3))
        quant_w = False
    else:
        from fp8_quantization_tpu.nn.bake import bake_int8_weights_host
        variables = bake_int8_weights_host(model, variables,
                                           example_shape=(1, 224, 224, 3))
        quant_w = True
    xb = x.astype(jnp.bfloat16)

    q_fn = jax.jit(lambda v, xx: model.apply(v, xx, mode="fixed",
                                             quant_w=quant_w))
    fp32_fn = jax.jit(lambda v, xx: model.apply(v, xx, mode="fixed",
                                                quant_w=False, quant_a=False))
    return q_fn, fp32_fn, (variables, xb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[128, 256, 512])
    ap.add_argument("--schemes", nargs="+",
                    default=["i8x", "i8c", "fp8"])
    ap.add_argument("--trace", default=None,
                    help="capture a 3-iter jax.profiler trace of each "
                         "quantized variant under DIR/<scheme>_b<batch> "
                         "(feed to tools/trace_top_ops.py)")
    args = ap.parse_args()

    from fp8_quantization_tpu.models import vit as vit_mod

    for batch in args.batches:
        for scheme in args.schemes:
            if scheme == "i8c":
                # consumer-side graph: force the interchange off
                orig = vit_mod._i8_fast
                vit_mod._i8_fast = lambda *a, **k: False
            try:
                q_fn, fp32_fn, fargs = build(
                    batch, scheme if scheme.startswith("fp8") else "int8")
                t_q, t_f = bench_pair(q_fn, fargs, fp32_fn, fargs)
                if args.trace:
                    tdir = f"{args.trace}/{scheme}_b{batch}"
                    with jax.profiler.trace(tdir):
                        for _ in range(3):
                            out = q_fn(*fargs)
                        jax.block_until_ready(out)
                    with jax.profiler.trace(f"{args.trace}/fp32_b{batch}"):
                        for _ in range(3):
                            out = fp32_fn(*fargs)
                        jax.block_until_ready(out)
                    print(f"# trace -> {tdir} (+fp32)", flush=True)
            finally:
                if scheme == "i8c":
                    vit_mod._i8_fast = orig
            flops = VIT_GFLOP * 1e9 * batch
            print(json.dumps({
                "scheme": scheme, "batch": batch,
                "q_ms": round(t_q * 1e3, 2), "fp32_ms": round(t_f * 1e3, 2),
                "img_s": round(batch / t_q, 1),
                "fp32_img_s": round(batch / t_f, 1),
                "vs_fp32": round(t_f / t_q, 4),
                "mfu": round(flops / t_q / V5E_BF16_PEAK, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
