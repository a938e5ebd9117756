#!/usr/bin/env python
"""Is XLA's native int8 conv the right s8 datapath on this chip?

Compares, at ResNet-18 hot shapes:
  a) bf16 conv + relu (the unquantized baseline op)
  b) XLA int8 conv: quantize act to s8 (asym, shifted grid), conv
     s8 x s8 -> s32, dequant + relu epilogue (all XLA, fully fusable)
  c) the current pallas fused int8 conv kernel (probe-chosen group)

Usage: python tools/probe_int8_conv_shapes.py [--batch 512]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fp8tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def shapes(batch):
    return [(batch, 56, 64, 64), (batch, 28, 128, 128),
            (batch, 14, 256, 256), (batch, 7, 512, 512)]


def timeit(fn, xs, iters=6, reps=3):
    fn(xs[0]).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(xs[i % len(xs)])
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from fp8_quantization_tpu.ops.pallas.qconv import (FusedConvConfig,
                                                       fused_quant_conv3x3)
    from fp8_quantization_tpu.ops.pallas.qmatmul import int8_shifted_grid
    import fp8_quantization_tpu.ops.pallas.autotune as at

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    for (n, h, cin, cout) in shapes(args.batch):
        rng = np.random.RandomState(0)
        xs = [jnp.asarray(rng.normal(0, 1, (n, h, h, cin)), jnp.float32)
              for _ in range(2)]
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), jnp.float32)
        w_delta = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
        a_delta, a_zp = 8.0 / 255.0, 128.0
        w_s8 = jnp.clip(jnp.round(w / w_delta), -128, 127).astype(jnp.int8)
        w_bf = (w_s8.astype(jnp.float32) * w_delta).astype(jnp.bfloat16)

        @jax.jit
        def bf16_conv(x):
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w_bf, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jax.nn.relu(y)

        @jax.jit
        def xla_int8(x):
            # asym act quant on the shifted grid: xq in [0,255] stored s8
            # as xq-128 in [-128,127]; conv in s8; zero-point row correction
            xq = jnp.clip(jnp.round(x / a_delta) + a_zp, 0, 255)
            xs8 = (xq - 128.0).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xs8, w_s8, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            # correction for the +*(128 - zp) shift folded into xs8:
            # x = a_delta*(xq - zp) = a_delta*((xs8+128) - zp)
            ones = jnp.ones((n, h, h, cin), jnp.int8)
            ksum = jax.lax.conv_general_dilated(
                ones, w_s8, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32)
                 + (128.0 - a_zp) * ksum.astype(jnp.float32))
            y = y * (a_delta * w_delta)
            return jax.nn.relu(y)

        @jax.jit
        def xla_int8_precomp(x):
            # ksum precomputed (weights static at deploy): single conv
            xq = jnp.clip(jnp.round(x / a_delta) + a_zp, 0, 255)
            xs8 = (xq - 128.0).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xs8, w_s8, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (a_delta * w_delta)
            return jax.nn.relu(y)

        t_bf = timeit(bf16_conv, xs)
        t_x8 = timeit(xla_int8, xs)
        t_x8p = timeit(xla_int8_precomp, xs)

        # pallas kernel at its probed group
        g = at.conv3_int8_group(n, h, cin, cout,
                                max(1, 6144 // (h * h)), prequant=True)
        t_pal = float("nan")
        if g:
            cfg = FusedConvConfig(act_method="int_asym", activation="relu",
                                  mxu_dtype="int8", imgs_per_block=g,
                                  w_prequant=True)
            ascal = jnp.asarray([a_delta, a_zp, 0.0], jnp.float32)
            sc = jnp.ones((cout,), jnp.float32)
            sh = jnp.zeros((cout,), jnp.float32)
            wq8 = int8_shifted_grid(w, w_delta, 1.0, 8).astype(jnp.int8)

            @jax.jit
            def pallas_int8(x):
                return fused_quant_conv3x3(
                    x, wq8, ascal, sc, sh, weight_channel_param=w_delta,
                    weight_scalars=jnp.asarray([0.0, 1.0], jnp.float32),
                    cfg=cfg)

            t_pal = timeit(pallas_int8, xs)

        gflop = 18 * n * h * h * cin * cout / 1e9
        fmt = lambda t: f"{t*1e3:7.2f}ms {gflop/t/1e3:6.1f}TF/s"
        print(f"({n},{h}x{h},{cin}->{cout}) bf16 {fmt(t_bf)} | "
              f"xla_s8 {fmt(t_x8)} | xla_s8_pre {fmt(t_x8p)} | "
              f"pallas_s8(g={g}) {fmt(t_pal) if g else 'n/a'}")


if __name__ == "__main__":
    main()
