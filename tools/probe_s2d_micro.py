#!/usr/bin/env python
"""Micro-probe: stem conv 7x7/s2 vs space-to-depth variants (one chip).

Times just the stem region (conv + relu + fp8-cast quant epilogue) for:
  a) conv7x7/s2 on (N,224,224,3) bf16        — the deployed baseline
  b) in-graph s2d transform + conv4x4/s1     — what --stem-s2d measures
  c) conv4x4/s1 on pre-s2d (N,112,112,12)    — s2d as the serving format
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fp8tpu_jax_cache")

import jax.numpy as jnp

from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8
from fp8_quantization_tpu.ops.s2d import s2d_stem_kernel, space_to_depth

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=512)
args = ap.parse_args()

N = args.batch
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (N, 224, 224, 3), jnp.float32).astype(jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, 64),
                      jnp.float32) * 0.1
w_bf = w.astype(jnp.bfloat16)
w2, s2, p2 = s2d_stem_kernel(w_bf)
x_s2d = space_to_depth(x)


def _epi(y):
    return quantize_to_fp8(jax.nn.relu(y), jnp.asarray(6.0), 4.0)


@jax.jit
def conv7(x):
    y = jax.lax.conv_general_dilated(
        x, w_bf, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return _epi(y)


@jax.jit
def conv_s2d_ingraph(x):
    y = jax.lax.conv_general_dilated(
        space_to_depth(x), w2, s2, p2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return _epi(y)


@jax.jit
def conv_s2d_input(xs):
    y = jax.lax.conv_general_dilated(
        xs, w2, s2, p2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return _epi(y)


def bench(fn, arg, iters=20, reps=3):
    fn(arg).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(arg)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


# numerics check ON device (a full output download over the ~2 MB/s dev
# tunnel is GBs -> minutes); only the scalar max-abs-diff comes back
ref = conv7(x)
for name, fn, arg in (("conv7x7s2", conv7, x),
                      ("s2d_ingraph", conv_s2d_ingraph, x),
                      ("s2d_input", conv_s2d_input, x_s2d)):
    err = float(jax.jit(
        lambda a: jnp.max(jnp.abs(fn(a).astype(jnp.float32)
                                  - ref.astype(jnp.float32))))(arg))
    t = bench(fn, arg)
    print(f"{name:14s} {t * 1e3:7.3f} ms   max|d|={err:.2e}", flush=True)
