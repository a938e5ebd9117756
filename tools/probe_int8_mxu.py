#!/usr/bin/env python
"""Probe the v5e's int8 MXU datapath (VERDICT r1 item 2 groundwork).

The v5e datasheet rates int8 at ~394 TOP/s — 2x the bf16 peak.  This probe
measures what each compilation path actually delivers for a 4096^3 matmul:

  * XLA `jnp.dot(int8, int8, preferred_element_type=int32)`
  * a Pallas/Mosaic kernel doing the same blocked dot
  * the XLA bf16 matmul as the reference point

Same-buffer pipelined timing (the only methodology that tracks full-model
numbers through the axon dev tunnel — see PROGRESS notes); absolute numbers
carry tunnel noise, RATIOS are the signal.

Usage: python tools/probe_int8_mxu.py [--dim 4096] [--block 512]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fp8tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mm_kernel(x_ref, w_ref, o_ref, acc_ref, *, k_steps):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:]


def pallas_mm_int8(x, w, bm, bk, bn):
    m, k = x.shape
    _, n = w.shape
    k_steps = k // bk
    return pl.pallas_call(
        functools.partial(mm_kernel, k_steps=k_steps),
        grid=(m // bm, n // bn, k_steps),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
                  pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w)


def timeit(fn, *args, iters=20, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args()
    d, b = args.dim, args.block

    key = jax.random.PRNGKey(0)
    a8 = jax.random.randint(key, (d, d), -127, 127, jnp.int8)
    b8 = jax.random.randint(jax.random.fold_in(key, 1), (d, d), -127, 127,
                            jnp.int8)
    fl = 2 * d ** 3

    rows = []
    t = timeit(jax.jit(lambda a, w: jnp.dot(
        a, w, preferred_element_type=jnp.int32)), a8, b8)
    rows.append(("xla_int8", t))
    try:
        t = timeit(jax.jit(functools.partial(pallas_mm_int8,
                                             bm=b, bk=2 * b, bn=b)), a8, b8)
        rows.append(("pallas_int8", t))
    except Exception as exc:
        print(f"pallas int8 failed: {type(exc).__name__}: {exc}")
    abf, bbf = a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16)
    t = timeit(jax.jit(lambda a, w: jnp.dot(
        a, w, preferred_element_type=jnp.float32)), abf, bbf)
    rows.append(("xla_bf16", t))

    base = dict(rows).get("xla_bf16")
    for name, t in rows:
        print(f"{name:12s} {t*1e3:8.3f} ms  {fl/t/1e12:7.1f} T(op|f)/s"
              f"   {base/t:5.2f}x bf16")


if __name__ == "__main__":
    main()
