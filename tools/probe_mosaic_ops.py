#!/usr/bin/env python
"""Probe Mosaic (Pallas-TPU) support for the ops the fused inverted-residual
kernel needs: 3D dot_general, sublane-offset slices, strided slices along
each axis, concat-padding, and f32->bf16 roundtrips inside a kernel.

Each probe compiles + runs a tiny kernel on the attached TPU and checks the
result against numpy.  Prints OK / FAIL per op so the kernel design can pick
primitives Mosaic actually lowers (tools notes -> ops/pallas/fused_ir.py).

Usage: python tools/probe_mosaic_ops.py
"""

import functools
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fp8tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


H, W, C = 16, 18, 128
TC = 128


def run(name, kernel, out_shape, ref_fn, *arrays):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*arrays)
        ref = ref_fn(*[np.asarray(a, np.float32) for a in arrays])
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=1e-3)
        print(f"{name:34s} OK")
        return True
    except Exception as exc:
        msg = str(exc).split("\n")[0][:120]
        print(f"{name:34s} FAIL {type(exc).__name__}: {msg}")
        return False


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 1, (H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (C, TC)), jnp.float32)

    # 1. 3D dot_general (H, W, C) x (C, TC) -> (H, W, TC)
    def k_dot3(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    run("dot_general_3d", k_dot3, (H, W, TC),
        lambda a, b: np.einsum("hwc,ck->hwk", a, b), x, w)

    # 1b. reshape-collapse then 2D dot
    def k_dot2(x_ref, w_ref, o_ref):
        x2 = x_ref[:].reshape(H * W, C)
        o_ref[:] = jnp.dot(x2, w_ref[:], preferred_element_type=jnp.float32)
    run("reshape_collapse_dot2d", k_dot2, (H * W, TC),
        lambda a, b: a.reshape(H * W, C) @ b, x, w)

    # 2. sublane-offset slice (dx=1 of a 3x3 stencil)
    def k_subslice(x_ref, o_ref):
        o_ref[:] = x_ref[:, 1:W - 1, :]
    run("sublane_offset_slice", k_subslice, (H, W - 2, C),
        lambda a: a[:, 1:W - 1, :], x)

    # 3. strided slice along leading (row) axis
    def k_rowstride(x_ref, o_ref):
        o_ref[:] = jax.lax.slice(x_ref[:], (0, 0, 0), (H, W, C), (2, 1, 1))
    run("strided_slice_rows", k_rowstride, (H // 2, W, C),
        lambda a: a[::2], x)

    # 4. strided slice along sublane (col) axis
    def k_colstride(x_ref, o_ref):
        o_ref[:] = jax.lax.slice(x_ref[:], (0, 0, 0), (H, W, C), (1, 2, 1))
    run("strided_slice_cols", k_colstride, (H, W // 2, C),
        lambda a: a[:, ::2], x)

    # 5. reshape-split of the row axis (even/odd planes)
    def k_rowsplit(x_ref, o_ref):
        r = x_ref[:].reshape(H // 2, 2, W, C)
        o_ref[:] = r[:, 0, :, :]
    run("reshape_split_rows_even", k_rowsplit, (H // 2, W, C),
        lambda a: a.reshape(H // 2, 2, W, C)[:, 0], x)

    # 6. reshape-split of the sublane axis
    def k_colsplit(x_ref, o_ref):
        r = x_ref[:].reshape(H, W // 2, 2, C)
        o_ref[:] = r[:, :, 0, :]
    run("reshape_split_cols_even", k_colsplit, (H, W // 2, C),
        lambda a: a.reshape(H, W // 2, 2, C)[:, :, 0], x)

    # 7. concat zero-padding along rows + cols
    def k_pad(x_ref, o_ref):
        xx = x_ref[:]
        zr = jnp.zeros((1, W, C), jnp.float32)
        xx = jnp.concatenate([zr, xx, zr], axis=0)
        zc = jnp.zeros((H + 2, 1, C), jnp.float32)
        o_ref[:] = jnp.concatenate([zc, xx, zc], axis=1)
    run("concat_zero_pad_rows_cols", k_pad, (H + 2, W + 2, C),
        lambda a: np.pad(a, ((1, 1), (1, 1), (0, 0))), x)

    # 7b. jnp.pad directly
    def k_jnppad(x_ref, o_ref):
        o_ref[:] = jnp.pad(x_ref[:], ((1, 1), (1, 1), (0, 0)))
    run("jnp_pad_rows_cols", k_jnppad, (H + 2, W + 2, C),
        lambda a: np.pad(a, ((1, 1), (1, 1), (0, 0))), x)

    # 8. 9-tap depthwise stencil (stride 1) from shifted slices
    dwk = jnp.asarray(rng.normal(0, 1, (3, 3, C)), jnp.float32)

    def k_dw(x_ref, k_ref, o_ref):
        xx = jnp.pad(x_ref[:], ((1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((H, W, C), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + xx[dy:dy + H, dx:dx + W, :] * k_ref[dy, dx, :]
        o_ref[:] = acc

    def ref_dw(a, k):
        ap = np.pad(a, ((1, 1), (1, 1), (0, 0)))
        acc = np.zeros((H, W, C), np.float32)
        for dy in range(3):
            for dx in range(3):
                acc += ap[dy:dy + H, dx:dx + W, :] * k[dy, dx, :]
        return acc
    run("dw3x3_stride1_9tap", k_dw, (H, W, C), ref_dw, x, dwk)

    # 9. bf16 roundtrip of grid values inside the kernel
    def k_bf16(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.bfloat16).astype(jnp.float32)
    run("bf16_roundtrip", k_bf16, (H, W, C),
        lambda a: np.asarray(jnp.asarray(a).astype(jnp.bfloat16), np.float32),
        x)

    # 10. f8e3m4 cast roundtrip inside the kernel (store_f8 parity in-kernel)
    def k_f8(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.float8_e3m4).astype(jnp.float32)
    run("f8e3m4_roundtrip", k_f8, (H, W, C),
        lambda a: np.asarray(jnp.asarray(a).astype(jnp.float8_e3m4),
                             np.float32), x)


if __name__ == "__main__":
    main()
