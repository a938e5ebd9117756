#!/usr/bin/env python
"""Which epilogue ops break XLA-TPU's conv-into-conv operand fusion?

MobileNetV2 HLO forensics (tools/hlo_entry_bytes.py, RESULTS.md) showed the
fp32 path nests the 1x1 expand conv INSIDE the strided depthwise conv's
fusion (the 6x-expanded tensor never leaves VMEM), while the fp8 quant chain
between them forces a full-resolution materialization (616 MB at block1_0,
batch 256).  This probe compiles expand -> [epilogue variant] -> depthwise
pairs and reports whether the big intermediate appears in the ENTRY schedule.

Usage: python tools/probe_dw_fusion.py [--spatial 56] [--cin 16] [--hidden 96]
"""

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fp8tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def entry_big_tensors(hlo_txt, nelems, skip_param=True):
    """Bytes of ENTRY-materialized results with >= nelems elements."""
    lines = hlo_txt.splitlines()
    i = next(i for i, l in enumerate(lines) if l.startswith("ENTRY"))
    depth, out = 0, []
    dtb = {"f32": 4, "bf16": 2, "f8e3m4": 1, "f8e4m3": 1, "f8e5m2": 1}
    for ln in lines[i:]:
        depth += ln.count("{") - ln.count("}")
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = ([a-z0-9]+)\[([\d,]*)\][^ ]* (\w+)\(",
                     ln)
        if m:
            dt, dims, op = m.groups()
            if skip_param and op in ("parameter", "get-tuple-element",
                                     "tuple", "bitcast", "copy-start",
                                     "copy-done", "copy", "constant"):
                pass
            else:
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                if n >= nelems:
                    out.append((n * dtb.get(dt, 4), op, f"{dt}[{dims}]"))
        if depth <= 0 and len(lines[i:]) > 1 and ln is not lines[i]:
            break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--spatial", type=int, default=112)
    ap.add_argument("--cin", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=96)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--reduce", action="store_true",
                    help="scalar ROOT: exclude the dw output from the big-tensor scan")
    args = ap.parse_args()
    N, H, CI, CH = args.batch, args.spatial, args.cin, args.hidden

    x = jax.ShapeDtypeStruct((N, H, H, CI), jnp.bfloat16)
    w1 = jax.ShapeDtypeStruct((1, 1, CI, CH), jnp.bfloat16)
    d = jax.ShapeDtypeStruct((3, 3, 1, CH), jnp.bfloat16)
    scale = jax.ShapeDtypeStruct((CH,), jnp.float32)
    f8 = jnp.float8_e3m4
    fi = jnp.finfo(f8)
    MAGIC = 1.5 * 2.0 ** 23 * float(fi.smallest_normal) * 2.0 ** -5

    def expand(xx, ww, s):
        y = jax.lax.conv_general_dilated(
            xx, ww, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.clip(y * s + 1.0, 0.0, 6.0)      # folded BN + relu6

    def dw(e, dd):
        return jax.lax.conv_general_dilated(
            e.astype(jnp.bfloat16), dd,
            (args.stride, args.stride), ((1, 1), (1, 1)),
            feature_group_count=CH,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def epi_none(y):
        return y

    def epi_cast_full(y):
        yy = jnp.clip(y * (1.0 / 0.123), -float(fi.max), float(fi.max))
        qc = yy.astype(f8).astype(jnp.float32)
        qb = (yy + MAGIC) - MAGIC
        return jnp.where(jnp.abs(yy) < float(fi.smallest_normal), qb, qc)

    def epi_cast_only(y):
        yy = jnp.clip(y * (1.0 / 0.123), -float(fi.max), float(fi.max))
        return yy.astype(f8).astype(jnp.float32)

    def epi_magic_only(y):
        yy = y * (1.0 / 0.123)
        return (yy + MAGIC) - MAGIC

    def epi_select_only(y):
        yy = y * (1.0 / 0.123)
        return jnp.where(jnp.abs(yy) < 1.0, yy * 0.5, yy)

    def epi_mul_only(y):
        return y * (1.0 / 0.123)

    variants = {
        "relu6_only": (epi_none, jnp.bfloat16),
        "mul": (epi_mul_only, jnp.bfloat16),
        "magic_round": (epi_magic_only, jnp.bfloat16),
        "select": (epi_select_only, jnp.bfloat16),
        "cast_f8_roundtrip": (epi_cast_only, jnp.bfloat16),
        "cast_full_quant": (epi_cast_full, jnp.bfloat16),
        "cast_full_quant_f8store": (epi_cast_only, f8),
    }

    big = N * H * H * CH // 2   # anything at the expanded size
    for name, (epi, store_dt) in variants.items():
        def f(xx, ww, dd, s, _epi=epi, _dt=store_dt):
            e = epi_none_store = _epi(expand(xx, ww, s)).astype(_dt)
            y = dw(e, dd)
            # --reduce: scalar ROOT so the dw output can't pose as a big
            # ENTRY tensor (at stride 1 it has the expanded shape too)
            return y.sum() if args.reduce else y
        try:
            txt = jax.jit(f).lower(x, w1, d, scale).compile().as_text()
        except Exception as exc:
            print(f"{name:26s} COMPILE FAIL: {type(exc).__name__}: {exc}")
            continue
        bigs = entry_big_tensors(txt, big)
        tot = sum(b for b, _, _ in bigs)
        flag = "MATERIALIZES" if any(
            op not in ("convolution",) and n >= N * H * H * CH
            for b, op, s_ in bigs
            for n in [b // {"f8e3m4[": 1}.get(s_[:7], 2 if s_.startswith("bf16") else 4)]
        ) else "fused       "
        # simpler: report the tensors
        print(f"{name:26s} big ENTRY tensors: "
              + (", ".join(f"{op} {s_} ({b/1e6:.0f}MB)" for b, op, s_ in bigs)
                 or "NONE (fully fused)"))


if __name__ == "__main__":
    main()
