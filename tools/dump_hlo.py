#!/usr/bin/env python
"""Dump the TPU-optimized HLO of the bench forward paths for fusion forensics.

Writes <out>/<variant>.txt with the optimized HLO module and prints a
per-opcode summary (count, top fusion kinds) so we can see whether the
activation-quant chains fuse into the conv epilogues or stand alone.
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fp8tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hlo")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--arch", default="resnet18")
    args = ap.parse_args()

    import os
    os.makedirs(args.out, exist_ok=True)

    from bench_profile import build

    import fp8_quantization_tpu.ops.pallas.autotune as at
    at.MODE = "never"

    DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "s8": 1, "u8": 1,
                   "pred": 1, "f8e3m4": 1, "f8e4m3": 1, "f8e5m2": 1, "u32": 4}

    for name, engine, conv_bf16, quant_a, cast in [
        ("fp32_bf16ops", "bf16", False, False, False),
        ("fp8_cast", "bf16", False, True, True),
        ("fp8_cast_convbf16", "bf16", True, True, True),
    ]:
        model, variables, x = build(engine, conv_bf16, args.batch, cast,
                                    args.arch)
        fn = jax.jit(lambda v, xx: model.apply(
            v, xx, mode="fixed", quant_w=False, quant_a=quant_a))
        txt = fn.lower(variables, x).compile().as_text()
        path = f"{args.out}/{name}.txt"
        with open(path, "w") as f:
            f.write(txt)

        ops = collections.Counter()
        fusion_kinds = collections.Counter()
        write_bytes = collections.Counter()   # result bytes per opcode
        big = []
        for line in txt.splitlines():
            m = re.search(r"=\s+(\w+)\[([\d,]*)\][^ ]*\s+(\w+)\(", line)
            if not m:
                continue
            dt, shape_s, op = m.groups()
            ops[op] += 1
            if op == "fusion":
                km = re.search(r'kind=(\w+)', line)
                fusion_kinds[km.group(1) if km else "?"] += 1
            if op in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast"):
                continue
            n = 1
            for d in shape_s.split(","):
                if d:
                    n *= int(d)
            nbytes = n * DTYPE_BYTES.get(dt, 4)
            write_bytes[op] += nbytes
            if nbytes >= 8 << 20:
                nm = re.search(r"%?([\w.-]+) =", line)
                big.append((nbytes, op, dt, shape_s,
                            nm.group(1) if nm else "?"))
        print(f"== {name} -> {path}")
        print("   top ops:", ops.most_common(12))
        print("   fusion kinds:", dict(fusion_kinds))
        print("   result-bytes by op (GB):",
              {k: round(v / 1e9, 2) for k, v in write_bytes.most_common(8)})
        big.sort(reverse=True)
        print(f"   tensors >=8MB: {len(big)}; top:")
        for nbytes, op, dt, shape_s, nm in big[:10]:
            print(f"     {nbytes/1e6:7.1f}MB {op:12s} {dt}[{shape_s}] {nm}")


if __name__ == "__main__":
    main()
