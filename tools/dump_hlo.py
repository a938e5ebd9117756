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
    args = ap.parse_args()

    import os
    os.makedirs(args.out, exist_ok=True)

    from bench_profile import build

    import fp8_quantization_tpu.ops.pallas.autotune as at
    at.MODE = "never"

    for name, engine, conv_bf16, quant_a in [
        ("fp32_bf16ops", "bf16", False, False),
        ("fp8_factored", "bf16", False, True),
    ]:
        model, variables, x = build(engine, conv_bf16, args.batch)
        fn = jax.jit(lambda v, xx: model.apply(
            v, xx, mode="fixed", quant_w=False, quant_a=quant_a))
        txt = fn.lower(variables, x).compile().as_text()
        path = f"{args.out}/{name}.txt"
        with open(path, "w") as f:
            f.write(txt)

        ops = collections.Counter()
        fusion_kinds = collections.Counter()
        for line in txt.splitlines():
            m = re.search(r"=\s+\S+\s+(\w+)\(", line)
            if not m:
                continue
            op = m.group(1)
            ops[op] += 1
            if op == "fusion":
                km = re.search(r'kind=(\w+)', line)
                fusion_kinds[km.group(1) if km else "?"] += 1
        print(f"== {name} -> {path}")
        print("   top ops:", ops.most_common(12))
        print("   fusion kinds:", dict(fusion_kinds))


if __name__ == "__main__":
    main()
