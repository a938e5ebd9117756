#!/usr/bin/env python
"""Compile-only HLO dumps against an AOT v5e topology (no chip needed).

Same per-variant byte forensics as tools/dump_hlo.py, but the model is
calibrated/prepared on the CPU backend and then AOT-compiled for a real TPU
target via jax.experimental.topologies — usable when the device tunnel is
down, and it produces the actual v5e executable schedule.  Feed the dumps to
tools/hlo_entry_bytes.py for the per-layer diff.

Usage: python tools/aot_dump_hlo.py [--arch mobilenet_v2] [--batch 256]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")          # never touch the tunnel
jax.config.update("jax_compilation_cache_dir", "/tmp/fp8tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hlo_aot")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--arch", default="mobilenet_v2")
    ap.add_argument("--topo", default="v5e:2x2",
                    help="AOT topology; only device 0 is used")
    ap.add_argument("--input-bf16", action="store_true",
                    help="bf16 serving input (match bench_profile runs)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bench_profile import build
    import fp8_quantization_tpu.ops.pallas.autotune as at

    at.MODE = "never"

    topo = topologies.get_topology_desc(args.topo, "tpu")
    mesh = Mesh(np.array(topo.devices).reshape(-1)[:1], ("d",))
    rep = NamedSharding(mesh, P())

    def shapes(tree):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
            tree)

    for name, engine, conv_bf16, quant_a, cast, act_f8, s2d in [
        ("fp32_bf16ops", "bf16", False, False, False, False, False),
        ("fp8_cast_convbf16", "bf16", True, True, True, False, False),
        ("fp8_cast_convbf16_actf8", "bf16", True, True, True, True, False),
        # the b1024 bench headline (ResNet only): pre-s2d serving input
        ("fp8_cast_convbf16_s2dinput", "bf16", True, True, True, False,
         "input"),
        ("fp32_s2dinput", "bf16", False, False, False, False, "input"),
    ]:
        if s2d and "resnet" not in args.arch:
            continue
        model, variables, x = build(engine, conv_bf16, args.batch, cast,
                                    args.arch, act_f8, stem_s2d=s2d)
        if s2d == "input":
            from fp8_quantization_tpu.ops.s2d import space_to_depth
            x = jax.jit(space_to_depth)(x)
        if args.input_bf16:
            x = x.astype(jnp.bfloat16)   # match bench_profile --input-bf16
        fn = jax.jit(lambda v, xx: model.apply(
            v, xx, mode="fixed", quant_w=False, quant_a=quant_a),
            in_shardings=(rep, rep), out_shardings=rep)
        txt = fn.lower(shapes(variables), shapes(x)).compile().as_text()
        path = f"{args.out}/{args.arch}_{name}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"dumped {path} ({len(txt.splitlines())} lines)", flush=True)


if __name__ == "__main__":
    main()
