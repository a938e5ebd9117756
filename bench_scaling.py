#!/usr/bin/env python
"""Data-parallel scaling measurement: images/sec at 1..N devices.

BASELINE.md's scaling axis (1 chip / 1 host / >=2 hosts).  On a multi-chip
TPU slice this measures real ICI scaling; with a single chip it degenerates
to one point; pass --cpu to demonstrate the SPMD path on 8 virtual devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8).

Prints one JSON line per device count:
  {"devices": D, "images_per_sec": N, "scaling_efficiency": E}
"""

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true",
                    help="force 8 virtual CPU devices")
    ap.add_argument("--batch-per-device", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--arch", default="resnet18_quantized")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/fp8tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.models import QUANT_ARCHITECTURES
    from fp8_quantization_tpu.nn.config import make_layer_config
    from fp8_quantization_tpu.parallel import (
        make_mesh, replicate_variables, shard_batch)

    config = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_mantissa_bits=4,
        fp8_set_maxval=True, weight_range_method="current_minmax",
        act_range_method="allminmax", engine="bf16")
    model = QUANT_ARCHITECTURES[args.arch](config)

    size = args.image_size if not args.cpu else 64
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.normal(0, 1, (args.batch_per_device, size, size, 3)),
                     jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1)
    variables = calibrate(model, variables, [x1])

    n_dev = len(jax.devices())
    counts = sorted({d for d in (1, 2, 4, 8, n_dev) if 1 <= d <= n_dev})
    base_ips = None
    for d in counts:
        mesh = make_mesh(data=d, model=1, devices=jax.devices()[:d])
        v = replicate_variables(mesh, variables)
        batch = args.batch_per_device * d
        xg = shard_batch(mesh, jnp.asarray(
            rng.normal(0, 1, (batch, size, size, 3)), jnp.float32))

        fn = jax.jit(lambda vv, xx: model.apply(vv, xx, mode="fixed"))
        for _ in range(3):
            out = fn(v, xg)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(v, xg)
        jax.block_until_ready(out)
        ips = batch * args.iters / (time.perf_counter() - t0)
        base_ips = base_ips or ips
        print(json.dumps({
            "devices": d,
            "images_per_sec": round(ips, 1),
            "scaling_efficiency": round(ips / (base_ips * d), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
