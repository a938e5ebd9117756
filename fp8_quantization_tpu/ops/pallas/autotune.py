"""Measurement-based gating of the fused Pallas quant-matmul.

Round 1 gated the fused kernel behind a hand-tuned shape heuristic that lost
to XLA on MobileNetV2 end-to-end (VERDICT.md weak point 2).  This module
replaces guessing with a tiny per-shape autotune cache: the first time a
(M, K, N) quantized matmul is traced on a real TPU, both candidates — the
fused kernel (ops/pallas/qmatmul.py) and the composed XLA path the bf16
engine would run — are timed once on-device, the winner is recorded (and
persisted to a JSON cache so later processes skip the measurement), and
every decision is logged so users can see exactly which layers fused
(VERDICT.md weak point 6).

On CPU (tests, interpret mode) the kernel always "wins" so the fused code
path stays exercised by the suite; timing a CPU interpreter would be
meaningless.
"""

from __future__ import annotations

import concurrent.futures
import json
import logging
import os
import time
from typing import Dict, Tuple

logger = logging.getLogger(__name__)

# "auto": measure on TPU, always-on for CPU/interpret (tests).
# "always" / "never": force; "heuristic": round-1 shape rule (no measuring).
MODE = os.environ.get("FP8TPU_PALLAS_AUTOTUNE", "auto")

_CACHE: Dict[Tuple[int, int, int], bool] = {}
# v2: conv tags ('c', 'c2', 'ig*') hold the chosen group size (0 = XLA)
_CACHE_PATH = os.environ.get("FP8TPU_AUTOTUNE_CACHE")   # explicit override
# v3: kernels compile under an explicit 96 MiB scoped-VMEM limit (probes at
# 80 MiB) — v2 entries were measured under Mosaic's 16 MiB default and both
# the winning groups and the fused-vs-XLA verdicts can differ.
# v4: v3 "measurements" taken inside a model trace were all failure
# fallbacks (probe constants became ambient tracers); the probes now run
# entirely under ensure_compile_time_eval, so v3 verdicts are invalid.
# v5: races require a WIN_MARGIN.  Round-4 model-level evidence: marginal
# isolated-shape wins composed into a model LOSE (ResNet engine=pallas
# 29.5 ms vs 20.6 pure-XLA; MNv2 27.6 vs 11.9) because the isolated
# composed baseline is pessimistic — in-model, XLA fuses the quant chain
# into neighboring convs, so the true alternative is cheaper than the
# isolated one.  A fused kernel must now beat the isolated baseline by
# 25% to win its gate; v4 verdicts (no margin) are invalid.
_DISK_LOADED = False

# Required fused-over-composed speedup for a race win (see v5 note above).
WIN_MARGIN = 1.25


def _cache_path() -> str:
    """Per-device-kind cache file: verdicts measured on one TPU generation
    (VMEM budget, MXU rate, XLA conv tiling) must not be reused on another
    — the attached device's kind is part of the cache identity."""
    if _CACHE_PATH:
        return _CACHE_PATH
    import jax

    try:
        kind = jax.devices()[0].device_kind
    except RuntimeError:
        kind = "unknown"
    kind = "".join(c if c.isalnum() else "_" for c in kind)
    return f"/tmp/fp8tpu_autotune_v5_{kind}.json"


def decisions() -> Dict[Tuple[int, int, int], bool]:
    """The in-process decision log: {(M, K, N): fused?}."""
    return dict(_CACHE)


def _off_trace(fn, *args):
    """Run ``fn`` on a fresh thread and return its result.

    The gates fire while the USER'S model is being traced.  JAX trace
    contexts are thread-local, so a worker thread sees no ambient trace:
    the probe's arrays are concrete, its jits actually execute on the
    device, and timing is real.  (In-trace alternatives fail structurally:
    ensure_compile_time_eval inlines jits and eval-interprets primitive by
    primitive, and pallas_call has no eval rule — 'program_id not
    implemented'; without it, every probe constant becomes a tracer of the
    model trace and Mosaic rejects the kernels as 'captures constants'.)
    """
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
        return ex.submit(fn, *args).result()


def _heuristic(m: int, k: int, n: int) -> bool:
    """Round-1 rule: deep/narrow shapes fuse well; tall-skinny ones don't."""
    return m <= 32768 and k >= 256


def _seed_path() -> str:
    """Committed per-device-kind seed cache (VERDICT r3 item 5): measured
    v5e gate verdicts ship with the repo, so a fresh environment neither
    re-races (burning bench window) nor falls back to heuristics.  Same
    format/versioning as the /tmp cache; loaded at LOWER priority, so
    fresh measurements (written to /tmp) still win within a session."""
    import jax

    try:
        kind = jax.devices()[0].device_kind
    except RuntimeError:
        kind = "unknown"
    kind = "".join(c if c.isalnum() else "_" for c in kind)
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "autotune_seed", f"v5_{kind}.json")


def _load_file(path: str) -> None:
    try:
        with open(path) as f:
            for key, win in json.load(f).items():
                parts = key.split(":")
                dims = tuple(int(v) for v in parts[-1].split("x"))
                tag = parts[0] if len(parts) > 1 else ""
                # matmul entries (untagged) are bools; every tagged entry
                # ('c', 'd', 'ig', 'irb', 's', ...) holds a group int —
                # bool-decoding an int tag would collapse group 8 to 1
                val = int(win) if tag else bool(win)
                _CACHE.setdefault((tag,) + dims if tag else dims, val)
    except (OSError, ValueError):
        pass


def _load_disk_cache() -> None:
    global _DISK_LOADED
    _DISK_LOADED = True
    _load_file(_cache_path())    # this machine's measurements first
    _load_file(_seed_path())     # committed seed fills the gaps


def _save_disk_cache() -> None:
    try:
        data = {}
        for key, win in _CACHE.items():
            if isinstance(key[0], str):
                data[f"{key[0]}:" + "x".join(str(v) for v in key[1:])] = win
            else:
                data["x".join(str(v) for v in key)] = win
        path = _cache_path()
        tmp = f"{path}.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)
    except OSError:
        pass


def _measure(m: int, k: int, n: int) -> bool:
    """Time fused-vs-XLA once for this shape on the attached device.

    Representative config: per-channel FP8 weights + per-tensor FP8 output
    quant + relu epilogue (the zoo's hot configuration).  Inputs vary per
    iteration index to dodge the dev-tunnel's identical-buffer result cache
    (memory: tpu-tunnel-quirks).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8
    from fp8_quantization_tpu.ops.pallas.qmatmul import (
        FusedQuantMatmulConfig, fused_quant_matmul)

    rng = np.random.RandomState(m % 9973)
    xs = [jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32) for _ in range(2)]
    w = jnp.asarray(rng.normal(0, 0.05, (k, n)), jnp.float32)
    maxval_w = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.ones((n,), jnp.float32)
    shift = jnp.zeros((n,), jnp.float32)
    ws = jnp.asarray([4.0, 1.0], jnp.float32)
    ascal = jnp.asarray([6.0, 4.0, 1.0], jnp.float32)

    from fp8_quantization_tpu.ops.pallas.common import PROBE_VMEM_LIMIT_BYTES
    kcfg = FusedQuantMatmulConfig(weight_method="fp8", act_method="fp8",
                                  quantize_input=False, activation="relu",
                                  vmem_limit=PROBE_VMEM_LIMIT_BYTES)

    @jax.jit
    def fused(x):
        return fused_quant_matmul(x, w, maxval_w, ws, ascal, scale, shift,
                                  cfg=kcfg)

    wn = quantize_to_fp8(w, maxval_w.reshape(1, -1), 4.0, normalized=True)
    w_bf = wn.astype(jnp.bfloat16)
    w_fact = (maxval_w / (2.0 - 2.0 ** -4.0)).reshape(1, -1)

    @jax.jit
    def composed(x):
        y = jnp.dot(x.astype(jnp.bfloat16), w_bf,
                    preferred_element_type=jnp.float32)
        y = jax.nn.relu(y * w_fact)
        return quantize_to_fp8(y, jnp.asarray(6.0), 4.0)

    def _time(fn):
        fn(xs[0]).block_until_ready()            # compile + warm
        iters, reps = 4, 3
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(xs[i % len(xs)])
            out.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    try:
        t_fused = _time(fused)
        t_xla = _time(composed)
    except Exception as exc:  # measurement must never take the model down
        logger.warning("pallas autotune (%d,%d,%d) failed: %s", m, k, n, exc)
        return _heuristic(m, k, n)
    win = t_fused * WIN_MARGIN < t_xla
    logger.info("pallas autotune (%d,%d,%d): fused %.3fms vs xla %.3fms -> %s",
                m, k, n, t_fused * 1e3, t_xla * 1e3,
                "FUSED" if win else "XLA")
    return win


def pallas_wins(m: int, k: int, n: int) -> bool:
    """Should the fused kernel handle an (M, K) x (K, N) quantized matmul?

    Called at trace time with concrete (static) shapes.
    """
    if MODE == "always":
        return True
    if MODE == "never":
        return False
    if MODE == "heuristic":
        return _heuristic(m, k, n)

    from fp8_quantization_tpu.ops.pallas.common import on_cpu_backend
    if on_cpu_backend():
        return True   # interpret mode: keep the kernel path test-covered

    if not _DISK_LOADED:
        _load_disk_cache()
    key = (m, k, n)
    if key not in _CACHE:
        _CACHE[key] = _off_trace(_measure, m, k, n)
        _save_disk_cache()
    logger.info("pallas gate (%d,%d,%d) -> %s", m, k, n,
                "fused" if _CACHE[key] else "xla")
    return _CACHE[key]


def _conv3_fns(n: int, h: int, cin: int, cout: int, g: int,
               stride: int = 1):
    """(fused, composed, example inputs) for the bf16 conv-shape probe
    (deployment semantics: baked bf16 weights, epilogue scale/shift + relu
    + fp8 output quant)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8
    from fp8_quantization_tpu.ops.pallas.qconv import (
        FusedConvConfig, fused_quant_conv3x3)

    rng = np.random.RandomState(h * cin % 9973)
    xs = [jnp.asarray(rng.normal(0, 1, (n, h, h, cin)), jnp.float32)
          for _ in range(2)]
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), jnp.float32)
    w = w.astype(jnp.bfloat16).astype(jnp.float32)    # baked grid stand-in
    scale = jnp.ones((cout,), jnp.float32)
    shift = jnp.zeros((cout,), jnp.float32)
    ascal = jnp.asarray([6.0, 4.0, 1.0], jnp.float32)
    from fp8_quantization_tpu.ops.pallas.common import PROBE_VMEM_LIMIT_BYTES
    kcfg = FusedConvConfig(act_method="fp8", activation="relu",
                           emit_norm=False, imgs_per_block=g, stride=stride,
                           vmem_limit=PROBE_VMEM_LIMIT_BYTES)

    @jax.jit
    def fused(x):
        return fused_quant_conv3x3(x, w, ascal, scale, shift, cfg=kcfg)

    w_bf = w.astype(jnp.bfloat16)

    @jax.jit
    def composed(x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w_bf, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return quantize_to_fp8(jax.nn.relu(y), jnp.asarray(6.0), 4.0)

    return fused, composed, xs


def _time_fn(fn, xs):
    fn(xs[0]).block_until_ready()
    iters, reps = 4, 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(xs[i % len(xs)])
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv3_group(n: int, h: int, cin: int, cout: int, g0: int,
                stride: int = 1) -> int:
    """Group size for the fused bf16 3x3 conv, or 0 for "stay on XLA".

    Walks the divisors of ``n`` downward from the heuristic ``g0`` until
    the kernel compiles within the device's VMEM budget (stride-2's phase
    planes raise the footprint beyond the static model), then keeps the
    first compiling group only if it beats the composed XLA conv + quant
    chain it replaces.  Measured once per shape on TPU (cache tag 'c' /
    'c2' for stride 2, value = chosen group, 0 = XLA); ``g0`` as-is for
    CPU/interpret tests; 'heuristic' mode says no (XLA convs are strong —
    fuse by evidence)."""
    if MODE == "never" or MODE == "heuristic":
        return 0

    from fp8_quantization_tpu.ops.pallas.common import on_cpu_backend
    if on_cpu_backend():
        return max(1, g0)

    if not _DISK_LOADED:
        _load_disk_cache()
    # 'always' still walks the compile probe (an unprobed heuristic group
    # can blow the scoped-VMEM limit); it skips only the fused-vs-XLA race.
    # Its entries carry a '!' tag so they never pose as measured verdicts.
    key = (("c" if stride == 1 else "c2")
           + ("!" if MODE == "always" else ""), n, h, cin, cout, g0)
    if key not in _CACHE:
        _CACHE[key] = _off_trace(_resolve_conv3_group, n, h, cin, cout, g0,
                                 stride)
        _save_disk_cache()
    logger.info("conv3 gate (%d,%dx%d,%d->%d,s%d) -> g=%d", n, h, h, cin,
                cout, stride, _CACHE[key])
    return int(_CACHE[key])


def _resolve_conv3_group(n: int, h: int, cin: int, cout: int, g0: int,
                         stride: int) -> int:
    import jax
    import jax.numpy as jnp

    groups = [g for g in range(max(1, g0), 0, -1) if n % g == 0]
    chosen, fused, composed, xs = 0, None, None, None
    for g in groups:
        try:
            fused, composed, xs = _conv3_fns(n, h, cin, cout, g, stride)
            shape = jax.ShapeDtypeStruct((n, h, h, cin), jnp.float32)
            fused.lower(shape).compile()
            chosen = g
            break
        except Exception as exc:            # VMEM exhaustion at this group
            logger.info("conv3 (%d,%dx%d,%d->%d,s%d) g=%d: %s", n, h, h,
                        cin, cout, stride, g, str(exc)[:120])
    if chosen == 0:
        return 0
    if MODE == "always":
        return chosen
    try:
        t_fused = _time_fn(fused, xs)
        t_xla = _time_fn(composed, xs)
    except Exception as exc:
        logger.warning("conv3 autotune (%d,%d,%d,%d,s%d) failed: %s",
                       n, h, cin, cout, stride, exc)
        return 0
    win = t_fused * WIN_MARGIN < t_xla
    logger.info("conv3 autotune (%d,%dx%d,%d->%d,s%d) g=%d: fused %.3fms vs "
                "xla %.3fms -> %s", n, h, h, cin, cout, stride, chosen,
                t_fused * 1e3, t_xla * 1e3, "FUSED" if win else "XLA")
    return chosen if win else 0


def _int8_conv_fns(n: int, h: int, cin: int, cout: int, g: int,
                   prequant: bool = False, stride: int = 1):
    """(fused, composed, example inputs) for the int8-conv shape probe."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fp8_quantization_tpu.ops.pallas.qconv import (
        FusedConvConfig, fused_quant_conv3x3)
    from fp8_quantization_tpu.ops.pallas.qmatmul import int8_shifted_grid

    rng = np.random.RandomState((h * cin + 1) % 9973)
    xs = [jnp.asarray(rng.normal(0, 1, (n, h, h, cin)), jnp.float32)
          for _ in range(2)]
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), jnp.float32)
    w_delta = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    scale = jnp.ones((cout,), jnp.float32)
    shift = jnp.zeros((cout,), jnp.float32)
    ascal = jnp.asarray([8.0 / 255.0, 128.0, 0.0], jnp.float32)
    from fp8_quantization_tpu.ops.pallas.common import PROBE_VMEM_LIMIT_BYTES
    kcfg = FusedConvConfig(act_method="int_asym", activation="relu",
                           mxu_dtype="int8", imgs_per_block=g,
                           w_prequant=prequant, stride=stride,
                           vmem_limit=PROBE_VMEM_LIMIT_BYTES)
    w_arg = (int8_shifted_grid(w, w_delta, 1.0, 8).astype(jnp.int8)
             if prequant else w)

    @jax.jit
    def fused(x):
        return fused_quant_conv3x3(
            x, w_arg, ascal, scale, shift, weight_channel_param=w_delta,
            weight_scalars=jnp.asarray([0.0, 1.0], jnp.float32), cfg=kcfg)

    from fp8_quantization_tpu.ops.int8 import int8_conv
    wsg8_x = int8_shifted_grid(w, w_delta, 1.0, 8).astype(jnp.int8)

    @jax.jit
    def composed(x):
        # the TRUE alternative (ops/int8.py): XLA-native s8 conv with the
        # same quant prologue + dequant/relu epilogue
        return int8_conv(x, wsg8_x, w_delta, jnp.asarray(1.0, jnp.float32),
                         ascal[0], ascal[1], 8, strides=(stride, stride),
                         act_fn=jax.nn.relu)

    return fused, composed, xs


def conv3_int8_group(n: int, h: int, cin: int, cout: int, g0: int,
                     prequant: bool = False, stride: int = 1) -> int:
    """Group size for the native-int8 fused 3x3 conv, or 0 for "don't".

    The int8 kernel's VMEM envelope is much tighter than the bf16 one
    (sub-32-bit operands occupy full i32 vregs inside Mosaic, and the
    im2col matrix exists per group) and resists static modeling — so the
    gate is empirical: walk the divisors of ``n`` downward from the
    heuristic ``g0`` until the kernel *compiles* for the attached device,
    then (MODE == "auto") keep it only if it beats the composed XLA
    fake-quant path it replaces.  Cached per shape (tag 'ig': the chosen
    group; 0 = stay on XLA).
    """
    if MODE == "never" or MODE == "heuristic":
        return 0

    from fp8_quantization_tpu.ops.pallas.common import on_cpu_backend
    if on_cpu_backend():
        return max(1, g0)    # interpret mode: no VMEM constraint

    if not _DISK_LOADED:
        _load_disk_cache()
    key = (("igp" if prequant else "ig") + ("2" if stride == 2 else "")
           + ("!" if MODE == "always" else ""), n, h, cin, cout, g0)
    if key not in _CACHE:
        _CACHE[key] = _off_trace(_resolve_int8_group, n, h, cin, cout, g0,
                                 prequant, stride)
        _save_disk_cache()
    logger.info("conv3 int8 gate (%d,%dx%d,%d->%d) -> g=%d", n, h, h, cin,
                cout, _CACHE[key])
    return _CACHE[key]


def _resolve_int8_group(n: int, h: int, cin: int, cout: int, g0: int,
                        prequant: bool = False, stride: int = 1) -> int:
    import jax
    import jax.numpy as jnp

    groups = [g for g in range(max(1, g0), 0, -1) if n % g == 0]
    chosen, fused, composed, xs = 0, None, None, None
    for g in groups:
        try:
            fused, composed, xs = _int8_conv_fns(n, h, cin, cout, g,
                                                 prequant, stride)
            shape = jax.ShapeDtypeStruct((n, h, h, cin), jnp.float32)
            fused.lower(shape).compile()
            chosen = g
            break
        except Exception as exc:            # VMEM exhaustion at this group
            logger.info("conv3 int8 (%d,%dx%d,%d->%d) g=%d: %s", n, h, h,
                        cin, cout, g, str(exc)[:120])
    if chosen == 0:
        return 0
    if MODE == "always":
        return chosen

    try:
        t_fused = _time_fn(fused, xs)
        t_xla = _time_fn(composed, xs)
    except Exception as exc:
        logger.warning("conv3 int8 autotune (%d,%d,%d,%d) failed: %s",
                       n, h, cin, cout, exc)
        return 0
    logger.info("conv3 int8 autotune (%d,%dx%d,%d->%d) g=%d: fused %.3fms "
                "vs xla %.3fms", n, h, h, cin, cout, chosen, t_fused * 1e3,
                t_xla * 1e3)
    return chosen if t_fused * WIN_MARGIN < t_xla else 0


def _dw_fns(n: int, h: int, c: int, g: int, stride: int = 1):
    """(fused, composed, example inputs) for the depthwise-conv probe
    (deployment semantics: baked bf16 weights, folded BN scale/shift,
    relu6, fp8 output quant — MobileNetV2's hot configuration)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8
    from fp8_quantization_tpu.ops.pallas.qconv import (
        FusedConvConfig, fused_quant_dwconv3x3)

    rng = np.random.RandomState((h + c) % 9973)
    xs = [jnp.asarray(rng.normal(0, 1, (n, h, h, c)), jnp.float32)
          for _ in range(2)]
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, c)), jnp.float32)
    w = w.astype(jnp.bfloat16).astype(jnp.float32)
    scale = jnp.ones((c,), jnp.float32)
    shift = jnp.zeros((c,), jnp.float32)
    ascal = jnp.asarray([6.0, 4.0, 1.0], jnp.float32)
    from fp8_quantization_tpu.ops.pallas.common import PROBE_VMEM_LIMIT_BYTES
    kcfg = FusedConvConfig(act_method="fp8", activation="relu6",
                           imgs_per_block=g, stride=stride,
                           vmem_limit=PROBE_VMEM_LIMIT_BYTES)

    @jax.jit
    def fused(x):
        return fused_quant_dwconv3x3(x, w, ascal, scale, shift, cfg=kcfg)

    w_hwio = w.reshape(3, 3, 1, c).astype(jnp.bfloat16)

    @jax.jit
    def composed(x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w_hwio, (stride, stride),
            ((1, 1), (1, 1)), feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return quantize_to_fp8(jnp.clip(y, 0.0, 6.0), jnp.asarray(6.0), 4.0)

    return fused, composed, xs


def dw_group(n: int, h: int, c: int, g0: int, stride: int = 1) -> int:
    """Group size for the fused depthwise 3x3 conv, or 0 for XLA.

    Same resolve-then-measure protocol as conv3_group (cache tags 'd' /
    'd2').  The depthwise stencil is VPU/HBM work — the fused kernel wins
    by collapsing the conv + BN + relu6 + out-quant HBM round trips, which
    only measurement can confirm per shape.
    """
    if MODE == "never" or MODE == "heuristic":
        return 0

    from fp8_quantization_tpu.ops.pallas.common import on_cpu_backend
    if on_cpu_backend():
        return max(1, g0)

    if not _DISK_LOADED:
        _load_disk_cache()
    key = (("d" if stride == 1 else "d2")
           + ("!" if MODE == "always" else ""), n, h, c, g0)
    if key not in _CACHE:
        _CACHE[key] = _off_trace(_resolve_dw_group, n, h, c, g0, stride)
        _save_disk_cache()
    logger.info("dw gate (%d,%dx%d,%d,s%d) -> g=%d", n, h, h, c, stride,
                _CACHE[key])
    return int(_CACHE[key])


def _resolve_dw_group(n: int, h: int, c: int, g0: int, stride: int) -> int:
    import jax
    import jax.numpy as jnp

    groups = [g for g in range(max(1, g0), 0, -1) if n % g == 0]
    chosen, fused, composed, xs = 0, None, None, None
    for g in groups:
        try:
            fused, composed, xs = _dw_fns(n, h, c, g, stride)
            shape = jax.ShapeDtypeStruct((n, h, h, c), jnp.float32)
            fused.lower(shape).compile()
            chosen = g
            break
        except Exception as exc:
            logger.info("dw (%d,%dx%d,%d,s%d) g=%d: %s", n, h, h, c, stride,
                        g, str(exc)[:120])
    if chosen == 0:
        return 0
    if MODE == "always":
        return chosen
    try:
        t_fused = _time_fn(fused, xs)
        t_xla = _time_fn(composed, xs)
    except Exception as exc:
        logger.warning("dw autotune (%d,%d,%d,s%d) failed: %s", n, h, c,
                       stride, exc)
        return 0
    win = t_fused * WIN_MARGIN < t_xla
    logger.info("dw autotune (%d,%dx%d,%d,s%d) g=%d: fused %.3fms vs xla "
                "%.3fms -> %s", n, h, h, c, stride, chosen, t_fused * 1e3,
                t_xla * 1e3, "FUSED" if win else "XLA")
    return chosen if win else 0


def _stem_fns(n: int, s: int, cin: int, cout: int, g: int, k_pad: int):
    """(fused, composed, example inputs) for the fused-stem probe.

    Composed baseline = the deployment chain the kernel replaces
    (RESULTS.md round-3 attribution: input convert pass + conv7x7s2 fusion
    + maxpool, 4.52 ms of the 21.2 ms step): bf16 cast -> conv -> affine
    relu -> fp8 output quant -> maxpool3x3s2."""
    import flax.linen as fnn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8
    from fp8_quantization_tpu.ops.pallas.common import PROBE_VMEM_LIMIT_BYTES
    from fp8_quantization_tpu.ops.pallas.qstem import (
        FusedStemConfig, fused_quant_stem)

    rng = np.random.RandomState((s + cout) % 9973)
    xs = [jnp.asarray(rng.normal(0, 1, (n, s, s, cin)), jnp.float32)
          for _ in range(2)]
    w = jnp.asarray(rng.normal(0, 0.1, (7, 7, cin, cout)), jnp.float32)
    w = w.astype(jnp.bfloat16).astype(jnp.float32)
    scale = jnp.ones((cout,), jnp.float32)
    shift = jnp.zeros((cout,), jnp.float32)
    ascal = jnp.asarray([6.0, 4.0, 1.0], jnp.float32)
    kcfg = FusedStemConfig(act_method="fp8", imgs_per_block=g, k_pad=k_pad,
                           vmem_limit=PROBE_VMEM_LIMIT_BYTES)

    @jax.jit
    def fused(x):
        return fused_quant_stem(x, w, ascal, scale, shift, cfg=kcfg)

    w_bf = w.astype(jnp.bfloat16)

    @jax.jit
    def composed(x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w_bf, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = quantize_to_fp8(jax.nn.relu(y), jnp.asarray(6.0), 4.0)
        return fnn.max_pool(y, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

    return fused, composed, xs


def stem_group(n: int, s: int, cin: int, cout: int, g0: int) -> Tuple[int, int]:
    """(group, k_pad) for the fused stem kernel, or (0, 0) for XLA.

    Same empirical protocol as conv3_group, with one extra axis: the
    in-kernel channel pad of the im2col tile (k_pad=4 halves the MXU
    K-padding waste vs 8, IF Mosaic lowers width-4 lane concats — only a
    compile probe can say).  Cached per shape (tag 's', value =
    group * 100 + k_pad; 0 = XLA)."""
    if MODE == "never" or MODE == "heuristic":
        return 0, 0

    from fp8_quantization_tpu.ops.pallas.common import on_cpu_backend
    if on_cpu_backend():
        return max(1, g0), 8    # interpret mode: exercise the kernel path

    if not _DISK_LOADED:
        _load_disk_cache()
    key = ("s" + ("!" if MODE == "always" else ""), n, s, cin, cout, g0)
    if key not in _CACHE:
        _CACHE[key] = _off_trace(_resolve_stem_group, n, s, cin, cout, g0)
        _save_disk_cache()
    enc = int(_CACHE[key])
    logger.info("stem gate (%d,%dx%d,%d->%d) -> g=%d kp=%d", n, s, s, cin,
                cout, enc // 100, enc % 100)
    return enc // 100, enc % 100


def _resolve_stem_group(n: int, s: int, cin: int, cout: int, g0: int) -> int:
    import jax
    import jax.numpy as jnp

    # g is pinned to 1: the 224px feasibility matrix (batch 512, v5e AOT)
    # showed every g > 1 tripping an XLA whole-output VMEM staging (fast
    # fail at g=2, ~6-minute compiler OOM at g=8) while g=1 compiles in
    # ~10 s for both k_pads and pipelines fine across the n grid steps.
    # Failed attempts are EXPENSIVE over a remote-compile tunnel, so the
    # walk starts at the known-good point; k_pad=4 first (196-lane im2col
    # K halves the MXU K-padding waste vs 8).
    del g0
    chosen, kp_chosen, fused, composed, xs = 0, 0, None, None, None
    for g, kp in ((1, 4), (1, 8)):
        try:
            fused, composed, xs = _stem_fns(n, s, cin, cout, g, kp)
            shape = jax.ShapeDtypeStruct((n, s, s, cin), jnp.float32)
            fused.lower(shape).compile()
            chosen, kp_chosen = g, kp
            break
        except Exception as exc:         # lowering / VMEM failure
            logger.info("stem (%d,%dx%d,%d->%d) g=%d kp=%d: %s", n, s,
                        s, cin, cout, g, kp, str(exc)[:120])
    if chosen == 0:
        return 0
    enc = chosen * 100 + kp_chosen
    if MODE == "always":
        return enc
    try:
        t_fused = _time_fn(fused, xs)
        t_xla = _time_fn(composed, xs)
    except Exception as exc:
        logger.warning("stem autotune (%d,%d,%d,%d) failed: %s", n, s, cin,
                       cout, exc)
        return 0
    win = t_fused * WIN_MARGIN < t_xla
    logger.info("stem autotune (%d,%dx%d,%d->%d) g=%d kp=%d: fused %.3fms "
                "vs xla %.3fms -> %s", n, s, s, cin, cout, chosen, kp_chosen,
                t_fused * 1e3, t_xla * 1e3, "FUSED" if win else "XLA")
    return enc if win else 0


def _attn_fns(b: int, h: int, s: int, d: int):
    """(fused, composed, example inputs) for the flash-attention probe."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fp8_quantization_tpu.ops.pallas.attention import flash_mha

    rng = np.random.RandomState((s + d) % 9973)
    mk = lambda seed: tuple(                                  # noqa: E731
        jnp.asarray(rng.normal(0, 1, (b, h, s, d)), jnp.float32)
        for _ in range(3))
    xs = [mk(0), mk(1)]
    scale = 1.0 / float(d) ** 0.5

    @jax.jit
    def fused(qkv):
        q, k, v = qkv
        return flash_mha(q, k, v, sm_scale=scale)

    @jax.jit
    def composed(qkv):
        q, k, v = qkv
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

    return fused, composed, xs


def attn_wins(b: int, h: int, s: int, d: int) -> bool:
    """Should flash attention replace the composed softmax chain at this
    (batch, heads, seq, head_dim)?  Measured once per shape (tag 'a')."""
    if MODE == "always":
        return True
    if MODE == "never" or MODE == "heuristic":
        return False

    from fp8_quantization_tpu.ops.pallas.common import on_cpu_backend
    if on_cpu_backend():
        return True   # interpret mode: keep the path test-covered

    if not _DISK_LOADED:
        _load_disk_cache()
    key = ("a", b, h, s, d)
    if key not in _CACHE:
        _CACHE[key] = _off_trace(_resolve_attn, b, h, s, d)
        _save_disk_cache()
    logger.info("attn gate (%d,%d,%d,%d) -> %s", b, h, s, d,
                "flash" if _CACHE[key] else "xla")
    return bool(_CACHE[key])


def _resolve_attn(b: int, h: int, s: int, d: int) -> int:
    # CAVEAT (round 5, RESULTS.md): this isolated race is structurally
    # unrepresentative for attention on v5e — at ViT-S/16 b128 shapes the
    # probe says FLASH (>25% margin) yet the end-to-end pallas-engine model
    # runs 2.3x SLOWER than the naive chain (66.2 vs 28.5 ms): in-model,
    # flash's operand-layout requirements materialize head transposes the
    # probe's standalone operands never pay.  The committed seed overrides
    # this shape to XLA with the model-level verdict; treat fresh probe
    # wins at NEW attention shapes as provisional until raced end-to-end.
    try:
        fused, composed, xs = _attn_fns(b, h, s, d)
        t_fused = _time_fn(fused, xs)
        t_xla = _time_fn(composed, xs)
    except Exception as exc:
        logger.warning("attn autotune (%d,%d,%d,%d) failed: %s", b, h, s, d,
                       exc)
        return 0
    win = t_fused * WIN_MARGIN < t_xla
    logger.info("attn autotune (%d,%d,%d,%d): flash %.3fms vs xla %.3fms "
                "-> %s", b, h, s, d, t_fused * 1e3, t_xla * 1e3,
                "FLASH" if win else "XLA")
    return int(win)


def _ir_block_fns(n: int, h: int, cin: int, hid: int, cout: int, g: int,
                  stride: int, expand: bool, use_res: bool):
    """(fused, composed, example inputs) for the inverted-residual probe.

    The composed baseline is the unfused deployment chain the block kernel
    replaces: expand matmul + quant, depthwise conv + quant, project
    matmul + quant (+ residual + quant) — representative XLA workload, not
    a bit-exact oracle (tests pin numerics; this races wall-clock)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8
    from fp8_quantization_tpu.ops.pallas.common import PROBE_VMEM_LIMIT_BYTES
    from fp8_quantization_tpu.ops.pallas.qblock import (
        FusedBlockConfig, fused_inverted_residual)

    rng = np.random.RandomState((h * hid + 3) % 9973)
    xs = [jnp.asarray(rng.normal(0, 1, (n, h, h, cin)), jnp.float32)
          for _ in range(2)]
    w1 = (jnp.asarray(rng.normal(0, 0.1, (cin, hid)), jnp.float32)
          if expand else None)
    wd = jnp.asarray(rng.normal(0, 0.1, (3, 3, hid)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.1, (hid, cout)), jnp.float32)
    ones_h, zeros_h = jnp.ones((hid,)), jnp.zeros((hid,))
    ones_o, zeros_o = jnp.ones((cout,)), jnp.zeros((cout,))
    ascal = jnp.tile(jnp.asarray([[6.0, 4.0, 1.0]], jnp.float32), (4, 1))
    kcfg = FusedBlockConfig(expand=expand, stride=stride, use_res=use_res,
                            imgs_per_block=g,
                            vmem_limit=PROBE_VMEM_LIMIT_BYTES)

    @jax.jit
    def fused(x):
        return fused_inverted_residual(
            x, w1, wd, w2, ascal, ones_h if expand else None,
            zeros_h if expand else None, ones_h, zeros_h, ones_o, zeros_o,
            x_factor=jnp.asarray(1.0) if use_res else None, cfg=kcfg)

    w1_bf = w1.astype(jnp.bfloat16) if expand else None
    wd4 = wd.reshape(3, 3, 1, hid).astype(jnp.bfloat16)
    w2_bf = w2.astype(jnp.bfloat16)
    q = lambda y: quantize_to_fp8(y, jnp.asarray(6.0), 4.0)   # noqa: E731

    @jax.jit
    def composed(x):
        y = x
        if expand:
            y = jnp.dot(y.astype(jnp.bfloat16), w1_bf,
                        preferred_element_type=jnp.float32)
            y = q(jnp.clip(y, 0.0, 6.0))
        y = jax.lax.conv_general_dilated(
            y.astype(jnp.bfloat16), wd4, (stride, stride), ((1, 1), (1, 1)),
            feature_group_count=hid,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = q(jnp.clip(y, 0.0, 6.0))
        y = jnp.dot(y.astype(jnp.bfloat16), w2_bf,
                    preferred_element_type=jnp.float32)
        y = q(y)
        if use_res:
            y = q(y + x)
        return y

    return fused, composed, xs


def ir_group(n: int, h: int, cin: int, hid: int, cout: int, g0: int,
             stride: int = 1, expand: bool = True,
             use_res: bool = False) -> int:
    """Group size for the fused inverted-residual block, or 0 for unfused.

    Same empirical protocol as conv3_group: walk divisors of ``n`` downward
    from ``g0`` until the kernel compiles within the VMEM budget (the
    expanded hidden tensor dominates and resists static modeling), then
    keep the group only if the fused block beats the composed chain it
    replaces.  Cached per shape (tag 'irb', value = group, 0 = unfused).
    """
    if MODE == "never" or MODE == "heuristic":
        return 0

    from fp8_quantization_tpu.ops.pallas.common import on_cpu_backend
    if on_cpu_backend():
        return max(1, g0)

    if not _DISK_LOADED:
        _load_disk_cache()
    key = (("irb" + ("2" if stride == 2 else "")
            + ("r" if use_res else "") + ("" if expand else "x")
            + ("!" if MODE == "always" else "")),
           n, h, cin, hid, cout, g0)
    if key not in _CACHE:
        _CACHE[key] = _off_trace(_resolve_ir_group, n, h, cin, hid, cout,
                                 g0, stride, expand, use_res)
        _save_disk_cache()
    logger.info("ir-block gate (%d,%dx%d,%d->%d->%d,s%d) -> g=%d", n, h, h,
                cin, hid, cout, stride, _CACHE[key])
    return int(_CACHE[key])


def _resolve_ir_group(n: int, h: int, cin: int, hid: int, cout: int,
                      g0: int, stride: int, expand: bool,
                      use_res: bool) -> int:
    import jax
    import jax.numpy as jnp

    # halve between attempts (each failed compile costs ~a minute over a
    # dev tunnel): g0, ~g0/2, ~g0/4, ..., 1 — O(log g0) compiles, not O(g0)
    divs = [g for g in range(max(1, g0), 0, -1) if n % g == 0]
    groups, want = [], max(1, g0)
    for g in divs:
        if g <= want:
            groups.append(g)
            want = max(1, g // 2)
    chosen, fused, composed, xs = 0, None, None, None
    for g in groups:
        try:
            fused, composed, xs = _ir_block_fns(n, h, cin, hid, cout, g,
                                                stride, expand, use_res)
            shape = jax.ShapeDtypeStruct((n, h, h, cin), jnp.float32)
            fused.lower(shape).compile()
            chosen = g
            break
        except Exception as exc:            # VMEM exhaustion at this group
            logger.info("ir-block (%d,%dx%d,%d->%d->%d,s%d) g=%d: %s", n, h,
                        h, cin, hid, cout, stride, g, str(exc)[:120])
    if chosen == 0:
        return 0
    if MODE == "always":
        return chosen
    try:
        t_fused = _time_fn(fused, xs)
        t_xla = _time_fn(composed, xs)
    except Exception as exc:
        logger.warning("ir-block autotune (%d,%d,%d,%d,%d,s%d) failed: %s",
                       n, h, cin, hid, cout, stride, exc)
        return 0
    win = t_fused * WIN_MARGIN < t_xla
    logger.info("ir-block autotune (%d,%dx%d,%d->%d->%d,s%d) g=%d: fused "
                "%.3fms vs xla %.3fms -> %s", n, h, h, cin, hid, cout,
                stride, chosen, t_fused * 1e3, t_xla * 1e3,
                "FUSED" if win else "XLA")
    return chosen if win else 0


def export_seed() -> str:
    """Copy this machine's live cache to the committed seed location.

    Returns the seed path written.  Run after an on-chip race session to
    make its verdicts part of the repo (autotune_seed/README.md)."""
    import shutil

    src, dst = _cache_path(), _seed_path()
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copyfile(src, dst)
    return dst
