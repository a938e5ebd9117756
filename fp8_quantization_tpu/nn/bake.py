"""Bake fake-quantized weights into the params pytree for inference.

The reference re-runs the weight fake-quant every forward (hijacker.py:93-98)
— correct for QAT, wasted work for deployment.  ``bake_weights`` runs one
forward with the ``baked_weights`` collection mutable (each quantized layer
sows its quantized kernel, nn/layers.py), writes those kernels back into
``params``, and the model is then evaluated with ``quant_w=False``:
identical outputs with the whole weight-quant chain removed from the step.

Engine-dependent bake format:
  * 'parity' engine: the kernel is the full-scale fake-quant value (the conv
    consumes exactly the same fp32 tensor as before).
  * 'bf16'/'pallas' engines: the kernel is the *normalized-grid* value
    (bf16-exact — the factored decomposition, ops/quantizer.apply_factored)
    and its per-channel factor is stored in a separate ``baked`` variable
    collection, which the layer reads under ``quant_w=False`` and folds
    into the matmul output.  Round 1 silently baked nothing for these
    engines (the factored branch never sowed), leaving quant_w=False
    inference running on UNQUANTIZED weights — fixed here.

Quantization idempotence (Q(Q(w)) == Q(w), tested in test_fp8_ops) means
calibrating or re-baking on baked weights is also a no-op.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict

import jax


@contextlib.contextmanager
def _pallas_gates_off():
    """Route the host-side transform forwards through plain XLA.

    The *_host transforms run tiny eager forwards on the CPU backend just
    to sow quantizer/BN scalar state ('qprep'/'baked'/'baked_int8' — all
    engine-independent values).  Under engine='pallas' those forwards
    would otherwise execute the fused kernels in interpret mode — the
    flash-attention interpreter alone hangs a ViT-S prepare for many
    minutes (round-5 finding) — and, worse, consult the autotune gates.
    Forcing MODE='never' for the transform keeps the sown state identical
    and the transform fast; deployment forwards on the real device still
    use the gated kernels."""
    from fp8_quantization_tpu.ops.pallas import autotune as at

    prev = at.MODE
    at.MODE = "never"
    try:
        yield
    finally:
        at.MODE = prev


def bake_weights(model, variables: Dict[str, Any], example_input, *,
                 bn_eps: float = 1e-5) -> Dict[str, Any]:
    """Return variables with quantized kernels (and factors) baked in.

    Evaluate afterwards with ``quant_w=False``.

    bn_mode='folded' models bake the BN-FOLDED quantized kernel, so the BN
    parameters of every baked layer are neutralized (gamma=1, mean=0,
    var=1-eps, beta=the folded shift) — otherwise the folded forward would
    apply the BN scale a second time on top of the baked kernel.  ``bn_eps``
    must match the layers' bn_eps (default 1e-5).
    """
    import jax.numpy as jnp

    _, upd = model.apply(variables, example_input, mode="fixed",
                         mutable=["baked_weights"])
    baked = upd.get("baked_weights", {})
    folded = getattr(getattr(model, "config", None), "bn_mode",
                     "fp32_after") == "folded"

    new_stats = dict(variables.get("batch_stats", {}))
    baked_factors: Dict[str, Any] = {}

    def _set_nested(root, path, name, value):
        node = root
        for k in path:
            node = node.setdefault(k, {})
        node[name] = value

    def _merge(params, baked_tree, stats, path=()):
        out = dict(params)
        for key, sub in baked_tree.items():
            if key not in out:
                continue
            if isinstance(sub, dict):
                out[key] = _merge(out[key], sub,
                                  stats.get(key, {}) if isinstance(stats, dict)
                                  else {}, path + (key,))
        if ("w_factor" in baked_tree
                and not isinstance(baked_tree["w_factor"], dict)):
            # factored engines: per-channel factor rides in the 'baked'
            # collection; nn/layers.py reads it under quant_w=False
            _set_nested(baked_factors, path, "w_factor",
                        baked_tree["w_factor"])
        for name in ("kernel", "scale"):
            if name in baked_tree and name in out and not isinstance(
                    baked_tree[name], dict):
                out[name] = baked_tree[name]
                if (folded and "gamma" in out
                        and isinstance(stats, dict) and "mean" in stats):
                    # neutralize BN so the eval-time fold is the identity:
                    # inv' = rsqrt(var'+eps)*gamma' = rsqrt(1-eps+eps)*1 = 1
                    inv = jax.lax.rsqrt(stats["var"] + bn_eps) * out["gamma"]
                    shift = out["beta"] - stats["mean"] * inv
                    out["gamma"] = jnp.ones_like(out["gamma"])
                    out["beta"] = shift
                    _set_stats(path, {"mean": jnp.zeros_like(stats["mean"]),
                                      "var": jnp.full_like(stats["var"],
                                                           1.0 - bn_eps)})
        return out

    def _set_stats(path, value):
        node = new_stats
        for k in path[:-1]:
            node[k] = dict(node[k])
            node = node[k]
        node[path[-1]] = {**node.get(path[-1], {}), **value} if path else value
        # note: path always non-empty for a layer scope

    new_params = _merge(variables["params"], baked,
                        variables.get("batch_stats", {}))
    out_vars = {**variables, "params": new_params}
    if baked_factors:
        out_vars["baked"] = baked_factors
    if folded and new_stats:
        out_vars["batch_stats"] = new_stats
    return out_vars


def bake_int8_weights(model, variables: Dict[str, Any], example_input
                      ) -> Dict[str, Any]:
    """Pre-quantize weights onto the recentered int8 grid (int8_mxu configs).

    One forward with the 'baked_int8' collection mutable: every layer on
    the native-int8 MXU path stows its integer-grid weights (int8), the
    per-channel delta, and the grid signedness
    (nn/layers._sow_int8_weights).  Evaluate afterwards with
    ``quant_w=False``: the kernels consume the stored int8 weights directly
    (w_prequant) — the whole weight round/clip chain leaves the step, VMEM
    pressure drops (larger fused-conv groups compile), and a serving export
    carries 4x-smaller weight constants.  Bit-identical outputs: the stored
    grid is exactly what the in-kernel chain produced
    (ops/pallas/qmatmul.int8_shifted_grid is shared by both paths).
    """
    _, upd = model.apply(variables, example_input, mode="fixed",
                         mutable=["baked_int8"])
    out = dict(variables)
    if "baked_int8" in upd:
        out["baked_int8"] = upd["baked_int8"]
        # int8_assume_signed (config) statically elides the s_w-rowsum
        # algebra; validate the claim here against the CONCRETE baked grid
        # signedness — the one place both are host-visible
        cfg = getattr(model, "config", None)
        if cfg is not None and getattr(cfg, "int8_assume_signed", False):
            import numpy as np

            def _walk(tree, path=()):
                for k, v in tree.items():
                    if isinstance(v, dict):
                        yield from _walk(v, path + (k,))
                    elif k == "w_signed":
                        yield path, v
            bad = ["/".join(p) for p, v in _walk(out["baked_int8"])
                   if float(np.asarray(v)) != 1.0]
            if bad:
                raise ValueError(
                    "int8_assume_signed=True but unsigned weight grids were "
                    f"baked for: {bad} — drop the flag or the offending "
                    "layers' unsigned ranges")
    return out


def bake_int8_weights_host(model, variables: Dict[str, Any],
                           example_shape=(1, 64, 64, 3)) -> Dict[str, Any]:
    """bake_int8_weights on the host CPU backend (one bulk transfer back).

    Same rationale as prepare_for_deployment_host: the bake forward runs
    eagerly, and eager dispatch to a remote device is latency-bound.
    """
    import numpy as np

    devices = {a.device for a in jax.tree.leaves(variables)
               if hasattr(a, "device")}
    target = devices.pop() if len(devices) == 1 else jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    host_vars = jax.tree.map(lambda a: jax.device_put(np.asarray(a), cpu),
                             jax.device_get(variables))
    with jax.default_device(cpu), _pallas_gates_off():
        host_vars = bake_int8_weights(
            model, host_vars, np.zeros(example_shape, np.float32))
    return jax.tree.map(lambda a: jax.device_put(a, target), host_vars)


def prepare_inference(model, variables: Dict[str, Any], example_input, *,
                      quant_w: bool = True, quant_a: bool = True
                      ) -> Dict[str, Any]:
    """Freeze the fixed-mode quantizers' scalar algebra into a 'qprep'
    collection (ops/quantizer.fixed_consts).

    Run AFTER calibration (and after bake_weights, passing the same
    ``quant_w``/``quant_a`` the deployment step will use): each live FP8
    quantizer derives ~20 scalar ops from its frozen maxval per forward —
    ~435 unfused f32[] scalar ops at the ENTRY of the round-2 compiled
    ResNet-18 step.  With 'qprep' present the per-step graph is
    elementwise-only and bit-identical.  Re-calibrating afterwards leaves the
    consts stale — re-run this (cheap: one tiny forward).
    """
    _, mutated = model.apply(variables, example_input, mode="fixed",
                             quant_w=quant_w, quant_a=quant_a,
                             mutable=["qprep"])
    out = dict(variables)
    if "qprep" in mutated:
        out["qprep"] = mutated["qprep"]
    return out


def prepare_for_deployment(model, variables: Dict[str, Any], example_input, *,
                           bn_eps: float = 1e-5, quant_a: bool = True
                           ) -> Dict[str, Any]:
    """bake_weights + prepare_inference: the full PTQ deployment transform.

    Returns variables to be evaluated with ``quant_w=False`` — the weight
    fake-quant chain is gone (kernels hold grid values, factors in 'baked')
    and the activation quantizers run the prepared elementwise-only path.
    """
    variables = bake_weights(model, variables, example_input, bn_eps=bn_eps)
    return prepare_inference(model, variables, example_input,
                             quant_w=False, quant_a=quant_a)


def prepare_for_deployment_host(model, variables: Dict[str, Any],
                                example_shape=(1, 64, 64, 3), *,
                                bn_eps: float = 1e-5, quant_a: bool = True
                                ) -> Dict[str, Any]:
    """prepare_for_deployment executed on the host CPU backend.

    The transform runs EAGERLY (the cast-const eligibility check,
    ops/fp8.fp8_cast_consts, needs concrete values), and eager per-op
    dispatch to a remote device is latency-bound — minutes over a dev
    tunnel.  This variant pulls the variables to the host, runs the two tiny
    forwards on the CPU backend, and returns variables placed back on the
    original device (one bulk transfer).  ``example_shape`` only needs to be
    deep enough for the model's spatial strides; the transform itself reads
    only quantizer/BN state.
    """
    import numpy as np

    devices = {a.device for a in jax.tree.leaves(variables)
               if hasattr(a, "device")}
    target = devices.pop() if len(devices) == 1 else jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    host_vars = jax.tree.map(lambda a: jax.device_put(np.asarray(a), cpu),
                             jax.device_get(variables))
    with jax.default_device(cpu), _pallas_gates_off():
        host_vars = prepare_for_deployment(
            model, host_vars, np.zeros(example_shape, np.float32),
            bn_eps=bn_eps, quant_a=quant_a)
    return jax.tree.map(lambda a: jax.device_put(a, target), host_vars)
