"""Bake fake-quantized weights into the params pytree for inference.

The reference re-runs the weight fake-quant every forward (hijacker.py:93-98)
— correct for QAT, wasted work for deployment.  ``bake_weights`` runs one
forward with the ``baked_weights`` collection mutable (each quantized layer
sows its fake-quantized kernel, nn/layers.py), writes those kernels back
into ``params``, and the model is then evaluated with ``quant_w=False``:
bit-identical outputs (the conv consumes exactly the same tensor) with the
whole weight-quant chain removed from the step.

Quantization idempotence (Q(Q(w)) == Q(w), tested in test_fp8_ops) means
calibrating or re-baking on baked weights is also a no-op.
"""

from __future__ import annotations

from typing import Any, Dict

import jax


def bake_weights(model, variables: Dict[str, Any], example_input, *,
                 bn_eps: float = 1e-5) -> Dict[str, Any]:
    """Return variables with fake-quantized kernels written into params.

    Run with the parity engine (the default) so the baked values are the
    exact grid values; evaluate afterwards with ``quant_w=False``.

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

    def _merge(params, baked_tree, stats, path=()):
        out = dict(params)
        for key, sub in baked_tree.items():
            if key not in out:
                continue
            if isinstance(sub, dict):
                out[key] = _merge(out[key], sub,
                                  stats.get(key, {}) if isinstance(stats, dict)
                                  else {}, path + (key,))
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
    if folded and new_stats:
        out_vars["batch_stats"] = new_stats
    return out_vars
