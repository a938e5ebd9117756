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


def bake_weights(model, variables: Dict[str, Any], example_input) -> Dict[str, Any]:
    """Return variables with fake-quantized kernels written into params.

    Run with the parity engine (the default) so the baked values are the
    exact grid values; evaluate afterwards with ``quant_w=False``.
    """
    _, upd = model.apply(variables, example_input, mode="fixed",
                         mutable=["baked_weights"])
    baked = upd.get("baked_weights", {})

    def _merge(params, baked_tree):
        out = dict(params)
        for key, sub in baked_tree.items():
            if key not in out:
                continue
            if isinstance(sub, dict):
                out[key] = _merge(out[key], sub)
        # a layer's sown entries live under its own scope with the param name
        for name in ("kernel", "scale"):
            if name in baked_tree and name in out and not isinstance(
                    baked_tree[name], dict):
                out[name] = baked_tree[name]
        return out

    new_params = _merge(variables["params"], baked)
    return {**variables, "params": new_params}
