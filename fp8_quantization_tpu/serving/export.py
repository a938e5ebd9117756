"""Serving export: serialize the calibrated quantized model to StableHLO.

The deployment artifact is a single self-contained file produced by
``jax.export``: the jitted inference function with the calibrated quant
parameters and (optionally baked) weights closed over as constants.  A
server process loads it with :func:`load_exported` and calls it — no model
code, configs, or calibration data needed at serving time, and the artifact
is portable across processes/hosts with compatible devices.

This is new TPU-native deployment surface (the reference stops at an
evaluation script; SURVEY.md §5 checkpoint/resume is the closest analogue).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def export_quantized_model(model, variables: dict, path: str, *,
                           batch_size: Optional[int] = None,
                           image_size: int = 224, channels: int = 3,
                           bake: bool = True,
                           quant_w: Optional[bool] = None) -> Tuple[str, tuple]:
    """Serialize ``model.apply(variables, x, mode='fixed')`` to ``path``.

    ``batch_size=None`` exports with a symbolic (polymorphic) batch
    dimension so one artifact serves any batch size.  ``bake=True`` first
    bakes the fake-quantized weights (bit-identical, faster — nn/bake.py).
    Pass ``quant_w=False`` with ``bake=False``-style pre-prepared variables
    (nn/bake.prepare_for_deployment) to export them as-is.
    Returns (path, input_shape_spec).
    """
    from jax import export as jexport

    if quant_w is None:
        quant_w = True
        if bake:
            from fp8_quantization_tpu.nn.bake import bake_weights

            variables = bake_weights(
                model, variables,
                jnp.zeros((1, image_size, image_size, channels), jnp.float32))
            quant_w = False

    def infer(x):
        return model.apply(variables, x, mode="fixed", quant_w=quant_w)

    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, image_size, image_size, channels),
                                      jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct(
            (batch_size, image_size, image_size, channels), jnp.float32)

    exported = jexport.export(jax.jit(infer))(x_spec)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path, tuple(x_spec.shape)


def load_exported(path: str):
    """Load a serialized artifact; returns a callable ``fn(x) -> logits``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return jax.jit(exported.call)
