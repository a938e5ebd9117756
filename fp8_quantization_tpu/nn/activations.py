"""Fused activation functions permitted inside quantized layers.

Reference: hijacker.py:15-29 (activations_set, incl. the timm Swish/HardSwish
variants — here plain jax.nn functions, numerically identical).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "swish": jax.nn.silu,            # timm Swish / SwishMe
    "hardswish": jax.nn.hard_swish,  # timm HardSwish / HardSwishMe
    "hardsigmoid": jax.nn.hard_sigmoid,
}


def get_activation(name: Optional[str]) -> Optional[Callable]:
    if name is None:
        return None
    if name not in ACTIVATIONS:
        raise ValueError(f"unsupported fused activation {name!r}; "
                         f"known: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]
