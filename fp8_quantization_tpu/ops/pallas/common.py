"""Shared plumbing for the Pallas TPU kernels.

Interpret-mode gating: the kernels run in Pallas interpret mode on the CPU
backend (tests), and as real Mosaic kernels on TPU.  The default check is
``jax.default_backend() == "cpu"`` — but that *initializes* the default
backend, which hangs forever when the device tunnel is down, and it reports
"cpu" during AOT topology compiles (``jax.experimental.topologies``) where
we specifically want real Mosaic lowering.  Tools that AOT-compile for a
v5e target under ``jax_platforms=cpu`` set ``INTERPRET_OVERRIDE = False``
to force kernel lowering without touching any backend.
"""

from __future__ import annotations

from typing import Optional

INTERPRET_OVERRIDE: Optional[bool] = None


def use_interpret(explicit: bool) -> bool:
    """Resolve a kernel's interpret flag.

    Priority: explicit request > module override (AOT tools, tests) >
    default-backend probe (cpu -> interpret).
    """
    if explicit:
        return True
    if INTERPRET_OVERRIDE is not None:
        return INTERPRET_OVERRIDE
    import jax

    return jax.default_backend() == "cpu"
