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

# Mosaic's default *scoped* VMEM limit is 16 MiB — sized to leave room for
# XLA's own prefetch buffers, not for kernels whose blocks were already
# chosen to fill VMEM (a v5e core carries 128 MiB).  The fused kernels set
# an explicit higher limit; the autotune compile-probes use a STRICTER one,
# because the same kernel embedded in a full model can need slightly more
# stack than it does standalone (operand-layout copies at the custom-call
# boundary — observed +8% at ResNet block shapes), and a group that probes
# clean must never fail the model compile.
VMEM_LIMIT_BYTES = 96 * 1024 * 1024
PROBE_VMEM_LIMIT_BYTES = 80 * 1024 * 1024


def tpu_compiler_params(vmem_limit: Optional[int] = None):
    """Mosaic compiler params for the fused kernels' pallas_calls."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        vmem_limit_bytes=vmem_limit or VMEM_LIMIT_BYTES)


def use_interpret(explicit: bool) -> bool:
    """Resolve a kernel's interpret flag.

    Priority: explicit request > module override (AOT tools, tests) >
    default-backend probe (cpu -> interpret).
    """
    if explicit:
        return True
    if INTERPRET_OVERRIDE is not None:
        return INTERPRET_OVERRIDE
    return on_cpu_backend()


def on_cpu_backend() -> bool:
    """Whether computations traced *now* will lower for the CPU backend.

    Honors an active jax.default_device(cpu) scope (host-side bake /
    deployment prepare, nn/bake.py): the computation lowers for CPU even
    when the process default backend is a TPU, and jax.default_backend()
    does not reflect the override from inside a jit trace.  Shared by the
    kernels' interpret gating and the autotune gates so they can never
    disagree about the target backend.
    """
    import jax

    dd = jax.config.jax_default_device
    if dd is not None:
        platform = getattr(dd, "platform", dd)
        return str(platform).startswith("cpu")
    return jax.default_backend() == "cpu"
