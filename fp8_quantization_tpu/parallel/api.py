"""Multi-chip parallelism: device mesh, sharding rules, distributed
calibration/eval/QAT.

The reference has **no distributed code at all** (SURVEY.md §2: no DDP/NCCL/
MPI anywhere) — this subsystem is new TPU-first work.  The design follows the
standard JAX recipe: pick a mesh, annotate shardings, let XLA insert the
collectives over ICI/DCN.

Axes:
  * ``data``  — batch dimension (data-parallel calibration / eval / QAT).
    Range-estimator reductions (min/max/MSE accumulation) are plain
    ``jnp.min/max/sum`` over globally-sharded arrays, so XLA emits the
    cross-chip reductions automatically; gradient all-reduce in QAT likewise.
  * ``model`` — output-channel dimension of conv/linear kernels
    (tensor-parallel inference).  Per-channel quant state (maxval/delta) is
    sharded along the same axis so the fake-quant stays local to the shard.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh; ``data=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data == -1:
        data = len(devices) // model
    if data * model > len(devices):
        raise ValueError(f"mesh {data}x{model} > {len(devices)} devices")
    devices = devices[:data * model]
    # Auto axis types: the program is written sharding-agnostic and XLA
    # propagates/chooses intermediate shardings (classic GSPMD), so the same
    # model code runs on any mesh.
    return jax.make_mesh(
        (data, model), ("data", "model"), devices=devices,
        axis_types=(jax.sharding.AxisType.Auto, jax.sharding.AxisType.Auto))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x) -> jax.Array:
    return jax.device_put(x, batch_sharding(mesh))


def _tp_spec(path_keys, leaf, tp_size: int) -> P:
    """Tensor-parallel PartitionSpec for one variables leaf.

    Rule: shard the output-channel axis (always the LAST axis in our
    HWIO/(in,out)/(C,) conventions — the central convention of
    ops/quantizer.py) over 'model' when divisible; replicate otherwise.
    MSE estimator carries have channels last too ((111,C)/(M,111,C)).
    """
    if leaf.ndim == 0 or leaf.shape[-1] % tp_size or leaf.shape[-1] == 1:
        return P()
    return P(*([None] * (leaf.ndim - 1) + ["model"]))


def shard_variables(mesh: Mesh, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Place a variables pytree with tensor-parallel shardings over 'model'.

    With ``model=1`` meshes this is plain replication.  XLA inserts the
    all-gathers/reduce-scatters the sharded matmuls need.
    """
    tp = mesh.shape["model"]
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    placed = [jax.device_put(leaf, NamedSharding(mesh, _tp_spec(path, leaf, tp)))
              for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, placed)


def replicate_variables(mesh: Mesh, variables: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), variables)


def gather_weights(mesh: Mesh, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Gather tp-sharded variables to replicated INSIDE a jitted function.

    The weight-gather tensor-parallel strategy for inference: variables stay
    sharded over 'model' in HBM (the memory win of tp), and the step function
    opens by constraining them back to replicated — XLA materializes one
    all-gather per (large) weight.  Because weight gathers have no upstream
    compute dependencies, the latency-hiding scheduler is free to hoist and
    overlap all of them, unlike the activation gathers GSPMD inserts for
    channel-sharded CNN tp, which sit on the critical path between layers.

    Measured on an AOT v5e:2x4 ResNet-50 executable
    (tools/tp_overlap_probe.py): activation strategy = 46 synchronous
    activation all-gathers, 1.14 GB/step on ICI; weight-gather = 38
    async-fused weight gathers + 4 MB of small sync ones, 0.10 GB/step —
    11x less traffic, all of it overlappable.
    """
    repl = replicated(mesh)
    return jax.tree.map(
        lambda t: jax.lax.with_sharding_constraint(t, repl), variables)


# ---------------------------------------------------------------------------
# Distributed drivers: same code paths as calibration/calibrate.py, with the
# inputs (and optionally weights) sharded.  jit compiles one SPMD program.
# ---------------------------------------------------------------------------

def calibrate_sharded(model, variables: dict, batches, mesh: Mesh, *,
                      num_batches: Optional[int] = None,
                      tensor_parallel: bool = False,
                      quant_w: bool = True, quant_a: bool = True) -> dict:
    """Data-parallel (optionally tensor-parallel) calibration.

    Each global batch is sharded over the 'data' axis; estimator reductions
    become psum/pmin/pmax-equivalent collectives inserted by XLA.  Matches
    single-chip numerics exactly for current/all-minmax and MSE estimators
    (they are order-free reductions); running-minmax EMA sees global batches
    in order, giving multi-host runs a defined semantics (SURVEY.md §7).
    """
    from fp8_quantization_tpu.calibration.calibrate import calibrate

    place = shard_variables if tensor_parallel else replicate_variables
    variables = place(mesh, variables)
    shard = batch_sharding(mesh)

    def _sharded_batches():
        for i, b in enumerate(batches):
            if num_batches is not None and i >= num_batches:
                break
            x = b[0] if isinstance(b, (tuple, list)) else b
            yield jax.device_put(x, shard)

    return calibrate(model, variables, _sharded_batches(),
                     quant_w=quant_w, quant_a=quant_a)


def evaluate_sharded(model, variables: dict, batches, mesh: Mesh, *,
                     tensor_parallel: bool = False,
                     max_batches: Optional[int] = None, **kw) -> dict:
    """Data-parallel evaluation (global batch sharded over 'data')."""
    from fp8_quantization_tpu.calibration.calibrate import evaluate

    place = shard_variables if tensor_parallel else replicate_variables
    variables = place(mesh, variables)
    shard = batch_sharding(mesh)

    def _sharded_batches():
        for x, y in batches:
            yield jax.device_put(x, shard), jax.device_put(y, shard)

    return evaluate(model, variables, _sharded_batches(),
                    max_batches=max_batches, **kw)


def shard_qat_state(mesh: Mesh, state, tensor_parallel: bool = False):
    """Place a QATState for mesh execution (dp replicated or dp+tp sharded).
    Gradient all-reduce over 'data' is inserted by XLA at jit time."""
    place = shard_variables if tensor_parallel else replicate_variables
    import dataclasses as dc

    return dc.replace(
        state,
        params=place(mesh, state.params),
        quant_train=place(mesh, state.quant_train),
        quant_frozen=place(mesh, state.quant_frozen),
        batch_stats=place(mesh, state.batch_stats),
        opt_state=place(mesh, state.opt_state),
        quant_opt_state=place(mesh, state.quant_opt_state),
        step=jax.device_put(state.step, replicated(mesh)))
