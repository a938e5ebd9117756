"""Multi-host (multi-process) execution glue.

On a multi-host TPU slice each host runs this same program; after
``initialize()`` the mesh in parallel/api.py spans all hosts' devices and the
sharded calibration/eval/QAT paths work unchanged — estimator reductions and
gradient all-reduces ride ICI/DCN via the collectives XLA inserts.

The reference has no distributed support at all (SURVEY.md §2); this module
is the "≥2 hosts" leg of BASELINE.md's scaling axis.  It cannot be exercised
on a single-host dev box beyond the virtual-device mesh used by the tests;
on a real slice, launch one process per host with the standard JAX
coordinator env (or GKE/TPU-VM auto-detection).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

log = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed (no-op on single process).

    With no arguments, relies on TPU-VM / cluster auto-detection; pass the
    coordinator explicitly for manual launches:
      initialize("host0:1234", num_processes=2, process_id=<0|1>)

    Returns a dict with process/device topology for logging and data
    sharding (``shard_id``/``num_shards`` feed data/imagenet.py loaders).
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        # feed these to make_dataloaders so hosts read disjoint data shards
        "shard_id": jax.process_index(),
        "num_shards": jax.process_count(),
    }
    log.info("distributed topology: %s", info)
    return info


def host_local_batch_to_global(mesh, x):
    """Assemble a global sharded array from per-host local batches.

    Each host passes its local shard (the output of its sharded dataloader);
    the result is one global array laid out over the mesh's 'data' axis —
    the input format calibrate_sharded / evaluate_sharded expect.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
    return jax.make_array_from_process_local_data(sharding, x, global_shape)
