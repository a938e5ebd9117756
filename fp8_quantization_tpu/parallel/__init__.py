from fp8_quantization_tpu.parallel.api import (  # noqa: F401
    batch_sharding, calibrate_sharded, evaluate_sharded, gather_weights,
    make_mesh, replicate_variables, replicated, shard_batch, shard_qat_state,
    shard_variables)
from fp8_quantization_tpu.parallel.multihost import (  # noqa: F401
    host_local_batch_to_global, initialize)
