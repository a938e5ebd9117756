"""Subprocess body for the 2-process distributed calibration test.

Usage: python _multihost_prog.py <process_id> <port>
Each process owns 4 virtual CPU devices (8 global).  Process 0 prints the
calibrated stem maxvals as JSON on the last line.
"""

import json
import os
import sys

pid, port = int(sys.argv[1]), sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fp8_quantization_tpu.nn.config import make_layer_config  # noqa: E402
from fp8_quantization_tpu.parallel import (  # noqa: E402
    host_local_batch_to_global, initialize, make_mesh)
from tests._tiny import TinyModel  # noqa: E402

info = initialize(coordinator_address=f"localhost:{port}",
                  num_processes=2, process_id=pid)
assert info["global_devices"] == 8, info

FP8 = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    weight_range_method="current_minmax", act_range_method="allminmax")

model = TinyModel(config=FP8)

# the full 16-sample batch, identical on every process (seeded); each process
# contributes its own half, exactly like per-host data loaders would
x_full = np.random.RandomState(0).normal(0, 1, (16, 16, 16, 3)).astype(np.float32)
x_local = jnp.asarray(x_full[pid * 8:(pid + 1) * 8])

variables = model.init(jax.random.PRNGKey(0), x_local)
mesh = make_mesh(data=8, model=1)
x_global = host_local_batch_to_global(mesh, x_local)

from fp8_quantization_tpu.calibration.calibrate import calibrate  # noqa: E402
from fp8_quantization_tpu.parallel import replicate_variables  # noqa: E402

variables = replicate_variables(mesh, variables)
variables = calibrate(model, variables, [x_global])

stem_maxval = np.asarray(
    jax.device_get(variables["quant"]["conv1"]["weight_q"]["q"]["maxval"]))
act_xmax = float(np.asarray(jax.device_get(
    variables["quant"]["conv1"]["act_q"]["est"]["xmax"])))
if pid == 0:
    print("RESULT " + json.dumps(
        {"stem_maxval": stem_maxval.tolist(), "act_xmax": act_xmax}))
