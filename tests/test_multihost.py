"""True multi-process distributed calibration (2 processes x 4 virtual CPU
devices = 8 global) vs the single-process result — the TPU-native analogue of
a multi-node test without a cluster (SURVEY.md §4)."""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.config import make_layer_config
from tests._tiny import TinyModel

FP8 = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    weight_range_method="current_minmax", act_range_method="allminmax")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_calibration_matches_single_process():
    port = _free_port()
    prog = os.path.join(os.path.dirname(__file__), "_multihost_prog.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}

    procs = [subprocess.Popen(
        [sys.executable, prog, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=280) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{so}\n{se[-3000:]}"

    result_line = [l for l in outs[0][0].splitlines()
                   if l.startswith("RESULT ")][-1]
    dist = json.loads(result_line[len("RESULT "):])

    # single-process reference on the identical full batch
    x_full = jnp.asarray(np.random.RandomState(0).normal(
        0, 1, (16, 16, 16, 3)).astype(np.float32))
    model = TinyModel(config=FP8)
    variables = model.init(jax.random.PRNGKey(0), x_full[:8])
    variables = calibrate(model, variables, [x_full])

    np.testing.assert_allclose(
        np.asarray(dist["stem_maxval"]),
        np.asarray(variables["quant"]["conv1"]["weight_q"]["q"]["maxval"]),
        rtol=1e-6)
    np.testing.assert_allclose(
        dist["act_xmax"],
        float(np.asarray(variables["quant"]["conv1"]["act_q"]["est"]["xmax"])),
        rtol=1e-5)
