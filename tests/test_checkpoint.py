"""Orbax checkpoint round trip for variables and QAT states."""

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.utils.checkpoint import (
    latest_step, restore_checkpoint, save_checkpoint)
from tests._tiny import TinyModel

CFG = make_layer_config(qmethod="fp_quantizer", per_channel_weights=True,
                        fp8_set_maxval=True)


def _variables():
    model = TinyModel(config=CFG)
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (2, 16, 16, 3)),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    return calibrate(model, v, [x])


def test_variables_round_trip(tmp_path):
    v = _variables()
    save_checkpoint(str(tmp_path / "ck"), v, step=3)
    assert latest_step(str(tmp_path / "ck")) == 3
    restored = restore_checkpoint(str(tmp_path / "ck"), v)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v, restored)


def test_keep_pruning(tmp_path):
    v = _variables()
    for s in (1, 2, 3):
        save_checkpoint(str(tmp_path / "ck"), v, step=s, keep=2)
    import os

    steps = sorted(d for d in os.listdir(tmp_path / "ck"))
    assert steps == ["step_2", "step_3"]
    # restore of an explicitly-named older step still works
    restored = restore_checkpoint(str(tmp_path / "ck"), v, step=2)
    assert restored["params"].keys() == v["params"].keys()
