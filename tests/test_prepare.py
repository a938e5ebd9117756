"""Deployment preparation: frozen quantizer consts must be bit-exact.

prepare_inference (nn/bake.py) hoists the fixed-mode FP8 scalar algebra
(~20 ops per quantizer, fp8_ops.fp8_fixed_consts) out of the per-step graph
into the 'qprep' collection.  These tests pin the contract: prepared
inference is BIT-identical to the unprepared path, per engine, including
after weight baking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.bake import bake_weights, prepare_for_deployment
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.ops import fp8 as fp8_ops
from tests._tiny import TinyModel, japply


def _setup(engine):
    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
        weight_range_method="current_minmax", act_range_method="allminmax",
        engine=engine)
    model = TinyModel(config=cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 16, 16, 3)), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, calibrate(model, v, [x]), x


@pytest.mark.parametrize("engine", ["parity", "bf16"])
def test_prepared_deployment_bit_exact(engine):
    model, v, x = _setup(engine)
    y_ref = japply(model, v, x, mode="fixed")
    v2 = prepare_for_deployment(model, v, x[:1])
    assert "qprep" in v2
    y_prep = japply(model, v2, x, mode="fixed", quant_w=False)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_prep))


def test_prepared_matches_bake_only(engine="bf16"):
    """qprep adds nothing numerically on top of bake (pure graph transform)."""
    model, v, x = _setup(engine)
    vb = bake_weights(model, v, x[:1])
    y_baked = japply(model, vb, x, mode="fixed", quant_w=False)
    vp = prepare_for_deployment(model, v, x[:1])
    y_prep = japply(model, vp, x, mode="fixed", quant_w=False)
    np.testing.assert_array_equal(np.asarray(y_baked), np.asarray(y_prep))


def test_fp8_quantize_prepared_matches_op_level():
    """Op-level: fp8_quantize_prepared == quantize_to_fp8, bit for bit,
    across maxvals/mantissa settings, normalized and full-scale."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(0, 3, (64, 64)), jnp.float32)
    for mbits in (2.0, 3.0, 4.0, 5.0):
        for maxval in (0.3, 1.0, 57.344):
            mv = jnp.asarray(maxval, jnp.float32)
            mb = jnp.asarray(mbits, jnp.float32)
            c = fp8_ops.fp8_fixed_consts(mv, mb)
            for normalized in (False, True):
                ref = fp8_ops.quantize_to_fp8(x, mv, mb,
                                              normalized=normalized)
                prep = fp8_ops.fp8_quantize_prepared(x, c,
                                                     normalized=normalized)
                np.testing.assert_array_equal(np.asarray(ref),
                                              np.asarray(prep))


def test_init_does_not_create_qprep():
    """model.init must NOT sow stale consts (they would shadow calibration)."""
    model, v, x = _setup("bf16")
    assert "qprep" not in v


def test_prepare_for_deployment_host_matches_device():
    """The host-CPU prepare variant (used by bench.py to dodge eager tunnel
    latency) produces variables whose forward is bit-identical to the plain
    prepare's, and the tree structure matches exactly."""
    from fp8_quantization_tpu.nn.bake import prepare_for_deployment_host

    model, v, x = _setup("bf16")
    v_dev = prepare_for_deployment(model, v, x[:1])
    v_host = prepare_for_deployment_host(model, v,
                                         example_shape=(1, 16, 16, 3))
    assert (jax.tree_util.tree_structure(v_dev)
            == jax.tree_util.tree_structure(v_host))
    y_dev = japply(model, v_dev, x, mode="fixed", quant_w=False)
    y_host = japply(model, v_host, x, mode="fixed", quant_w=False)
    np.testing.assert_array_equal(np.asarray(y_dev), np.asarray(y_host))
