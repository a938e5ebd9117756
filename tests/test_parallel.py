"""Multi-chip sharding on the 8-virtual-device CPU mesh (SURVEY.md §4:
TPU-native analogue of multi-node tests without a cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.calibration.calibrate import calibrate, evaluate
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.parallel import (
    calibrate_sharded, evaluate_sharded, gather_weights, make_mesh,
    replicated, shard_batch, shard_qat_state, shard_variables)
from tests._tiny import TinyModel

FP8 = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    weight_range_method="current_minmax", act_range_method="allminmax")


def _data(n=16, size=16, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.normal(0, 1, (n, size, size, 3)), jnp.float32)
    y = jnp.asarray(rng.randint(0, classes, n), jnp.int32)
    return x, y


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(model=2)  # data inferred = 4 on 8 devices
    assert mesh.shape["data"] == len(jax.devices()) // 2
    with pytest.raises(ValueError):
        make_mesh(data=3, model=3)


def test_shard_variables_tp_rules():
    model = TinyModel(config=FP8)
    x, _ = _data()
    variables = model.init(jax.random.PRNGKey(0), x)
    mesh = make_mesh(data=4, model=2)
    v = shard_variables(mesh, variables)
    # conv kernel (3,3,3,8): last dim divisible by 2 -> sharded over model
    spec = v["params"]["conv1"]["kernel"].sharding.spec
    assert spec[-1] == "model"
    # per-channel maxval (8,) sharded the same way
    spec_q = v["quant"]["conv1"]["weight_q"]["q"]["maxval"].sharding.spec
    assert spec_q[-1] == "model"
    # scalars replicated
    assert v["quant"]["conv1"]["weight_q"]["q"]["mantissa_bits"].sharding.spec == ()


@pytest.mark.parametrize("tp", [False, True], ids=["dp", "dp+tp"])
def test_sharded_calibration_matches_single_device(tp):
    model = TinyModel(config=FP8)
    x, y = _data()
    variables = model.init(jax.random.PRNGKey(0), x)

    ref = calibrate(model, variables, [x])
    mesh = make_mesh(data=4, model=2 if tp else 1)
    out = calibrate_sharded(model, variables, [x], mesh, tensor_parallel=tp)

    # min/max reductions are order-free: sharded == single-device (bitwise-ish)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        ref["quant"], jax.tree.map(np.asarray, out["quant"]))


def test_sharded_eval_matches_single_device():
    model = TinyModel(config=FP8)
    x, y = _data()
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])

    ref = evaluate(model, variables, [(x, y)])
    mesh = make_mesh(data=8, model=1)
    out = evaluate_sharded(model, variables, [(x, y)], mesh)
    assert out["num_examples"] == ref["num_examples"]
    np.testing.assert_allclose(out["top_1_accuracy"], ref["top_1_accuracy"])
    np.testing.assert_allclose(out["loss"], ref["loss"], rtol=1e-5)


def test_weight_gather_tp_matches_single_device():
    """Weight-gather tp inference (variables sharded in HBM, gathered at
    jit entry — parallel/api.gather_weights) == single-device forward."""
    model = TinyModel(config=FP8)
    x, _ = _data()
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])

    ref = model.apply(variables, x, mode="fixed")

    mesh = make_mesh(data=1, model=8)
    sharded = shard_variables(mesh, variables)
    xr = jax.device_put(x, replicated(mesh))
    fn = jax.jit(lambda v, xx: model.apply(gather_weights(mesh, v), xx,
                                           mode="fixed"),
                 out_shardings=replicated(mesh))
    out = fn(sharded, xr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_sharded_qat_step():
    from fp8_quantization_tpu.training import (
        init_qat_state, make_optimizer, make_train_step)

    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
        fp8_learn_maxval=True, weight_range_method="current_minmax")
    model = TinyModel(config=cfg)
    x, y = _data()
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    state, aux = init_qat_state(variables, cfg, make_optimizer("SGD", 1e-2))

    mesh = make_mesh(data=4, model=2)
    state = shard_qat_state(mesh, state, tensor_parallel=True)
    step = make_train_step(model, aux, mode="learn", donate=False)
    new_state, metrics = step(state, shard_batch(mesh, x),
                              shard_batch(mesh, y))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_graft_entry_dryrun():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
