"""QAT training path: optimizers, quant-param partition, train step, BN
re-estimation (reference: SURVEY.md §3.4 dormant QAT infra, wired here)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.training import (
    init_qat_state, make_optimizer, make_schedule, make_train_step,
    merge_quant, quant_trainable_mask, reestimate_bn_stats, train_epoch)
from tests._tiny import TinyModel

FP8_LEARN = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    fp8_learn_maxval=True, fp8_learn_mantissa_bits=True,
    weight_range_method="current_minmax", act_range_method="allminmax")

INT8 = make_layer_config(
    qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
    per_channel_weights=True)


def _data(n=8, size=16, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.normal(0, 1, (n, size, size, 3)), jnp.float32)
    y = jnp.asarray(rng.randint(0, classes, n), jnp.int32)
    return x, y


def _calibrated(config):
    model = TinyModel(config=config)
    x, y = _data()
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    return model, variables, x, y


def test_trainable_mask_fp8_learn_flags():
    model, variables, x, y = _calibrated(FP8_LEARN)
    mask = quant_trainable_mask(variables["quant"], FP8_LEARN)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    trainable = {jax.tree_util.keystr(p) for p, v in flat if v}
    # maxval + mantissa_bits trainable, nothing else
    assert any("maxval" in k for k in trainable)
    assert any("mantissa_bits" in k for k in trainable)
    assert all(("maxval" in k) or ("mantissa_bits" in k) for k in trainable)
    assert not any("est" in k for k in trainable)


def test_trainable_mask_uniform_delta():
    model, variables, x, y = _calibrated(INT8)
    mask = quant_trainable_mask(variables["quant"], INT8)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    trainable = {jax.tree_util.keystr(p) for p, v in flat if v}
    assert any("delta" in k for k in trainable)
    # zero_float trainable for the asymmetric act quantizers
    assert any("zero_float" in k for k in trainable)
    assert not any("signed" in k or "initialized" in k for k in trainable)


def test_train_step_learns_and_updates_quant_params():
    model, variables, x, y = _calibrated(FP8_LEARN)
    state, aux = init_qat_state(
        variables, FP8_LEARN, make_optimizer("SGD", 1e-2),
        make_optimizer("SGD", 1e-2))
    step = make_train_step(model, aux, mode="learn", donate=False)

    maxval0 = jax.tree.map(
        lambda v: None if v is None else np.asarray(v), state.quant_train)
    losses = []
    for i in range(5):
        state, metrics = step(state, x, y)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # SGD on a fixed batch must reduce loss

    # some trainable quant leaf actually moved
    moved = jax.tree.map(
        lambda a, b: None if a is None else float(np.max(np.abs(a - b))),
        maxval0, state.quant_train, is_leaf=lambda v: v is None)
    deltas = [v for v in jax.tree.leaves(moved) if v is not None]
    assert deltas and max(deltas) > 0


def test_train_step_calibrate_train_updates_ranges():
    model, variables, x, y = _calibrated(FP8_LEARN)
    state, aux = init_qat_state(variables, FP8_LEARN,
                                make_optimizer("SGD", 1e-2))
    # train_bn=False: with batch-stats BN a scaled input batch is normalized
    # back to identical activations, so the range would (correctly) not move
    step = make_train_step(model, aux, mode="calibrate_train",
                           train_bn=False, donate=False)
    q0 = jax.tree.map(np.asarray, state.quant)
    state, metrics = step(state, x, y)
    # scaled-up batch strictly expands the allminmax running range
    state, metrics = step(state, _data(seed=3)[0] * 2.0, y)
    q1 = state.quant
    # act estimator carries updated during training (estimate_ranges_train)
    est0 = q0["conv1"]["act_q"]["est"]["xmax"]
    est1 = np.asarray(q1["conv1"]["act_q"]["est"]["xmax"])
    assert not np.allclose(est0, est1)
    assert np.isfinite(float(metrics["loss"]))


def test_frozen_quant_leaves_do_not_move():
    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
        fp8_learn_maxval=False, weight_range_method="current_minmax")
    model, variables, x, y = _calibrated(cfg)
    state, aux = init_qat_state(variables, cfg, make_optimizer("SGD", 1e-2))
    # nothing trainable in quant state -> quant_train has no arrays
    assert not [v for v in jax.tree.leaves(state.quant_train) if v is not None]
    step = make_train_step(model, aux, mode="learn", donate=False)
    q_before = jax.tree.map(np.asarray, state.quant)
    state, _ = step(state, x, y)
    jax.tree.map(np.testing.assert_allclose, q_before,
                 jax.tree.map(np.asarray, state.quant))


def test_reestimate_bn_stats_averages_batch_stats():
    model, variables, x, y = _calibrated(FP8_LEARN)
    x2 = _data(seed=7)[0]
    out = reestimate_bn_stats(model, variables, [x, x2], num_batches=2)

    # manual: batch stats of conv1 output pre-BN, averaged over both batches
    new_mean = np.asarray(out["batch_stats"]["conv1"]["mean"])
    assert new_mean.shape == (8,)
    assert not np.allclose(new_mean,
                           np.asarray(variables["batch_stats"]["conv1"]["mean"]))
    # running stats replaced, everything else untouched
    np.testing.assert_allclose(
        np.asarray(out["params"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["conv1"]["kernel"]))


def test_reestimate_bn_stats_exact_single_batch():
    """With one batch, re-estimated stats == that batch's stats exactly:
    verified against a direct computation of the conv output."""
    cfg = make_layer_config(qmethod="fp_quantizer", fp8_set_maxval=True)
    model = TinyModel(config=cfg)
    x, _ = _data()
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    out = reestimate_bn_stats(model, variables, [x], num_batches=1)

    # independent recomputation: quantized conv1 pre-BN output
    from fp8_quantization_tpu.ops import quantizer as q

    k = variables["params"]["conv1"]["kernel"]
    spec = cfg.weight_quant
    wq = q.apply(spec, variables["quant"]["conv1"]["weight_q"]["q"], k)
    y = jax.lax.conv_general_dilated(
        x, wq, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mean = np.mean(np.asarray(y), axis=(0, 1, 2))
    n = y.size / y.shape[-1]
    var = np.var(np.asarray(y), axis=(0, 1, 2)) * n / (n - 1)
    np.testing.assert_allclose(np.asarray(out["batch_stats"]["conv1"]["mean"]),
                               mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["batch_stats"]["conv1"]["var"]),
                               var, rtol=1e-3, atol=1e-5)


def test_train_epoch_runs():
    model, variables, x, y = _calibrated(FP8_LEARN)
    state, aux = init_qat_state(variables, FP8_LEARN,
                                make_optimizer("Adam", 1e-3))
    state, metrics = train_epoch(model, state, aux, [(x, y), (x, y)])
    assert set(metrics) == {"loss", "accuracy"}
    assert int(state.step) == 2


def test_make_schedule_variants():
    s = make_schedule(0.1, "multistep:2:4")     # steps_per_epoch=1
    assert np.isclose(s(0), 0.1) and np.isclose(s(3), 0.01)
    assert np.isclose(s(5), 0.001)
    # reference semantics: milestones are EPOCHS (MultiStepLR stepped
    # per epoch); converted via steps_per_epoch
    s2 = make_schedule(0.1, "multistep:2", steps_per_epoch=100)
    assert np.isclose(s2(199), 0.1) and np.isclose(s2(201), 0.01)
    # reference semantics: cosine:<eta_min> anneals lr -> ABSOLUTE eta_min
    c = make_schedule(0.1, "cosine:0.01", max_steps=10)
    assert np.isclose(c(0), 0.1) and np.isclose(c(10), 0.01)
    assert make_schedule(0.1, None) == 0.1


def test_make_optimizer_variants():
    for name in ("SGD", "Adam"):
        tx = make_optimizer(name, 1e-3, weight_decay=1e-4)
        assert isinstance(tx, optax.GradientTransformation)
    with pytest.raises(ValueError):
        make_optimizer("bogus", 1e-3)


def test_train_step_with_remat_matches():
    """jax.checkpoint rematerialization changes memory, not math."""
    model, variables, x, y = _calibrated(FP8_LEARN)
    state1, aux1 = init_qat_state(variables, FP8_LEARN,
                                  make_optimizer("SGD", 1e-2))
    state2, aux2 = init_qat_state(variables, FP8_LEARN,
                                  make_optimizer("SGD", 1e-2))
    s1, m1 = make_train_step(model, aux1, donate=False)(state1, x, y)
    s2, m2 = make_train_step(model, aux2, donate=False, remat=True)(state2, x, y)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        s1.params, s2.params)
