"""Functional range-estimator folds vs reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.calibration import estimators as est
from fp8_quantization_tpu.ops.quantizer import QMethod, QuantizerSpec


def _view(x, per_channel=False):
    """Channel-major (C, N) view; per-tensor -> (1, N)."""
    x = np.asarray(x, np.float32)
    return jnp.asarray(x.reshape(1, -1) if not per_channel else x)


FP8 = QuantizerSpec(method=QMethod.fp_quantizer, set_maxval=True)


def test_current_minmax():
    spec = est.EstimatorSpec(kind=est.RangeEstimators.current_minmax)
    state = est.init_state(spec, FP8, None)
    _, lo, hi, _ = est.update(spec, FP8, state, _view([-3.0, 1.0, 2.0]))
    assert float(lo) == -3.0 and float(hi) == 2.0
    # second batch replaces (no memory)
    _, lo, hi, _ = est.update(spec, FP8, state, _view([-1.0, 0.5]))
    assert float(lo) == -1.0 and float(hi) == 0.5


def test_current_minmax_percentile():
    spec = est.EstimatorSpec(kind=est.RangeEstimators.current_minmax, percentile=10.0)
    data = np.linspace(0.0, 100.0, 101)
    _, lo, hi, _ = est.update(spec, FP8, est.init_state(spec, FP8, None), _view(data))
    assert float(lo) == pytest.approx(10.0, abs=0.5)
    assert float(hi) == pytest.approx(90.0, abs=0.5)


def test_allminmax_accumulates():
    spec = est.EstimatorSpec(kind=est.RangeEstimators.allminmax)
    state = est.init_state(spec, FP8, None)
    state, lo, hi, _ = est.update(spec, FP8, state, _view([-1.0, 2.0]))
    state, lo, hi, _ = est.update(spec, FP8, state, _view([-3.0, 1.0]))
    state, lo, hi, _ = est.update(spec, FP8, state, _view([-0.5, 5.0]))
    assert float(lo) == -3.0 and float(hi) == 5.0


def test_running_minmax_ema():
    spec = est.EstimatorSpec(kind=est.RangeEstimators.running_minmax, momentum=0.9)
    state = est.init_state(spec, FP8, None)
    state, lo, hi, _ = est.update(spec, FP8, state, _view([-1.0, 1.0]))
    assert float(hi) == 1.0
    state, lo, hi, _ = est.update(spec, FP8, state, _view([-2.0, 3.0]))
    # EMA: 0.1*new + 0.9*old
    assert float(hi) == pytest.approx(0.1 * 3.0 + 0.9 * 1.0)
    assert float(lo) == pytest.approx(0.1 * -2.0 + 0.9 * -1.0)


def test_allminmax_per_channel_shapes():
    qspec = FP8.replace(per_channel=True)
    spec = est.EstimatorSpec(kind=est.RangeEstimators.allminmax)
    state = est.init_state(spec, qspec, 4)
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (4, 100)), jnp.float32)
    state, lo, hi, _ = est.update(spec, qspec, state, x)
    assert lo.shape == (4,) and hi.shape == (4,)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(x).min(axis=1))


def test_mse_search_picks_argmin_of_true_mse():
    """Independent oracle: for the winning mantissa setting, the chosen maxval
    must be the argmin of directly-computed MSE over the 111-point grid."""
    from fp8_quantization_tpu.ops import fp8 as fp8_ops

    rng = np.random.RandomState(0)
    data = rng.normal(0, 1, 2048).astype(np.float32)
    data[0] = 50.0  # outlier stretches the search grid
    spec = est.EstimatorSpec(kind=est.RangeEstimators.MSE)
    state = est.init_state(spec, FP8, None)
    state, lo, hi, upd = est.update(spec, FP8, state, _view(data))
    chosen_maxval = float(hi)
    assert "mantissa_bits" in upd
    assert float(lo) == pytest.approx(-chosen_maxval)

    x = jnp.asarray(data)
    grid = np.linspace(0.1 * 50.0, 1.2 * 50.0, est.MSE_NUM_CANDIDATES)
    true_mses = np.array([
        float(jnp.mean((x - fp8_ops.quantize_to_fp8(
            x, jnp.float32(mv), upd["mantissa_bits"])) ** 2))
        for mv in grid])
    assert chosen_maxval == pytest.approx(grid[np.argmin(true_mses)], rel=1e-5)


def test_mse_accumulates_across_batches():
    spec = est.EstimatorSpec(kind=est.RangeEstimators.MSE)
    state = est.init_state(spec, FP8, None)
    rng = np.random.RandomState(1)
    state, _, hi1, _ = est.update(spec, FP8, state, _view(rng.normal(0, 1, 2048)))
    mses_after_1 = np.asarray(state["mses"]).copy()
    state, _, hi2, _ = est.update(spec, FP8, state, _view(rng.normal(0, 1, 2048)))
    assert np.all(np.asarray(state["mses"]) >= mses_after_1 - 1e-9)
    # search grid frozen after first batch
    assert bool(state["seen"])


def test_mse_per_channel_vote():
    qspec = FP8.replace(per_channel=True)
    spec = est.EstimatorSpec(kind=est.RangeEstimators.MSE)
    state = est.init_state(spec, qspec, 3)
    x = jnp.asarray(np.random.RandomState(2).normal(0, 1, (3, 512)), jnp.float32)
    state, lo, hi, upd = est.update(spec, qspec, state, x)
    assert hi.shape == (3,)
    mb = float(upd["mantissa_bits"])
    assert 1.0 <= mb <= 6.0


def test_mse_respects_fixed_mantissa():
    qspec = FP8.replace(mse_include_mantissa_bits=False, mantissa_bits=2)
    spec = est.EstimatorSpec(kind=est.RangeEstimators.MSE)
    state = est.init_state(spec, qspec, None)
    assert state["mses"].shape[0] == 1
    _, _, _, upd = est.update(spec, qspec, state,
                              _view(np.random.RandomState(3).normal(0, 1, 1024)))
    assert float(upd["mantissa_bits"]) == 2.0


def test_mse_int_path():
    qspec = QuantizerSpec(method=QMethod.symmetric_uniform, n_bits=8)
    spec = est.EstimatorSpec(kind=est.RangeEstimators.MSE)
    state = est.init_state(spec, qspec, None)
    _, lo, hi, upd = est.update(spec, qspec, state,
                                _view(np.random.RandomState(4).normal(0, 1, 1024)))
    assert float(hi) > 0 and upd == {}


def test_calibrate_stop_after_partial_forward():
    """Partial-forward calibration (reference StopForwardException,
    quantization/utils.py:108-113): layers after the target keep their
    pre-batch state and their compute is dead-code-eliminated."""
    import jax
    import numpy as np

    from fp8_quantization_tpu.calibration.calibrate import (
        calibrate, partial_quant_updates)
    from fp8_quantization_tpu.nn.config import make_layer_config
    from tests._tiny import TinyModel

    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
        weight_range_method="current_minmax", act_range_method="allminmax")
    model = TinyModel(config=cfg)
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (2, 16, 16, 3)),
                    jnp.float32)
    v0 = model.init(jax.random.PRNGKey(0), x)

    part = calibrate(model, v0, [x], stop_after="conv1")
    full = calibrate(model, v0, [x])

    # conv1 calibrated identically to the full pass
    jax.tree.map(np.testing.assert_allclose,
                 part["quant"]["conv1"], full["quant"]["conv1"])
    # conv2 / fc untouched (pre-batch state)
    jax.tree.map(np.testing.assert_allclose,
                 part["quant"]["conv2"], v0["quant"]["conv2"])
    jax.tree.map(np.testing.assert_allclose,
                 part["quant"]["fc"], v0["quant"]["fc"])

    # the downstream compute is actually ELIMINATED, not just discarded
    def step(stop):
        def f(qs, xx):
            _, upd = model.apply({**v0, "quant": qs}, xx, mode="calibrate",
                                 mutable=["quant"])
            q = upd["quant"]
            return partial_quant_updates(q, qs, stop) if stop else q
        return jax.jit(f).lower(v0["quant"], x).compile().cost_analysis()

    ca_full, ca_part = step(None), step("conv1")
    ca_full = ca_full[0] if isinstance(ca_full, (list, tuple)) else ca_full
    ca_part = ca_part[0] if isinstance(ca_part, (list, tuple)) else ca_part
    assert ca_part["flops"] < 0.7 * ca_full["flops"], (
        ca_part["flops"], ca_full["flops"])

    import pytest

    with pytest.raises(ValueError, match="matched no module"):
        calibrate(model, v0, [x], stop_after="nope")
