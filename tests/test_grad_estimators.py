"""QAT gradient-estimator surrogates wired through the quantizer spec.

Reference: rounding_utils.py (StochasticRounding, EWGS, StackedSigmoid) —
infrastructure the reference ships for QAT experiments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.ops.rounding import (
    ewgs_round, round_ste, stacked_sigmoid_round, stochastic_round_ste)
from tests._tiny import TinyModel


def test_ste_gradient_is_identity():
    g = jax.grad(lambda x: jnp.sum(round_ste(x)))(jnp.asarray([0.3, 1.7]))
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0])


def test_ewgs_gradient_scales_with_residual():
    x = jnp.asarray([0.3])
    g = jax.grad(lambda x: jnp.sum(ewgs_round(x, jnp.asarray(0.2))))(x)
    # grad = 1 + delta*sign(g)*(x - round(x)) = 1 + 0.2*1*0.3
    np.testing.assert_allclose(np.asarray(g), [1.06], rtol=1e-6)


def test_stacked_sigmoid_gradient_peaks_at_bin_center():
    grad = jax.grad(
        lambda x: jnp.sum(stacked_sigmoid_round(x, jnp.asarray(4.0))))
    g_mid = float(grad(jnp.asarray([0.5]))[0])
    g_edge = float(grad(jnp.asarray([0.05]))[0])
    assert g_mid > g_edge > 0


def test_stochastic_round_expectation():
    key = jax.random.PRNGKey(0)
    x = jnp.full((20000,), 0.3)
    out = stochastic_round_ste(x, key)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}
    np.testing.assert_allclose(float(jnp.mean(out)), 0.3, atol=0.02)


@pytest.mark.parametrize("est", ["ewgs", "stacked_sigmoid", "stoch_round"])
def test_model_learn_mode_with_estimator(est):
    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
        grad_estimator=est)
    model = TinyModel(config=cfg)
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (2, 16, 16, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])

    def loss(params):
        return jnp.sum(model.apply(
            {**variables, "params": params}, x, mode="learn",
            rngs={"quant_noise": jax.random.PRNGKey(1)}) ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # surrogate gradients differ from plain STE
    if est != "stoch_round":
        def loss_ste(params):
            m2 = TinyModel(config=make_layer_config(
                qmethod="fp_quantizer", per_channel_weights=True,
                fp8_set_maxval=True))
            return jnp.sum(m2.apply({**variables, "params": params}, x,
                                    mode="learn") ** 2)
        g2 = jax.grad(loss_ste)(variables["params"])
        diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                 for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g2))]
        assert max(diffs) > 0
