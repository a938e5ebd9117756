"""QuantLayerNorm: the transformer-facing layer the reference ships
(autoquant_utils.py:166-174) but never exercises with its CNN zoo."""

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.nn.layers import QuantLayerNorm

CFG = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    weight_range_method="current_minmax", act_range_method="allminmax")


def _x(seed=0, shape=(4, 10, 32)):
    return jnp.asarray(np.random.RandomState(seed).normal(0, 2, shape),
                       jnp.float32)


def test_layernorm_calibrate_and_apply():
    ln = QuantLayerNorm(config=CFG)
    x = _x()
    variables = ln.init(jax.random.PRNGKey(0), x)
    assert "quant" in variables
    variables = calibrate(ln, variables, [x])

    y = ln.apply(variables, x, mode="fixed")
    assert y.shape == x.shape
    # output is quantized: distinct-value count bounded by the 8-bit grid
    # per quantization scale region (scalar act quantizer -> <=256 values)
    assert len(np.unique(np.asarray(y))) <= 256

    # fp32 passthrough differs and is approximately normalized
    y_fp = ln.apply(variables, x, mode="fixed", quant_w=False, quant_a=False)
    assert not np.allclose(np.asarray(y), np.asarray(y_fp))
    np.testing.assert_allclose(np.mean(np.asarray(y_fp), -1), 0, atol=1e-4)


def test_layernorm_gamma_quantized_per_channel():
    ln = QuantLayerNorm(config=CFG)
    x = _x(1)
    variables = ln.init(jax.random.PRNGKey(0), x)
    variables = calibrate(ln, variables, [x])
    wq = variables["quant"]["weight_q"]["q"]
    assert wq["maxval"].shape == (32,)   # per-channel over features
    assert bool(wq["initialized"])
