"""QuantConv1d / QuantConvTranspose (reference: autoquant_utils.py:20-86)."""

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn import QuantConv1d, QuantConvTranspose
from fp8_quantization_tpu.nn.config import make_layer_config

CFG = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    weight_range_method="current_minmax", act_range_method="allminmax")


def test_conv1d_calibrate_and_apply():
    layer = QuantConv1d(features=12, kernel_size=5, strides=2,
                        padding=((2, 2),), bn=True, activation="relu",
                        config=CFG)
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (4, 40, 6)),
                    jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    variables = calibrate(layer, variables, [x])
    y = layer.apply(variables, x, mode="fixed")
    assert y.shape == (4, 20, 12)
    # per-channel weight maxvals over the LAST kernel axis (out channels)
    assert variables["quant"]["weight_q"]["q"]["maxval"].shape == (12,)
    k = np.asarray(variables["params"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(variables["quant"]["weight_q"]["q"]["maxval"]),
        np.max(np.abs(k), axis=(0, 1)), rtol=1e-6)


def test_conv_transpose_calibrate_and_apply():
    layer = QuantConvTranspose(features=8, kernel_size=(4, 4),
                               strides=(2, 2), config=CFG)
    x = jnp.asarray(np.random.RandomState(1).normal(0, 1, (2, 8, 8, 4)),
                    jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    variables = calibrate(layer, variables, [x])
    y = layer.apply(variables, x, mode="fixed")
    assert y.shape == (2, 16, 16, 8)
    # per-channel over out channels without any transpose trick
    assert variables["quant"]["weight_q"]["q"]["maxval"].shape == (8,)
    q = layer.apply(variables, x, mode="fixed", quant_w=False, quant_a=False)
    assert not np.allclose(np.asarray(y), np.asarray(q))
