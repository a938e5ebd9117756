"""Weight baking: precomputed fake-quant kernels == per-step weight quant."""

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.bake import bake_weights
from fp8_quantization_tpu.nn.config import make_layer_config
from tests._tiny import TinyModel, japply

FP8 = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    weight_range_method="current_minmax", act_range_method="allminmax")


def _setup():
    model = TinyModel(config=FP8)
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (2, 16, 16, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, calibrate(model, variables, [x]), x


def test_baked_eval_bit_identical():
    model, variables, x = _setup()
    y_ref = japply(model, variables, x, mode="fixed")

    baked = bake_weights(model, variables, x)
    y_baked = japply(model, baked, x, mode="fixed", quant_w=False)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_baked))

    # kernels actually changed (they're now on the FP8 grid)
    assert not np.array_equal(
        np.asarray(variables["params"]["conv1"]["kernel"]),
        np.asarray(baked["params"]["conv1"]["kernel"]))


def test_bake_idempotent():
    model, variables, x = _setup()
    baked1 = bake_weights(model, variables, x)
    baked2 = bake_weights(model, baked1, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        baked1["params"], baked2["params"])


def test_bake_leaves_other_collections_untouched():
    model, variables, x = _setup()
    baked = bake_weights(model, variables, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["quant"], baked["quant"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["batch_stats"], baked["batch_stats"])


def test_bake_with_folded_bn_no_double_scaling():
    """bn_mode='folded': baking stores the BN-folded quantized kernel and
    neutralizes the layer's BN params so the eval-time fold is the identity
    — without this, outputs were scaled by gamma/sqrt(var+eps) twice
    (code-review finding)."""
    import dataclasses

    cfg = dataclasses.replace(FP8, bn_mode="folded")
    model = TinyModel(config=cfg)
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (2, 16, 16, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats so double-folding would be glaring
    rng = np.random.RandomState(3)
    variables = {**variables, "batch_stats": jax.tree.map(
        lambda v: jnp.asarray(np.abs(rng.normal(1.0, 0.3, v.shape))
                              .astype(np.float32)), variables["batch_stats"])}
    variables = calibrate(model, variables, [x])

    y_ref = japply(model, variables, x, mode="fixed")
    baked = bake_weights(model, variables, x)
    y_baked = japply(model, baked, x, mode="fixed", quant_w=False)
    np.testing.assert_allclose(np.asarray(y_baked), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
