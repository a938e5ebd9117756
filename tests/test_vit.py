"""Quantized ViT: transformer-stack coverage (beyond the reference zoo)."""

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.calibration.calibrate import calibrate, evaluate
from fp8_quantization_tpu.models.vit import QuantizedViT
from fp8_quantization_tpu.nn.config import make_layer_config
from tests._tiny import japply

CFG = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    weight_range_method="current_minmax", act_range_method="allminmax")


def _tiny_vit(**kw):
    return QuantizedViT(num_classes=5, patch_size=4, dim=32, depth=2,
                        num_heads=2, mlp_ratio=2, config=CFG, **kw)


def test_vit_calibrate_eval():
    model = _tiny_vit()
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (2, 16, 16, 3)),
                    jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    assert "quant" in variables
    variables = calibrate(model, variables, [x])
    y = japply(model, variables, x, mode="fixed")
    assert y.shape == (2, 5)
    # quantization actually engages
    y_fp = japply(model, variables, x, mode="fixed",
                  quant_w=False, quant_a=False)
    assert not np.allclose(np.asarray(y), np.asarray(y_fp))

    ys = jnp.asarray(np.random.RandomState(1).randint(0, 5, 2), jnp.int32)
    m = evaluate(model, variables, [(x, ys)])
    assert 0.0 <= m["top_1_accuracy"] <= 1.0


def test_vit_qat_step():
    from fp8_quantization_tpu.training import (
        init_qat_state, make_optimizer, make_train_step)

    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
        fp8_learn_maxval=True)
    model = QuantizedViT(num_classes=5, patch_size=4, dim=32, depth=1,
                         num_heads=2, mlp_ratio=2, config=cfg)
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (4, 16, 16, 3)),
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randint(0, 5, 4), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    state, aux = init_qat_state(variables, cfg, make_optimizer("Adam", 1e-3))
    step = make_train_step(model, aux, donate=False)
    state, metrics = step(state, x, y)
    assert np.isfinite(float(metrics["loss"]))
