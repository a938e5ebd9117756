"""bn_mode='folded' (deployment folding) vs 'fp32_after' (reference parity).

With weight quantization OFF the two are mathematically identical (conv is
linear in w); with it ON they differ only by quantizing folded vs unfolded
weights (SURVEY.md §7 hard parts — both semantics supported by config).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.config import make_layer_config
from tests._tiny import TinyModel, japply

BASE = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    weight_range_method="current_minmax", act_range_method="allminmax")


def _setup(bn_mode, x):
    cfg = dataclasses.replace(BASE, bn_mode=bn_mode)
    model = TinyModel(config=cfg)
    return model, cfg


def _rand(n=4, size=16, seed=0):
    return jnp.asarray(np.random.RandomState(seed).normal(0, 1, (n, size, size, 3)),
                       jnp.float32)


def _nontrivial_bn_stats(variables, seed=3):
    """Random running stats so folding actually does something."""
    rng = np.random.RandomState(seed)
    bs = jax.tree.map(lambda v: jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, v.shape)).astype(np.float32)),
        variables["batch_stats"])
    return {**variables, "batch_stats": bs}


def test_folded_equals_fp32_after_without_weight_quant():
    x = _rand()
    model_ref, _ = _setup("fp32_after", x)
    variables = model_ref.init(jax.random.PRNGKey(0), x)
    variables = _nontrivial_bn_stats(variables)
    variables = calibrate(model_ref, variables, [x])

    y_ref = japply(model_ref, variables, x, mode="fixed", quant_w=False)
    model_fold, _ = _setup("folded", x)
    y_fold = japply(model_fold, variables, x, mode="fixed", quant_w=False)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_folded_close_with_weight_quant():
    x = _rand()
    model_ref, _ = _setup("fp32_after", x)
    variables = model_ref.init(jax.random.PRNGKey(0), x)
    variables = _nontrivial_bn_stats(variables)

    # calibrate EACH mode separately: folded mode must calibrate weight
    # ranges on the folded weights (deployment semantics)
    model_fold, _ = _setup("folded", x)
    v_ref = calibrate(model_ref, variables, [x])
    v_fold = calibrate(model_fold, variables, [x])

    y_ref = np.asarray(japply(model_ref, v_ref, x, mode="fixed"))
    y_fold = np.asarray(japply(model_fold, v_fold, x, mode="fixed"))
    # different quantization points, same function: close but not equal
    assert np.mean((y_ref - y_fold) ** 2) < 1e-2 * np.mean(y_ref ** 2) + 1e-6
    assert np.all(np.isfinite(y_fold))


def test_folded_weight_ranges_differ_from_unfolded():
    """Weight quantizer calibrated in folded mode sees gamma-scaled weights."""
    x = _rand()
    model_ref, _ = _setup("fp32_after", x)
    variables = model_ref.init(jax.random.PRNGKey(0), x)
    variables = _nontrivial_bn_stats(variables)
    model_fold, _ = _setup("folded", x)

    v_ref = calibrate(model_ref, variables, [x])
    v_fold = calibrate(model_fold, variables, [x])
    m_ref = np.asarray(v_ref["quant"]["conv1"]["weight_q"]["q"]["maxval"])
    m_fold = np.asarray(v_fold["quant"]["conv1"]["weight_q"]["q"]["maxval"])
    assert not np.allclose(m_ref, m_fold)


def test_folded_rejects_train_bn():
    x = _rand()
    model_fold, _ = _setup("folded", x)
    variables = model_fold.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="folded"):
        model_fold.apply(variables, x, mode="fixed", train_bn=True,
                         mutable=["batch_stats"])
