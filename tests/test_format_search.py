"""Network-aware global FP8 format search (calibration/format_search.py).

The reference picks formats per-tensor by local MSE; the search here
minimizes the *network* logits error directly, so each coordinate step
must be monotone non-increasing and never worse than the local choice."""

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.calibration.format_search import (
    find_fp8_quantizers, network_format_search)
from fp8_quantization_tpu.nn.config import make_layer_config
from tests._tiny import TinyModel, japply

CFG = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_mantissa_bits=4,
    fp8_set_maxval=True, weight_range_method="current_minmax",
    act_range_method="allminmax", engine="parity")


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    # heavy-tailed batch: format preference should deviate from uniform data
    x = jnp.asarray(rng.standard_t(4, (8, 16, 16, 3)), jnp.float32)
    model = TinyModel(config=CFG)
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    return model, variables, x


def test_find_fp8_quantizers_enumerates_state():
    model, variables, x = _setup()
    paths = find_fp8_quantizers(variables["quant"])
    # TinyModel: conv1/conv2/fc x (weight_q + act_q)
    assert len(paths) == 6, paths
    names = {"/".join(p) for p in paths}
    assert any("conv1" in n and "weight_q" in n for n in names)
    assert any("fc" in n and "act_q" in n for n in names)


def test_search_monotone_and_improves_network_mse():
    model, variables, x = _setup()
    out_vars, assignment, history = network_format_search(
        model, variables, [x], candidates=(2, 3, 4, 5), passes=2)
    assert len(assignment) == 6
    assert all(2 <= m <= 5 for m in assignment.values())
    # coordinate descent with the incumbent always a candidate: monotone
    assert all(b <= a * (1 + 1e-6) for a, b in zip(history, history[1:])), \
        history
    assert history[-1] <= history[0] * (1 + 1e-6)

    # returned variables actually produce the improved logits error
    ref = japply(model, variables, x, mode="fixed", quant_w=False,
                 quant_a=False)
    out = japply(model, out_vars, x, mode="fixed")
    got = float(jnp.mean((out - ref) ** 2))
    np.testing.assert_allclose(got, history[-1], rtol=1e-4)


def test_search_respects_explicit_candidates():
    model, variables, x = _setup(1)
    out_vars, assignment, _ = network_format_search(
        model, variables, [x], candidates=(3,), passes=1)
    # every quantizer either kept its calibrated M=4 (incumbent wins) or
    # moved to the only candidate
    assert set(assignment.values()) <= {3, 4}, assignment
