"""Engine parity: 'bf16' (normalized-grid MXU) and 'pallas' (fused kernel)
vs the 'parity' (reference-semantics fp32) engine on full quantized layers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.config import make_layer_config
from tests._tiny import TinyModel, japply


def _cfg(engine, **kw):
    base = dict(qmethod="fp_quantizer", per_channel_weights=True,
                fp8_mantissa_bits=4, fp8_set_maxval=True,
                weight_range_method="current_minmax",
                act_range_method="allminmax", engine=engine)
    base.update(kw)
    return make_layer_config(**base)


def _data(n=4, size=16, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.normal(0, 1, (n, size, size, 3)), jnp.float32)


def _run(engine, **kw):
    cfg = _cfg(engine, **kw)
    model = TinyModel(config=cfg)
    x = _data()
    variables = model.init(jax.random.PRNGKey(0), x)
    # calibrate with the parity engine so all engines share identical ranges
    parity_model = TinyModel(
        config=dataclasses.replace(cfg, engine="parity"))
    variables = calibrate(parity_model, variables, [x])
    return np.asarray(japply(model, variables, x, mode="fixed"))


@pytest.mark.parametrize("kw", [
    dict(),
    dict(qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform"),
], ids=["fp8", "int8"])
def test_bf16_engine_close_to_parity(kw):
    """Weights exact via factoring; only the activation bf16 cast (~2^-9,
    far below the 8-bit quant noise) and accumulation order differ."""
    ref = _run("parity", **kw)
    out = _run("bf16", **kw)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    assert not np.allclose(out, 0)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform"),
], ids=["fp8", "int8"])
def test_pallas_engine_close_to_parity(kw):
    ref = _run("parity", **kw)
    out = _run("pallas", **kw)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    assert not np.allclose(out, 0)


def test_pallas_linear_exact_on_quantized_input():
    """An isolated QuantLinear whose input is already fake-quantized: the
    fused kernel (weights exact via epilogue factors, input exact after its
    own quantization) matches parity to fp32 accumulation-order noise."""
    from fp8_quantization_tpu.nn.layers import QuantLinear

    cfg = _cfg("parity", fp8_learn_maxval=False).replace(quantize_input=True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(0, 1, (32, 64)), jnp.float32)

    lin_p = QuantLinear(features=16, use_bias=True, config=cfg,
                        activation="relu")
    variables = lin_p.init(jax.random.PRNGKey(0), x)
    variables = calibrate(lin_p, variables, [x])

    ref = japply(lin_p, variables, x, mode="fixed")
    lin_k = QuantLinear(features=16, use_bias=True,
                        config=cfg.replace(engine="pallas"),
                        activation="relu")
    out = japply(lin_k, variables, x, mode="fixed")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_calibration_identical_across_engines():
    """Engines change the matmul path, not the estimator path: calibrating
    with engine='bf16' must produce the same quant state as 'parity'
    (estimators see fp32 pre-matmul tensors; inter-layer activations differ
    only by bf16 cast effects below estimator resolution... so compare with
    loose tolerance on act ranges, exact on first-layer weight ranges)."""
    x = _data()
    out = {}
    for eng in ("parity", "bf16"):
        model = TinyModel(config=_cfg(eng))
        variables = model.init(jax.random.PRNGKey(0), x)
        out[eng] = calibrate(model, variables, [x])
    a = out["parity"]["quant"]["conv1"]["weight_q"]["q"]["maxval"]
    b = out["bf16"]["quant"]["conv1"]["weight_q"]["q"]["maxval"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    a = out["parity"]["quant"]["fc"]["act_q"]["q"]["maxval"]
    b = out["bf16"]["quant"]["fc"]["act_q"]["q"]["maxval"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2)


def test_pallas_linear_3d_input():
    """QuantLinear pallas path on (batch, seq, features) inputs — previously
    crashed at trace time (code-review finding)."""
    from fp8_quantization_tpu.nn.layers import QuantLinear

    cfg = _cfg("parity")
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.normal(0, 1, (4, 7, 32)), jnp.float32)

    lin = QuantLinear(features=16, use_bias=True, config=cfg)
    variables = lin.init(jax.random.PRNGKey(0), x)
    variables = calibrate(lin, variables, [x])
    ref = japply(lin, variables, x, mode="fixed")

    lin_k = QuantLinear(features=16, use_bias=True,
                        config=cfg.replace(engine="pallas"))
    out = japply(lin_k, variables, x, mode="fixed")
    assert out.shape == (4, 7, 16)
    # unquantized input is bf16-cast in the kernel, so outputs near a bin
    # boundary can flip one E3M4 bin (width 2^-4 = 6.25% relative)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=7e-2, atol=2e-2)
    assert np.mean(np.abs(np.asarray(out) - np.asarray(ref))) < 2e-2


def test_bf16_engine_quantize_input_factored():
    """quantize_input under the bf16 engine uses the factored (bf16-exact)
    decomposition rather than a lossy cast: result matches parity closely."""
    from fp8_quantization_tpu.nn.layers import QuantLinear

    cfg = _cfg("parity").replace(quantize_input=True)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(0, 1, (16, 64)), jnp.float32)

    lin = QuantLinear(features=24, use_bias=True, config=cfg)
    variables = lin.init(jax.random.PRNGKey(0), x)
    variables = calibrate(lin, variables, [x])
    ref = japply(lin, variables, x, mode="fixed")

    lin_b = QuantLinear(features=24, use_bias=True,
                        config=cfg.replace(engine="bf16"))
    out = japply(lin_b, variables, x, mode="fixed")
    # both operands on bf16-exact normalized grids: only accumulation order
    # + two epilogue factor multiplies differ
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_int8_mxu_layer_matches_parity():
    """config.int8_mxu: the fused kernel's s8 x s8 -> s32 MXU datapath on a
    full QuantLinear (int_sym weights, int_asym input quant).  Integer
    accumulation is exact, so only the parity engine's own fp32 rounding
    separates the two."""
    from fp8_quantization_tpu.nn.layers import QuantLinear

    cfg = _cfg("parity", qmethod="symmetric_uniform",
               act_qmethod="asymmetric_uniform").replace(quantize_input=True)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(0, 1, (32, 64)), jnp.float32)

    lin_p = QuantLinear(features=16, use_bias=True, config=cfg,
                        activation="relu")
    variables = lin_p.init(jax.random.PRNGKey(0), x)
    variables = calibrate(lin_p, variables, [x])
    ref = japply(lin_p, variables, x, mode="fixed")

    lin_i = QuantLinear(features=16, use_bias=True, activation="relu",
                        config=cfg.replace(engine="pallas", int8_mxu=True))
    out = japply(lin_i, variables, x, mode="fixed")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
