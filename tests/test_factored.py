"""Cross-layer factored activation protocol (nn/factored.py).

The fast inference path exchanges Factored(norm_bf16, factor) pairs between
layers; materialized values must agree with the reference-semantics parity
engine, and the bf16-engine weight bake must be output-identical.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.nn.factored import (
    Factored, fadd, fmax_pool, fmean, materialize)
from fp8_quantization_tpu.nn.layers import QuantConv
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


def test_quantconv_factored_output_matches_parity():
    """QuantConv(out='factored') materialized == the parity-engine output
    up to fp32 accumulation-order noise (operands are exact either way).

    Input is made bf16-exact first: inside a model every layer input IS
    bf16-exact (it sits on the previous quantizer's grid); only the raw
    model input pays a one-time ~2^-9 cast, as documented."""
    x = jnp.asarray(_data().astype(jnp.bfloat16), jnp.float32)
    cfg = _cfg("parity")
    conv_p = QuantConv(features=16, kernel_size=(3, 3), bn=True,
                       activation="relu", config=cfg, name="c")
    variables = conv_p.init(jax.random.PRNGKey(0), x)
    variables = calibrate(conv_p, variables, [x])
    ref = np.asarray(japply(conv_p, variables, x, mode="fixed"))

    conv_b = QuantConv(features=16, kernel_size=(3, 3), bn=True,
                       activation="relu",
                       config=dataclasses.replace(cfg, engine="bf16"), name="c")
    out = conv_b.apply(variables, x, mode="fixed", out="factored")
    assert isinstance(out, Factored)
    assert out.norm.dtype == jnp.bfloat16
    got = np.asarray(materialize(out))
    # values on the same 8-bit grid: identical except borderline bin flips
    # from fp32 multiply-order differences — require near-total agreement
    exact = np.isclose(got, ref, rtol=1e-6, atol=1e-7)
    assert exact.mean() > 0.999, exact.mean()
    np.testing.assert_allclose(got, ref, rtol=0.07, atol=1e-3)


def test_factored_norm_is_bf16_exact():
    """norm round-trips bf16 losslessly: materialize(bf16(norm)) * factor
    equals the fake-quant value bit for bit."""
    from fp8_quantization_tpu.ops import quantizer as q

    spec = q.QuantizerSpec(method=q.QMethod.fp_quantizer, n_bits=8,
                           mantissa_bits=4)
    state = q.init_state(spec)
    state = q.set_quant_range(spec, state, jnp.asarray(-3.0), jnp.asarray(5.0))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(0, 2, (512,)), jnp.float32)
    fq = np.asarray(q.apply(spec, state, x))
    norm, factor = q.apply_factored(spec, state, x)
    norm_bf16 = norm.astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(norm_bf16.astype(jnp.float32)),
                                  np.asarray(norm))
    np.testing.assert_allclose(
        np.asarray(norm_bf16.astype(jnp.float32) * factor), fq, rtol=1e-6)


def test_factored_helpers():
    rng = np.random.RandomState(2)
    a_norm = jnp.asarray(rng.randint(-8, 8, (2, 8, 8, 4)), jnp.bfloat16)
    b_norm = jnp.asarray(rng.randint(-8, 8, (2, 8, 8, 4)), jnp.bfloat16)
    a = Factored(a_norm, jnp.asarray(0.25, jnp.float32))
    b = Factored(b_norm, jnp.asarray(0.5, jnp.float32))

    np.testing.assert_allclose(np.asarray(fadd(a, b)),
                               np.asarray(materialize(a) + materialize(b)))
    pooled = fmax_pool(a, (2, 2), strides=(2, 2))
    assert isinstance(pooled, Factored)
    import flax.linen as fnn
    np.testing.assert_allclose(
        np.asarray(materialize(pooled)),
        np.asarray(fnn.max_pool(materialize(a), (2, 2), strides=(2, 2))))
    np.testing.assert_allclose(np.asarray(fmean(a, axis=(1, 2))),
                               np.asarray(jnp.mean(materialize(a), axis=(1, 2))),
                               rtol=1e-6)
    # plain arrays pass through
    x = jnp.ones((2, 4, 4, 3))
    assert materialize(x) is x
    assert not isinstance(fmax_pool(x, (2, 2)), Factored)


def test_model_factored_close_to_parity():
    """End-to-end TinyModel: the factored fixed-mode path (bf16 engine)
    matches parity within quantization-bin noise; mean error tiny."""
    x = _data()
    cfg = _cfg("parity")
    model_p = TinyModel(config=cfg)
    variables = model_p.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model_p, variables, [x])
    ref = np.asarray(japply(model_p, variables, x, mode="fixed"))

    model_b = TinyModel(config=dataclasses.replace(cfg, engine="bf16"))
    out = np.asarray(japply(model_b, variables, x, mode="fixed"))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    assert np.mean(np.abs(out - ref)) < 5e-3


def test_bake_bf16_engine_identical():
    """Round-1 bug (VERDICT): bake on the bf16 engine sowed nothing and
    quant_w=False silently ran unquantized weights.  Now: baked normalized
    kernel + 'baked' factor collection reproduce quant_w=True outputs."""
    from fp8_quantization_tpu.nn.bake import bake_weights

    x = _data()
    cfg = _cfg("bf16")
    model = TinyModel(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    ref = np.asarray(japply(model, variables, x, mode="fixed"))

    baked_vars = bake_weights(model, variables, x[:1])
    assert "baked" in baked_vars, "factored bake must stow w_factor"
    out = np.asarray(model.apply(baked_vars, x, mode="fixed", quant_w=False))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)

    # baked kernels are normalized-grid values: exact in bf16
    leaves = jax.tree.leaves(baked_vars["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_conv_out_bf16_stays_within_quant_noise():
    """conv_out_bf16=True (fast epilogue) changes outputs by far less than
    one quantization step."""
    x = _data()
    cfg = _cfg("bf16")
    model_a = TinyModel(config=cfg)
    variables = model_a.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model_a, variables, [x])
    ref = np.asarray(japply(model_a, variables, x, mode="fixed"))

    model_b = TinyModel(config=dataclasses.replace(cfg, conv_out_bf16=True))
    out = np.asarray(japply(model_b, variables, x, mode="fixed"))
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)
    assert np.mean(np.abs(out - ref)) < 5e-3
