"""Producer-side s8 interchange (nn/factored.PrequantS8).

The XLA s8 datapath's consumer-side quant prologues re-read every layer
input (measured 14.1 ms of ViT-S/16's batch-128 int8 step, RESULTS.md
round 4).  The PrequantS8 protocol moves each prologue into its producer's
epilogue fusion and exchanges 1-byte s8 operands.  These tests pin:

  * op level — a prequantized operand reproduces the in-op prologue
    bit-exactly (they share ``_act_int_params``), and an ``emit_s8``
    epilogue chains into the next matmul bit-exactly vs. the same chain
    with an f32 interchange;
  * model level — the tiny ViT's deployed int8 forward with the
    interchange active agrees with (a) the consumer-side graph it
    replaces and (b) the parity engine, and the interchange actually
    engages (every encoder matmul consumes a prequantized operand).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fp8_quantization_tpu.ops.pallas.autotune as at
from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.models import vit as vit_mod
from fp8_quantization_tpu.models.vit import QuantizedViT
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.ops.int8 import int8_matmul, prequant_s8


@pytest.fixture
def no_pallas(monkeypatch):
    monkeypatch.setattr(at, "MODE", "never")


def _mk_operands(seed=0, m=6, k=16, n=8):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.normal(0, 2, (m, k)), jnp.float32)
    wsg = jnp.asarray(rng.randint(-128, 128, (k, n)), jnp.int8)
    w_delta = jnp.asarray(rng.uniform(0.01, 0.1, (n,)), jnp.float32)
    a_delta = jnp.asarray(0.05, jnp.float32)
    a_zero = jnp.asarray(127.6, jnp.float32)
    return x, wsg, w_delta, a_delta, a_zero


def test_prequant_operand_bit_exact():
    x, wsg, w_delta, a_delta, a_zero = _mk_operands()
    signed = jnp.asarray(1.0, jnp.float32)
    ref = int8_matmul(x, wsg, w_delta, signed, a_delta, a_zero, 8.0)
    xs8 = prequant_s8(x, a_delta, a_zero, 8.0)
    assert xs8.dtype == jnp.int8
    got = int8_matmul(xs8, wsg, w_delta, signed, a_delta, a_zero, 8.0,
                      x_prequant=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_prequant_low_bit_grid():
    # 4-bit act grid: clip bounds must follow the consumer's bit width
    x, wsg, w_delta, a_delta, a_zero = _mk_operands(seed=3)
    a_zero = jnp.asarray(7.4, jnp.float32)
    signed = jnp.asarray(1.0, jnp.float32)
    ref = int8_matmul(x, wsg, w_delta, signed, a_delta, a_zero, 4.0)
    got = int8_matmul(prequant_s8(x, a_delta, a_zero, 4.0), wsg, w_delta,
                      signed, a_delta, a_zero, 4.0, x_prequant=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_emit_s8_chains_bit_exact():
    # layer1 --emit_s8--> layer2  ==  layer1 (f32 out) -> prequant -> layer2
    x, wsg1, w_delta1, a_delta1, a_zero1 = _mk_operands(seed=1)
    _, wsg2, w_delta2, a_delta2, a_zero2 = _mk_operands(seed=2, k=8, n=4)
    signed = jnp.asarray(1.0, jnp.float32)

    y1 = int8_matmul(x, wsg1, w_delta1, signed, a_delta1, a_zero1, 8.0)
    ref = int8_matmul(prequant_s8(y1, a_delta2, a_zero2, 8.0), wsg2,
                      w_delta2, signed, a_delta2, a_zero2, 8.0,
                      x_prequant=True)

    y1s8 = int8_matmul(x, wsg1, w_delta1, signed, a_delta1, a_zero1, 8.0,
                       emit_s8=(a_delta2, a_zero2, 8.0))
    assert y1s8.dtype == jnp.int8
    got = int8_matmul(y1s8, wsg2, w_delta2, signed, a_delta2, a_zero2, 8.0,
                      x_prequant=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def _int8_cfg(**kw):
    return make_layer_config(
        qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
        per_channel_weights=True, quantize_input=True,
        weight_range_method="current_minmax", act_range_method="allminmax",
        engine="bf16", int8_mxu=True, **kw)


def _tiny_vit(cfg):
    return QuantizedViT(num_classes=5, patch_size=4, dim=32, depth=2,
                        num_heads=2, mlp_ratio=2, config=cfg)


def test_vit_interchange_matches_consumer_side_and_parity(
        no_pallas, monkeypatch):
    cfg = _int8_cfg(conv_out_bf16=True, int8_assume_signed=True)
    model = _tiny_vit(cfg)
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (2, 16, 16, 3)),
                    jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])

    y_inter = jax.jit(lambda v, xx: model.apply(v, xx, mode="fixed"))(
        variables, x)

    # the consumer-side graph this protocol replaces (same variables)
    monkeypatch.setattr(vit_mod, "_i8_fast", lambda *a, **k: False)
    y_cons = jax.jit(lambda v, xx: model.apply(v, xx, mode="fixed"))(
        variables, x)
    monkeypatch.undo()

    # difference: consumer-side prologues round a bf16-stored interchange
    # tensor, the producer side quantizes the f32 value in-register
    np.testing.assert_allclose(np.asarray(y_inter), np.asarray(y_cons),
                               rtol=0, atol=5e-2)

    cfg_p = dataclasses.replace(cfg, engine="parity", int8_mxu=False,
                                conv_out_bf16=False,
                                int8_assume_signed=False)
    model_p = _tiny_vit(cfg_p)
    y_par = jax.jit(lambda v, xx: model_p.apply(v, xx, mode="fixed"))(
        variables, x)
    # no farther from the parity engine than the consumer-side graph is
    # (both carry the same bf16-interchange rounding; the producer side
    # quantizes from f32 in-register, which can only be closer on average)
    err_inter = float(np.abs(np.asarray(y_inter, np.float32)
                             - np.asarray(y_par)).max())
    err_cons = float(np.abs(np.asarray(y_cons, np.float32)
                            - np.asarray(y_par)).max())
    assert err_inter <= err_cons * 1.5 + 1e-3, (err_inter, err_cons)


def test_vit_interchange_engages_everywhere(no_pallas, monkeypatch):
    """Every encoder/head matmul consumes a producer-emitted s8 operand."""
    from fp8_quantization_tpu.ops import int8 as int8_mod

    cfg = _int8_cfg(conv_out_bf16=True, int8_assume_signed=True)
    model = _tiny_vit(cfg)
    x = jnp.asarray(np.random.RandomState(1).normal(0, 1, (2, 16, 16, 3)),
                    jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])

    calls = []
    orig = int8_mod.int8_matmul

    def spy(*a, **k):
        calls.append(bool(k.get("x_prequant", False)))
        return orig(*a, **k)

    monkeypatch.setattr(int8_mod, "int8_matmul", spy)
    # nn/layers.py imports int8_matmul inside the call — patch there too
    model.apply(variables, x, mode="fixed")
    # depth=2 blocks x (qkv, proj, mlp1, mlp2) + head = 9 matmuls, all fed
    # producer-side.  (The patch-embed conv keeps its in-op prologue.)
    assert len(calls) == 9
    assert all(calls)


def test_vit_interchange_off_during_calibration(no_pallas):
    """Calibration must run the consumer-side graph (estimators see each
    layer's real-valued input) — no PrequantS8 leaves a producer."""
    cfg = _int8_cfg()
    model = _tiny_vit(cfg)
    x = jnp.asarray(np.random.RandomState(2).normal(0, 1, (2, 16, 16, 3)),
                    jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # would raise inside the estimators if an int8 operand reached them
    variables = calibrate(model, variables, [x])
    assert "quant" in variables
