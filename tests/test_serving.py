"""Serving export round trip: serialized StableHLO artifact == live model."""

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.serving import export_quantized_model, load_exported
from tests._tiny import TinyModel, japply

CFG = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    weight_range_method="current_minmax", act_range_method="allminmax")


def _setup():
    model = TinyModel(config=CFG)
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (4, 16, 16, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, calibrate(model, variables, [x]), x


def test_export_fixed_batch_round_trip(tmp_path):
    model, variables, x = _setup()
    path, spec = export_quantized_model(
        model, variables, str(tmp_path / "model.bin"),
        batch_size=4, image_size=16)
    assert spec == (4, 16, 16, 3)

    ref = japply(model, variables, x, mode="fixed")
    fn = load_exported(path)
    out = fn(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_export_polymorphic_batch(tmp_path):
    model, variables, x = _setup()
    path, spec = export_quantized_model(
        model, variables, str(tmp_path / "model.bin"),
        batch_size=None, image_size=16)

    fn = load_exported(path)
    for b in (1, 4, 7):
        xb = jnp.asarray(np.random.RandomState(b).normal(
            0, 1, (b, 16, 16, 3)), jnp.float32)
        out = fn(xb)
        assert out.shape == (b, 4)
        ref = japply(model, variables, xb, mode="fixed")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_export_full_deployment_config(tmp_path):
    """Export the production path: bf16 engine + hardware-cast quant +
    bf16 conv stores + IEEE-f8 activation storage, deployment-prepared
    variables (baked weights, frozen quantizer consts).  The serialized
    StableHLO recompiles on load, so bf16-engine intermediates may fuse/
    round differently than the live jit — tolerance covers one bf16
    rounding; the parity-engine round-trip tests above stay at 1e-6."""
    from fp8_quantization_tpu.nn.bake import prepare_for_deployment

    model, variables, x = _setup()
    dcfg = CFG.replace(
        engine="bf16", conv_out_bf16=True,
        weight_quant=CFG.weight_quant.replace(cast_fastpath=True),
        act_quant=CFG.act_quant.replace(cast_fastpath=True, store_f8=True))
    dmodel = TinyModel(config=dcfg)
    dvars = prepare_for_deployment(dmodel, variables, x[:1])

    path, _ = export_quantized_model(
        dmodel, dvars, str(tmp_path / "deploy.bin"),
        batch_size=4, image_size=16, quant_w=False)
    ref = japply(dmodel, dvars, x, mode="fixed", quant_w=False)
    out = load_exported(path)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_export_baked_int8_round_trip(tmp_path):
    """Native-int8 deployment: bake_int8_weights variables export with int8
    weight constants and the artifact reproduces the live model."""
    from fp8_quantization_tpu.nn.bake import bake_int8_weights

    icfg = make_layer_config(
        qmethod="symmetric_uniform", act_qmethod="asymmetric_uniform",
        per_channel_weights=True, quantize_input=True,
        weight_range_method="current_minmax", act_range_method="allminmax",
        engine="pallas")
    icfg = icfg.replace(int8_mxu=True)
    model = TinyModel(config=icfg)
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (4, 16, 16, 3)),
                    jnp.float32)
    variables = calibrate(model, model.init(jax.random.PRNGKey(0), x), [x])
    baked = bake_int8_weights(model, variables, x)
    assert any(a.dtype == jnp.int8
               for a in jax.tree.leaves(baked.get("baked_int8", {})))

    path, _ = export_quantized_model(
        model, baked, str(tmp_path / "int8.bin"),
        batch_size=4, image_size=16)
    ref = japply(model, baked, x, mode="fixed")
    out = load_exported(path)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
