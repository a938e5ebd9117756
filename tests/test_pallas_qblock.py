"""Fused inverted-residual block kernel (ops/pallas/qblock.py).

Kernel-level parity against a composed-jnp oracle built from the same
quantizer math, and module-level parity of the fused pallas path against
the unfused bf16 factored path on identical prepared variables.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.calibration.calibrate import calibrate
from fp8_quantization_tpu.models.mobilenet_v2 import QuantInvertedResidual
from fp8_quantization_tpu.nn.bake import prepare_for_deployment
from fp8_quantization_tpu.nn.config import make_layer_config
from fp8_quantization_tpu.ops.pallas.qblock import (
    FusedBlockConfig, fused_inverted_residual)
from fp8_quantization_tpu.ops.pallas.qmatmul import _fp8_quantize_tile
from tests._tiny import japply


def _oracle(x, w1, wd, w2, ascal, s1, b1, sd, bd, s2, b2, xf, cfg):
    """Composed-jnp reference for the fused kernel: identical stage math,
    identical dtypes (bf16 matmul operands, f32 epilogues)."""
    n, H, W, cin = x.shape
    hid = wd.shape[-1]
    Ho, Wo = H // cfg.stride, W // cfg.stride

    def q(y, row, normalized):
        if cfg.methods[row] == "none":
            return y
        mb = jnp.clip(jnp.round(ascal[row, 1]), 1.0,
                      cfg.bits[row] - ascal[row, 2])
        return _fp8_quantize_tile(y, jnp.maximum(ascal[row, 0], 1e-30), mb,
                                  ascal[row, 2], normalized=normalized,
                                  n_bits=float(cfg.bits[row]))

    h = x.astype(jnp.bfloat16)
    if cfg.expand:
        y1 = jnp.dot(h.reshape(-1, cin), w1.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        y1 = jnp.clip(y1 * s1 + b1, 0.0, 6.0)
        h = q(y1, 0, True).astype(jnp.bfloat16).reshape(n, H, W, hid)
    yd = jax.lax.conv_general_dilated(
        h.astype(jnp.float32), wd.reshape(3, 3, 1, hid).astype(jnp.float32),
        (cfg.stride, cfg.stride), ((1, 1), (1, 1)), feature_group_count=hid,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    yd = jnp.clip(yd * sd + bd, 0.0, 6.0)
    n2 = q(yd, 1, True).astype(jnp.bfloat16)
    y2 = jnp.dot(n2.reshape(-1, hid), w2.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    y2 = (y2 * s2 + b2).reshape(n, Ho, Wo, -1)
    if cfg.use_res:
        # the kernel's residual sees the bf16 operand copy of x (exact for
        # factored deployment inputs, which are bf16-exact grid values)
        xr = x.astype(jnp.bfloat16).astype(jnp.float32)
        y2 = q(y2, 2, False) + xr * xf
        return q(y2, 3, cfg.emit_norm)
    return q(y2, 2, cfg.emit_norm)


@pytest.mark.parametrize("expand,stride,use_res", [
    (True, 1, True), (True, 2, False), (False, 1, False)],
    ids=["res", "stride2", "t1"])
def test_kernel_matches_composed_oracle(expand, stride, use_res):
    rng = np.random.RandomState(0)
    n, H, W, cin, t, cout = 2, 8, 8, 16, 4, 16
    hid = cin * t if expand else cin
    x = jnp.asarray(rng.normal(0, 1, (n, H, W, cin)), jnp.float32)
    w1 = (jnp.asarray(rng.normal(0, 0.2, (cin, hid)), jnp.float32)
          if expand else None)
    wd = jnp.asarray(rng.normal(0, 0.2, (3, 3, hid)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.2, (hid, cout)), jnp.float32)
    ascal = jnp.asarray([[6.0, 4.0, 1.0]] * 4, jnp.float32)
    s1 = jnp.asarray(rng.uniform(0.5, 1.5, hid), jnp.float32) if expand else None
    b1 = jnp.asarray(rng.normal(0, 0.1, hid), jnp.float32) if expand else None
    sd = jnp.asarray(rng.uniform(0.5, 1.5, hid), jnp.float32)
    bd = jnp.asarray(rng.normal(0, 0.1, hid), jnp.float32)
    s2 = jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.1, cout), jnp.float32)
    xf = jnp.asarray(0.7, jnp.float32)

    cfg = FusedBlockConfig(expand=expand, stride=stride, use_res=use_res,
                           imgs_per_block=2)
    out = fused_inverted_residual(x, w1, wd, w2, ascal, s1, b1, sd, bd,
                                  s2, b2, x_factor=xf if use_res else None,
                                  cfg=cfg)
    ref = _oracle(x, w1, wd, w2, ascal, s1, b1, sd, bd, s2, b2, xf, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(out), 0)


CFG = make_layer_config(
    qmethod="fp_quantizer", per_channel_weights=True, fp8_set_maxval=True,
    weight_range_method="current_minmax", act_range_method="allminmax",
    engine="pallas")


@pytest.mark.parametrize("features,strides,t", [
    (16, (1, 1), 4),      # residual block
    (24, (2, 2), 4),      # downsample block
    (16, (1, 1), 1),      # t=1 (no expand)
], ids=["res", "stride2", "t1"])
def test_block_module_fused_matches_unfused(features, strides, t):
    """The fused pallas block on prepared variables == the unfused bf16
    factored chain (same grids, same dtypes; accumulation-order noise).

    The input is made bf16-exact (as every real deployment input is — the
    factored protocol exchanges bf16-exact grid values) so the kernel's
    bf16 operand copy of x is lossless in the residual add too."""
    x = jnp.asarray(np.random.RandomState(0).normal(0, 1, (2, 8, 8, 16)),
                    jnp.float32).astype(jnp.bfloat16).astype(jnp.float32)

    def block(engine):
        return QuantInvertedResidual(
            features=features, strides=strides, expand_ratio=t,
            config=dataclasses.replace(CFG, engine=engine))

    bf16 = block("bf16")
    variables = jax.jit(bf16.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(bf16, variables, [x])
    prepared = prepare_for_deployment(bf16, variables, x[:1])

    # out='factored' is the full-model deployment interchange (layers
    # exchange exact normalized grids); out='value' would add lossy
    # full-scale bf16 casts between the unfused layers that the fused
    # kernel doesn't have.
    ref = japply(bf16, prepared, x, mode="fixed", quant_w=False,
                 out="factored")
    out = japply(block("pallas"), prepared, x, mode="fixed", quant_w=False,
                 out="factored")
    ref_v = np.asarray(ref.norm * ref.factor if hasattr(ref, "norm") else ref)
    out_v = np.asarray(out.norm * out.factor if hasattr(out, "norm") else out)
    np.testing.assert_allclose(out_v, ref_v, rtol=2e-3, atol=2e-3)
    assert not np.allclose(out_v, 0)


def test_block_module_falls_back_without_bake():
    """Un-prepared variables (no baked w_factor): the pallas block must run
    the per-layer path, not the fused kernel."""
    blk = QuantInvertedResidual(features=16, strides=(1, 1), expand_ratio=4,
                                config=CFG)
    x = jnp.asarray(np.random.RandomState(1).normal(0, 1, (2, 8, 8, 16)),
                    jnp.float32)
    variables = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
    variables = calibrate(blk, variables, [x])
    y = japply(blk, variables, x, mode="fixed")
    yv = np.asarray(y.norm * y.factor if hasattr(y, "norm") else y)
    assert np.isfinite(yv).all() and not np.allclose(yv, 0)
