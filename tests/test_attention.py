"""Flash-attention deployment path (ops/pallas/attention.py): padding +
masking wrapper vs the naive softmax chain, and the ViT routing gate."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.ops.pallas.attention import flash_mha


def _naive(q, k, v, scale):
    attn = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale,
                          axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


@pytest.mark.parametrize("s", [128, 197, 50])
def test_flash_mha_matches_naive_with_padding(s):
    """Non-128-multiple sequence lengths (ViT-S/16: 197) are padded and
    masked via SegmentIds; real rows must match the unpadded naive chain
    to bf16-operand tolerance."""
    rng = np.random.RandomState(s)
    b, h, d = 2, 3, 64
    q, k, v = (jnp.asarray(rng.normal(0, 1, (b, h, s, d)), jnp.float32)
               for _ in range(3))
    scale = 1.0 / d ** 0.5
    out = flash_mha(q, k, v, sm_scale=scale)
    ref = _naive(q.astype(jnp.bfloat16).astype(jnp.float32),
                 k.astype(jnp.bfloat16).astype(jnp.float32),
                 v.astype(jnp.bfloat16).astype(jnp.float32), scale)
    assert out.shape == (b, h, s, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_vit_flash_attention_routing_matches_naive():
    """ViT with engine='pallas' (attn gate always-on under CPU) routes
    attention through flash_mha; logits match the bf16-engine naive-chain
    forward to bf16-attention tolerance."""
    from fp8_quantization_tpu.calibration.calibrate import calibrate
    from fp8_quantization_tpu.models.vit import QuantizedViT
    from fp8_quantization_tpu.nn.bake import prepare_for_deployment
    from fp8_quantization_tpu.nn.config import make_layer_config

    cfg = make_layer_config(
        qmethod="fp_quantizer", per_channel_weights=True,
        fp8_mantissa_bits=4, fp8_set_maxval=True,
        weight_range_method="current_minmax",
        act_range_method="allminmax", engine="bf16")
    kw = dict(num_classes=10, patch_size=8, dim=64, depth=1, num_heads=2,
              mlp_ratio=2)
    model = QuantizedViT(config=cfg, **kw)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = calibrate(model, variables, [x])
    dvars = prepare_for_deployment(model, variables, x)

    ref = jax.jit(lambda v, xx: model.apply(
        v, xx, mode="fixed", quant_w=False))(dvars, x)

    model_k = QuantizedViT(config=dataclasses.replace(cfg, engine="pallas"),
                           **kw)
    out = jax.jit(lambda v, xx: model_k.apply(
        v, xx, mode="fixed", quant_w=False))(dvars, x)
    # bf16 attention operands perturb logits ~2^-9 relative, then the
    # downstream quant grids discretize the perturbation — same order as
    # the conv_out_bf16 deployment delta (measured 0.11 max on this net)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-1, atol=2e-1)
    np.testing.assert_array_equal(np.argmax(np.asarray(out), -1),
                                  np.argmax(np.asarray(ref), -1))
