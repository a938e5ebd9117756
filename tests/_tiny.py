"""Tiny quantized model + jitted-apply helper for fast tests."""

import flax.linen as nn
import jax

from fp8_quantization_tpu.nn.config import LayerQuantConfig
from fp8_quantization_tpu.nn.factored import fmean, materialize
from fp8_quantization_tpu.nn.layers import QuantConv, QuantLinear


def japply(model, variables, x, **static_kw):
    """jitted model.apply — eager per-op dispatch costs ~25s on a cold CPU
    backend; one jitted call hits the persistent compilation cache."""
    return jax.jit(
        lambda v, xx: model.apply(v, xx, **static_kw))(variables, x)


class TinyModel(nn.Module):
    """conv-bn-relu -> conv-bn-relu -> gap -> linear, all quantized."""

    config: LayerQuantConfig
    num_classes: int = 4
    width: int = 8

    @nn.compact
    def __call__(self, x, mode: str = "fixed", quant_w: bool = True,
                 quant_a: bool = True, train_bn: bool = False):
        kw = dict(mode=mode, quant_w=quant_w, quant_a=quant_a, train_bn=train_bn)
        # mirror the zoo models: factored interchange on the fast path
        if mode == "fixed" and self.config.engine in ("bf16", "pallas"):
            kw["out"] = "factored"
        x = QuantConv(features=self.width, kernel_size=(3, 3), strides=(2, 2),
                      padding=((1, 1), (1, 1)), bn=True, activation="relu",
                      config=self.config, name="conv1")(x, **kw)
        x = QuantConv(features=self.width * 2, kernel_size=(3, 3),
                      strides=(2, 2), padding=((1, 1), (1, 1)), bn=True,
                      activation="relu", config=self.config, name="conv2")(x, **kw)
        x = fmean(x, axis=(1, 2))
        x = QuantLinear(features=self.num_classes, use_bias=True,
                        config=self.config, name="fc")(
            x, **{**kw, "out": "value"})
        return materialize(x)
