"""Flax submodule that owns one quantizer's state (the functional
counterpart of the reference's QuantizationManager, quantization_manager.py:28-128).

State lives in the ``quant`` variable collection:
  <path>/q    — quantizer parameters (maxval / mantissa_bits / delta / ...)
  <path>/est  — range-estimator carry (running min/max, MSE accumulators, ...)

The reference's four-state machine (Qstates, quantization_manager.py:131-136)
maps onto the ``mode`` argument:

  "calibrate"  == estimate_ranges:        estimator update -> set range -> quantize
  "fixed"      == fix_ranges:             quantize with stored params
  "learn"      == learn_ranges:           quantize; params receive gradients
                   (the optimizer partition decides what is trainable —
                    see training/qat.py; no parameter<->buffer promotion)
  "calibrate_train" == estimate_ranges_train (range update only when training)
  "fp32"       : passthrough
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fp8_quantization_tpu.calibration import estimators as est
from fp8_quantization_tpu.ops import quantizer as q
from fp8_quantization_tpu.ops.quantizer import QuantizerSpec

MODES = ("calibrate", "calibrate_train", "fixed", "learn", "fp32")


def channel_major_view(x: jax.Array, channel_axis: Optional[int]) -> jax.Array:
    """(C, N) view for the estimators; (1, N) when channel_axis is None.

    Centralizes the reference's dim-0 flatten convention
    (range_estimators.py:62-63,84-88) for JAX's channel-last layouts.
    """
    if channel_axis is None:
        return x.reshape(1, -1)
    return jnp.moveaxis(x, channel_axis, 0).reshape(x.shape[channel_axis], -1)


class Quantizer(nn.Module):
    """One quantizer + one range estimator, stateful via the 'quant' collection."""

    spec: QuantizerSpec
    range_spec: est.EstimatorSpec
    num_channels: Optional[int] = None   # required iff spec.per_channel
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x, mode: str = "fixed", update_range: bool = True,
                 out: str = "apply"):
        """``out`` selects the result form:
          'apply'    — fake-quantized x (default)
          'factored' — (x_norm, factor): bf16-exact normalized grid + factor
                       (the engine decomposition, ops/quantizer.apply_factored)
          'state'    — (x, quant-state dict): raw params for fused kernels
        Estimation side effects (calibrate modes) are identical in all forms.
        """
        if mode == "fp32":
            return x
        assert mode in MODES, mode

        qvar = self.variable(
            "quant", "q", lambda: q.init_state(self.spec, self.num_channels))
        evar = self.variable(
            "quant", "est",
            lambda: est.init_state(self.range_spec, self.spec, self.num_channels))

        calibrating = (mode == "calibrate") or (
            mode == "calibrate_train" and not self.is_initializing())
        if calibrating and update_range and not self.is_initializing():
            x_cn = channel_major_view(
                x, self.channel_axis if self.spec.per_channel else None)
            new_est, x_min, x_max, q_updates = est.update(
                self.range_spec, self.spec, evar.value, x_cn)
            new_q = q.set_quant_range(self.spec, qvar.value, x_min, x_max)
            new_q.update(q_updates)
            evar.value = new_est
            qvar.value = new_q

        state = qvar.value
        if mode != "learn":
            # ranges are frozen: no gradient to quant params (fix_ranges)
            state = jax.tree.map(jax.lax.stop_gradient, state)
        if out == "state":
            return x, state
        disc = self._discretizer(mode)

        # Deployment fast path (nn/bake.prepare_inference): in fixed mode the
        # maxval-derived scalar algebra is frozen into the 'qprep' collection
        # once, leaving an elementwise-only per-step graph.  The prepare pass
        # itself runs with mutable=['qprep'] and sows the consts here.
        if mode == "fixed" and self.spec.is_fp8 and not self.is_initializing():
            if self.is_mutable_collection("qprep"):
                self.put_variable("qprep", "c",
                                  q.fixed_consts(self.spec, state))
            elif self.has_variable("qprep", "c"):
                consts = jax.tree.map(jax.lax.stop_gradient,
                                      self.get_variable("qprep", "c"))
                if out == "factored":
                    return q.apply_prepared(
                        self.spec, consts, x, channel_axis=self.channel_axis,
                        discretizer=disc, factored=True)
                return q.apply_prepared(
                    self.spec, consts, x, channel_axis=self.channel_axis,
                    discretizer=disc)

        if out == "factored":
            return q.apply_factored(self.spec, state, x,
                                    channel_axis=self.channel_axis,
                                    discretizer=disc)
        return q.apply(self.spec, state, x, channel_axis=self.channel_axis,
                       discretizer=disc)

    def _discretizer(self, mode: str):
        """Rounding op per the spec's gradient estimator (QAT surrogates:
        stochastic / EWGS / stacked-sigmoid; reference rounding_utils.py).
        Stochastic rounding draws from the 'quant_noise' rng stream in
        training modes and falls back to round-to-nearest in eval
        (rounding_utils.py:140-148)."""
        from fp8_quantization_tpu.ops.rounding import (
            make_discretizer, round_ste)

        spec = self.spec
        if spec.grad_estimator == "ste":
            return round_ste
        training = mode in ("learn", "calibrate_train")
        key = None
        if (spec.grad_estimator == "stoch_round" and training
                and self.has_rng("quant_noise")):
            key = self.make_rng("quant_noise")
        return make_discretizer(
            spec.grad_estimator, scaling_factor=spec.ewgs_scaling,
            alpha=spec.ss_alpha, key=key,
            training=training and (key is not None
                                   or spec.grad_estimator != "stoch_round"))
