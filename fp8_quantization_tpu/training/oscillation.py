"""Oscillation dampening and freezing for QAT.

The reference CLI parses ``--oscillations-dampen-*`` / ``--oscillations-
freeze-*`` flags but ships NO implementation (dead config,
utils/click_options.py:216-317 — SURVEY.md §7 quirks).  This module actually
implements the method those flags describe (Nagel et al., "Overcoming
Oscillations in Quantization-Aware Training", ICML 2022):

  * **Dampening**: a regularizer ``lambda(t) * sum((sg(Q(w)) - w)^2)`` over
    quantized weights pulls latent weights toward the center of their current
    quantization bin, discouraging bin-boundary oscillation.  ``lambda``
    anneals (cosine) from ``weight`` to ``weight_final`` starting at
    ``anneal_start`` of training.
  * **Freezing**: per-weight oscillation frequency is EMA-tracked — an
    oscillation is a quantized-value change that reverses the direction of
    the previous change.  Weights whose frequency exceeds the (annealed)
    threshold are frozen at their current latent value for the rest of
    training.

Everything is functional: tracking state is a pytree threaded through the
jitted train step (no module mutation), sized like the quantized kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from fp8_quantization_tpu.ops import quantizer as q
from fp8_quantization_tpu.ops.quantizer import QuantizerSpec

# Per-layer weight specs: either one spec for the whole model, or a resolver
# ``path -> QuantizerSpec`` (models expose ``weight_spec_fn()`` mapping
# quant_setup preset overrides — fc4's 4-bit fc, fc4_dw8's 8-bit depthwise —
# onto parameter paths, so each layer is dampened/frozen against ITS grid).
SpecLike = Union[QuantizerSpec, Callable[[Tuple[str, ...]], QuantizerSpec]]


def _spec_at(spec: SpecLike, path: Tuple[str, ...]) -> QuantizerSpec:
    return spec(path) if callable(spec) else spec


@dataclasses.dataclass(frozen=True)
class OscillationConfig:
    """Flag-compatible knobs (reference: click_options.py:216-317)."""

    # dampening
    dampen_weight: float = 0.0             # 0 -> dampening off
    dampen_weight_final: Optional[float] = None
    dampen_anneal_start: float = 0.25      # fraction of total_steps
    # freezing
    freeze_threshold: float = 0.0          # 0 -> freezing off
    freeze_threshold_final: Optional[float] = None
    freeze_anneal_start: float = 0.25
    freeze_ema_momentum: float = 0.99
    total_steps: int = 1000

    @property
    def dampen(self) -> bool:
        return self.dampen_weight > 0

    @property
    def freeze(self) -> bool:
        return self.freeze_threshold > 0


def _anneal(start_val, final_val, step, total, anneal_start):
    """Cosine anneal start->final over [anneal_start*total, total]."""
    if final_val is None:
        return jnp.asarray(start_val, jnp.float32)
    t0 = anneal_start * total
    frac = jnp.clip((step - t0) / jnp.maximum(total - t0, 1), 0.0, 1.0)
    cos = 0.5 * (1 + jnp.cos(jnp.pi * (1 - frac)))
    return start_val + (final_val - start_val) * cos


def _walk_kernels(params: Dict[str, Any], quant: Dict[str, Any], fn,
                  path=()):
    """Apply ``fn(path, kernel, qstate) -> new_kernel_or_aux`` to every
    (kernel, weight-quantizer state) pair; returns the same nesting."""
    out = {}
    for key, sub in params.items():
        qsub = quant.get(key, {}) if isinstance(quant, dict) else {}
        if isinstance(sub, dict):
            inner = _walk_kernels(sub, qsub, fn, path + (key,))
            if inner:
                out[key] = inner
        elif key == "kernel" and isinstance(quant, dict) \
                and "weight_q" in quant:
            out[key] = fn(path, sub, quant["weight_q"]["q"])
    return out


def dampening_loss(params: Dict[str, Any], quant: Dict[str, Any],
                   spec: SpecLike) -> jax.Array:
    """sum((sg(Q(w)) - w)^2) over all quantized weight elements.

    Per-element sum (not mean) so the regularizer's pull on each weight,
    ``2*lambda*(w - Q(w))``, is independent of layer size — matching the
    paper's per-element formulation.  ``spec`` may be a per-path resolver
    (``model.weight_spec_fn()``) so preset overrides (fc4 / fc4_dw8) dampen
    each layer against its own grid.
    """
    total = jnp.asarray(0.0, jnp.float32)

    def _one(path, kernel, qstate):
        nonlocal total
        wq = q.apply(_spec_at(spec, path),
                     jax.tree.map(jax.lax.stop_gradient, qstate),
                     kernel, channel_axis=-1)
        total = total + jnp.sum((jax.lax.stop_gradient(wq) - kernel) ** 2)
        return None

    _walk_kernels(params, quant, _one)
    return total


def init_osc_state(params: Dict[str, Any], quant: Dict[str, Any],
                   spec: SpecLike) -> Dict[str, Any]:
    """Per-kernel tracking state: previous quantized value, direction of the
    last change, oscillation-frequency EMA, frozen mask + frozen values."""
    def _one(path, kernel, qstate):
        wq = q.apply(_spec_at(spec, path), qstate, kernel, channel_axis=-1)
        return {
            "prev_q": wq,
            "prev_dir": jnp.zeros_like(kernel),
            "freq": jnp.zeros_like(kernel),
            "frozen": jnp.zeros(kernel.shape, jnp.bool_),
            "frozen_val": jnp.zeros_like(kernel),
        }

    return _walk_kernels(params, quant, _one)


def apply_freezing(params: Dict[str, Any], quant: Dict[str, Any],
                   osc_state: Dict[str, Any], spec: SpecLike,
                   step, cfg: OscillationConfig) -> Tuple[Dict, Dict, Dict]:
    """Post-optimizer-update freezing pass.

    Returns (params', osc_state', stats).  Oscillation = quantized value
    changed AND the change direction reversed; freq is EMA-updated; weights
    whose freq exceeds the annealed threshold are frozen (latent value
    pinned; future updates overwritten).
    """
    thresh = _anneal(cfg.freeze_threshold, cfg.freeze_threshold_final,
                     step, cfg.total_steps, cfg.freeze_anneal_start)
    m = cfg.freeze_ema_momentum
    n_frozen = jnp.asarray(0.0, jnp.float32)
    n_total = [0]

    new_state: Dict[str, Any] = {}

    def _one(path, kernel, qstate):
        nonlocal n_frozen
        st = osc_state
        for k in path:
            st = st[k]
        st = st["kernel"]

        # restore frozen latents first (optimizer may have moved them)
        w = jnp.where(st["frozen"], st["frozen_val"], kernel)

        wq = q.apply(_spec_at(spec, path), qstate, w, channel_axis=-1)
        changed = wq != st["prev_q"]
        direction = jnp.sign(wq - st["prev_q"])
        osc = changed & (direction == -st["prev_dir"]) & (st["prev_dir"] != 0)
        freq = m * st["freq"] + (1 - m) * osc.astype(jnp.float32)

        newly_frozen = (freq > thresh) & ~st["frozen"]
        frozen = st["frozen"] | newly_frozen
        frozen_val = jnp.where(newly_frozen, w, st["frozen_val"])
        w = jnp.where(frozen, frozen_val, w)

        _set_nested(new_state, path + ("kernel",), {
            "prev_q": wq,
            "prev_dir": jnp.where(changed, direction, st["prev_dir"]),
            "freq": freq, "frozen": frozen, "frozen_val": frozen_val,
        })
        n_frozen = n_frozen + jnp.sum(frozen)
        n_total[0] += int(kernel.size)
        return w

    new_kernels = _walk_kernels(params, quant, _one)
    new_params = _merge_kernels(params, new_kernels)
    stats = {"frozen_fraction": n_frozen / max(n_total[0], 1)}
    return new_params, new_state, stats


def _set_nested(tree: Dict, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def _merge_kernels(params: Dict[str, Any], kernels: Dict[str, Any]):
    out = dict(params)
    for key, sub in kernels.items():
        if isinstance(sub, dict):
            out[key] = _merge_kernels(params[key], sub)
        elif sub is not None:
            out[key] = sub
    return out
