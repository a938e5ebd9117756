"""Calibration + evaluation drivers.

Reference counterparts: pass_data_for_range_estimation
(quantization/utils.py:74-115) and the ignite evaluator loop
(image_net.py:72-96).  Here both are jit-compiled steps threaded over
batches; with inputs sharded over a mesh's data axis the same code runs
data-parallel multi-chip (see parallel/).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


def partial_quant_updates(new: dict, old: dict, stop_after: str) -> dict:
    """Keep quant updates up to AND INCLUDING the module named ``stop_after``
    (a key name, or a '/'-joined path prefix); later quantizers keep their
    pre-batch state.

    The functional counterpart of the reference's StopForwardException
    early-exit (quantization/utils.py:108-113, utils/utils.py:268-276):
    exceptions can't cross a jit boundary, but because the passed-through
    leaves don't depend on the forward, XLA dead-code-eliminates every op
    downstream of the target layer — the compiled step physically stops
    there.  Collection key order is module first-use order (execution
    order), the same ordering the reference's hook relies on.
    """
    done = [False]

    def rec(n, o, path):
        out = {}
        for k, v in n.items():
            p = path + (k,)
            if done[0]:
                out[k] = o[k]
            elif isinstance(v, dict):
                out[k] = rec(v, o[k], p)
                if k == stop_after or "/".join(p) == stop_after:
                    done[0] = True
            else:
                out[k] = v
        return out

    masked = rec(new, old, ())
    if not done[0]:
        raise ValueError(f"stop_after={stop_after!r} matched no module in "
                         f"the quant collection")
    return masked


def calibrate(model, variables: dict, batches: Iterable, *,
              num_batches: Optional[int] = None, quant_w: bool = True,
              quant_a: bool = True, donate: bool = False,
              stop_after: Optional[str] = None) -> dict:
    """Run <= num_batches through the model in 'calibrate' mode, threading the
    'quant' collection (estimator carries + quantizer params) batch to batch.

    Matches reference semantics exactly: ranges update *during* the forward,
    so deeper layers calibrate on activations produced with the shallower
    layers' just-updated ranges (quantization/utils.py:74-115 + the
    estimate_ranges state machine).

    ``donate=True`` donates the quant-state buffers between steps — it also
    invalidates ``variables['quant']`` held by the caller, so only enable it
    when the input dict is throwaway.

    ``stop_after`` calibrates only the layers up to and including the named
    module and dead-code-eliminates the rest of the forward (the reference's
    StopForwardException partial-forward mode; see partial_quant_updates).
    """

    # `others` is an explicit jit ARGUMENT, not a closure: closed-over
    # device arrays are baked into the executable as constants, so every
    # calibrate compile would serialize + upload the full parameter set
    # (~90 MB for ViT-S) through the dev tunnel and bloat the persistent
    # compile cache; as arguments they stay resident on the device.
    @partial(jax.jit, donate_argnums=(1,) if donate else ())
    def step(others, quant_state, x):
        _, updates = model.apply(
            {**others, "quant": quant_state}, x, mode="calibrate",
            quant_w=quant_w, quant_a=quant_a, mutable=["quant"])
        if stop_after is not None:
            return partial_quant_updates(updates["quant"], quant_state,
                                         stop_after)
        return updates["quant"]

    others = {k: v for k, v in variables.items() if k != "quant"}
    quant_state = variables["quant"]
    for i, batch in enumerate(batches):
        if num_batches is not None and i >= num_batches:
            break
        x = batch[0] if isinstance(batch, (tuple, list)) else batch
        quant_state = step(others, quant_state, x)
        log.info("calibration batch %d done", i)
    return {**variables, "quant": quant_state}


def make_eval_step(model, *, quant_w: bool = True, quant_a: bool = True,
                   mode: str = "fixed") -> Callable:
    """jit-compiled (variables, x, y) -> dict of sufficient statistics."""

    @jax.jit
    def eval_step(variables, x, y):
        logits = model.apply(variables, x, mode=mode,
                             quant_w=quant_w, quant_a=quant_a)
        log_probs = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(log_probs, y[:, None], axis=-1)[:, 0]
        top1 = (jnp.argmax(logits, axis=-1) == y)
        top5 = jnp.any(jnp.argsort(logits, axis=-1)[:, -5:] == y[:, None], axis=-1)
        return {"loss_sum": jnp.sum(nll), "top1_sum": jnp.sum(top1),
                "top5_sum": jnp.sum(top5),
                "count": jnp.asarray(y.shape[0], jnp.float32)}

    return eval_step


def evaluate(model, variables: dict, batches: Iterable, *,
             quant_w: bool = True, quant_a: bool = True, mode: str = "fixed",
             max_batches: Optional[int] = None) -> dict:
    """Top-1/top-5/loss over a dataset (reference metrics: image_net.py:73-84)."""
    eval_step = make_eval_step(model, quant_w=quant_w, quant_a=quant_a, mode=mode)
    totals = None
    for i, (x, y) in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        stats = eval_step(variables, x, y)
        totals = stats if totals is None else \
            jax.tree.map(lambda a, b: a + b, totals, stats)
    if totals is None:
        raise ValueError("no evaluation batches")
    n = float(totals["count"])
    return {"top_1_accuracy": float(totals["top1_sum"]) / n,
            "top_5_accuracy": float(totals["top5_sum"]) / n,
            "loss": float(totals["loss_sum"]) / n,
            "num_examples": int(n)}
