"""Network-aware global FP8 format allocation (beyond the reference).

The reference (and the paper) pick each quantizer's FP8 format — the
exponent/mantissa split of the 8 bits — *locally*, by per-tensor MSE
(``mse_estimator.py`` / the 111xM sweep in calibration/estimators.py).  A
locally-MSE-optimal format is not necessarily optimal for the *network*
output: early layers feed their quantization error through everything
downstream, and errors across layers interact.

Because every FP8 format costs the same 8 bits, the global problem has no
budget constraint — it is a pure combinatorial assignment.  This module
solves it by coordinate descent on the true objective:

    min over {M_q}  E_x || logits_quant(x; {M_q}) - logits_fp32(x) ||^2

``mantissa_bits`` is quantizer *state* (ops/quantizer.py init_state), not a
static config field, so candidate formats swap in by pytree surgery — the
jitted eval compiles ONCE and runs Q x C x passes times (TPU-friendly:
one executable, no retracing).

Guarantees: the incumbent assignment is always a candidate, so each step is
monotone non-increasing in network MSE; with minmax-calibrated ranges the
maxval state is format-independent and needs no re-calibration.  (For
MSE-calibrated ranges the stored maxval was chosen jointly with the old M;
the search still only ever *improves* the global objective, it just
explores maxvals as-is.)

No reference counterpart — TPU-first value-add on top of SURVEY §2 rows
1/5 (FP8 quantizer + range estimators).
"""

from __future__ import annotations

import logging
from typing import Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)

QPath = Tuple[str, ...]


def find_fp8_quantizers(quant_state: dict) -> List[QPath]:
    """Paths of every FP8 quantizer state dict (has 'mantissa_bits') inside
    the 'quant' collection, in deterministic (sorted) traversal order."""
    out: List[QPath] = []

    def walk(node, path):
        if isinstance(node, dict):
            if "mantissa_bits" in node and "maxval" in node:
                out.append(path)
                return
            for k in sorted(node):
                walk(node[k], path + (k,))

    walk(quant_state, ())
    return out


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set_mbits(quant_state: dict, path: QPath, m: float) -> dict:
    """Copy-on-write update of one quantizer's mantissa_bits leaf."""

    def rec(node, i):
        if i == len(path):
            return {**node, "mantissa_bits": jnp.asarray(m, jnp.float32)}
        return {**node, path[i]: rec(node[path[i]], i + 1)}

    return rec(quant_state, 0)


def network_format_search(
    model, variables: dict, batches: Iterable, *,
    candidates: Sequence[int] = (2, 3, 4, 5),
    passes: int = 1,
    quant_w: bool = True, quant_a: bool = True,
) -> Tuple[dict, Dict[str, int], List[float]]:
    """Globally allocate per-quantizer FP8 mantissa bits by coordinate
    descent on quantized-vs-fp32 logits MSE.

    Args:
      model: quantized model (any engine).
      variables: calibrated variables (ranges frozen by the caller's
        calibration pass; this function only edits ``mantissa_bits``).
      batches: calibration batches (x or (x, y)); materialized once.
      candidates: mantissa widths to consider (sign bit excluded; the
        8-bit formats E5M2..E2M5 are m=2..5).
      passes: coordinate-descent sweeps over all quantizers.
      quant_w/quant_a: which sides to quantize during evaluation; the
        search still visits every FP8 quantizer state.

    Returns:
      (variables with the chosen formats, {"path/to/q": m} assignment,
       [initial_mse, mse after each pass]).
    """
    xs = [b[0] if isinstance(b, (tuple, list)) else b for b in batches]
    if not xs:
        raise ValueError("format search needs at least one batch")

    @jax.jit
    def fp32_logits(variables, x):
        return model.apply(variables, x, mode="fixed",
                           quant_w=False, quant_a=False)

    @jax.jit
    def qmse(quant_state, x, ref):
        out = model.apply({**variables, "quant": quant_state}, x,
                          mode="fixed", quant_w=quant_w, quant_a=quant_a)
        return jnp.mean((out - ref) ** 2)

    refs = [fp32_logits(variables, x) for x in xs]

    def total_mse(qs):
        """Network MSE over all batches as a DEVICE scalar (no host sync;
        the per-batch evals pipeline as async dispatches)."""
        s = jnp.zeros(())
        for x, r in zip(xs, refs):
            s = s + qmse(qs, x, r)
        return s

    quant_state = variables["quant"]
    paths = find_fp8_quantizers(quant_state)
    if not paths:
        log.warning("format search: no FP8 quantizer state found")
        return variables, {}, []

    # Incumbent network MSE is CACHED across coordinate steps (each step
    # changes exactly one quantizer, and the incumbent is re-used as
    # candidate 0 below) — O(Q*C) jitted evals per pass, not O(Q^2*C), with
    # ONE host sync per quantizer (the stacked candidate-loss pull).
    cur_mse = total_mse(quant_state)
    history = [float(cur_mse)]
    log.info("format search: %d quantizers, %d candidates, initial "
             "network MSE %.3e", len(paths), len(candidates), history[0])

    import numpy as np

    for p in range(passes):
        for path in paths:
            cur = float(_get(quant_state, path)["mantissa_bits"])
            cand_ms = [float(m) for m in candidates if float(m) != cur]
            losses = jnp.stack(
                [cur_mse] + [total_mse(_set_mbits(quant_state, path, m))
                             for m in cand_ms])
            losses_h = np.asarray(losses)          # one sync per quantizer
            k = int(losses_h.argmin())
            if k > 0:
                quant_state = _set_mbits(quant_state, path, cand_ms[k - 1])
                log.info("format search: %s M=%d -> M=%d (MSE %.3e)",
                         "/".join(path), int(cur), int(cand_ms[k - 1]),
                         losses_h[k])
            cur_mse = losses[k]
        history.append(float(cur_mse))
        log.info("format search pass %d done: network MSE %.3e",
                 p + 1, history[-1])

    assignment = {"/".join(path): int(_get(quant_state, path)["mantissa_bits"])
                  for path in paths}
    return {**variables, "quant": quant_state}, assignment, history
