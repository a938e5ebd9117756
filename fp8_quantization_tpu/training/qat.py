"""Quantization-aware training (QAT) on TPU: optax optimizers, separate
quant-parameter optimizer, learnable ranges, BN re-estimation.

Reference counterparts:
  * optimizer factory          — utils/optimizer_utils.py:8-39
  * param separation           — quantization/utils.py:15-71
                                 (separate_quantized_model_params)
  * learn/estimate-range modes — quantization/utils.py:118-127
                                 (set_range_estimators) + Qstates
  * BN re-estimation           — utils/qat_utils.py:45-90 (reestimate_BN_stats)
  * training driver            — utils/supervised_driver.py:11-60

TPU-first design: one jitted ``train_step`` over a donated TrainState pytree;
under a `jax.sharding.Mesh` with the batch sharded on the data axis, XLA
inserts the gradient all-reduce automatically (no DDP wrapper — see
parallel/).  The reference's parameter<->buffer promotion
(make_range_trainable) becomes a *gradient mask*: quant-state leaves that the
config marks trainable receive updates from the quant optimizer; everything
else is frozen.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from fp8_quantization_tpu.nn.config import LayerQuantConfig
from fp8_quantization_tpu.ops.quantizer import QuantizerSpec, trainable_param_names
from fp8_quantization_tpu.training.oscillation import (
    OscillationConfig, apply_freezing, dampening_loss, init_osc_state)


# ---------------------------------------------------------------------------
# Optimizers (reference: utils/optimizer_utils.py:8-39 optimizer_lr_factory)
# ---------------------------------------------------------------------------

def make_schedule(learning_rate: float, scheduler: Optional[str] = None,
                  max_steps: int = 0, steps_per_epoch: int = 1):
    """LR schedule from a reference-style string spec — reference semantics
    (utils/optimizer_utils.py:8-19):

    ``multistep:10:20`` decays 10x at the listed EPOCHS (torch MultiStepLR,
    stepped per epoch — converted here with ``steps_per_epoch``);
    ``cosine:<eta_min>`` anneals lr -> eta_min (an ABSOLUTE final LR, torch
    CosineAnnealingLR) over ``max_steps``.
    """
    if not scheduler:
        return learning_rate
    kind, *opts = scheduler.split(":")
    opts = [o for o in opts if o]
    if kind == "multistep":
        milestones = [int(o) * max(steps_per_epoch, 1) for o in opts]
        return optax.piecewise_constant_schedule(
            learning_rate, {m: 0.1 for m in milestones})
    if kind == "cosine":
        eta_min = float(opts[0]) if opts else 0.0
        return optax.cosine_decay_schedule(
            learning_rate, max(max_steps, 1),
            alpha=eta_min / learning_rate if learning_rate else 0.0)
    raise ValueError(f"unknown scheduler {scheduler}")


def make_optimizer(name: str = "SGD", learning_rate: float = 1e-3,
                   momentum: float = 0.9, weight_decay: float = 0.0,
                   scheduler: Optional[str] = None, max_steps: int = 0,
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """SGD / Adam with optional schedule (reference: optimizer_utils.py:8-39)."""
    lr = make_schedule(learning_rate, scheduler, max_steps=max_steps,
                       steps_per_epoch=steps_per_epoch)
    name_l = name.lower()
    if name_l == "sgd":
        tx = optax.sgd(lr, momentum=momentum)
    elif name_l == "adam":
        tx = optax.adam(lr)
    else:
        raise ValueError(f"unknown optimizer {name}")
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


# ---------------------------------------------------------------------------
# Quant-state partition (reference: quantization/utils.py:15-71)
# ---------------------------------------------------------------------------

_QUANTIZER_NAMES = ("weight_q", "act_q")


def quant_trainable_mask(quant_tree: Dict[str, Any],
                         config: LayerQuantConfig) -> Dict[str, Any]:
    """Boolean pytree: which 'quant' collection leaves are trainable.

    A leaf ``.../weight_q/q/<name>`` is trainable iff ``<name>`` is in
    ``trainable_param_names(config.weight_quant)`` (same for act_q);
    estimator carries ('est') and bookkeeping (sign_bits/initialized) are
    never trainable.  This replaces the reference's nn.Parameter promotion
    (fp8_quantizer.py:242-254, uniform_quantizers.py:242-256).
    """
    def _names(spec: QuantizerSpec) -> tuple:
        return trainable_param_names(spec)

    allowed = {"weight_q": set(_names(config.weight_quant)),
               "act_q": set(_names(config.act_quant))}

    def _mask(path, leaf):
        keys = [p.key for p in path if isinstance(p, jax.tree_util.DictKey)]
        return (len(keys) >= 3 and keys[-2] == "q" and keys[-3] in allowed
                and keys[-1] in allowed[keys[-3]]
                and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating))

    # tree_map (not flatten_dict) so empty estimator-state dicts keep their
    # place in the structure (current_minmax has est == {}).
    return jax.tree_util.tree_map_with_path(_mask, quant_tree)


def partition_quant(quant_tree: Dict[str, Any], mask: Dict[str, Any]):
    """Split the quant collection into (trainable, frozen) trees of the same
    structure (non-selected positions hold None)."""
    train = jax.tree.map(lambda m, x: x if m else None, mask, quant_tree,
                         is_leaf=lambda x: x is None)
    frozen = jax.tree.map(lambda m, x: None if m else x, mask, quant_tree,
                          is_leaf=lambda x: x is None)
    return train, frozen


def merge_quant(train: Dict[str, Any], frozen: Dict[str, Any]):
    return jax.tree.map(lambda a, b: a if a is not None else b, train, frozen,
                        is_leaf=lambda x: x is None)


# ---------------------------------------------------------------------------
# Train state + step
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QATState:
    """Donated carry of the jitted train step."""

    params: Any
    quant_train: Any          # trainable quant leaves (None elsewhere)
    quant_frozen: Any         # frozen quant leaves (None at trainable slots)
    batch_stats: Any
    opt_state: Any
    quant_opt_state: Any
    step: jax.Array
    osc_state: Any = None        # oscillation-freezing tracker (optional)

    @property
    def quant(self):
        return merge_quant(self.quant_train, self.quant_frozen)

    def variables(self) -> dict:
        v = {"params": self.params, "quant": self.quant}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def init_qat_state(variables: dict, config: LayerQuantConfig,
                   model_tx: optax.GradientTransformation,
                   quant_tx: Optional[optax.GradientTransformation] = None,
                   oscillation: Optional[OscillationConfig] = None,
                   model=None) -> Tuple[QATState, Dict]:
    """Build the QATState from calibrated model variables.

    ``quant_tx=None`` trains quant params with the model optimizer
    (reference: --sep-quant-optimizer off, click_options.py:184-213).
    ``oscillation`` enables dampening/freezing (training/oscillation.py).
    ``model`` (optional): when the model exposes ``weight_spec_fn()`` the
    oscillation machinery resolves each layer's ACTUAL weight spec (preset
    overrides like fc4's 4-bit fc) instead of the base spec.
    Returns (state, aux) where aux holds the optax transforms for the step fn.
    """
    weight_spec = config.weight_quant
    if model is not None and hasattr(model, "weight_spec_fn"):
        weight_spec = model.weight_spec_fn()
    mask = quant_trainable_mask(variables["quant"], config)
    qtrain, qfrozen = partition_quant(variables["quant"], mask)
    quant_tx = quant_tx if quant_tx is not None else model_tx
    osc_state = None
    if oscillation is not None and oscillation.freeze:
        osc_state = init_osc_state(variables["params"], variables["quant"],
                                   weight_spec)
    state = QATState(
        params=variables["params"],
        quant_train=qtrain, quant_frozen=qfrozen,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=model_tx.init(variables["params"]),
        quant_opt_state=quant_tx.init(qtrain),
        step=jnp.zeros((), jnp.int32),
        osc_state=osc_state)
    return state, {"model_tx": model_tx, "quant_tx": quant_tx, "mask": mask,
                   "oscillation": oscillation,
                   "weight_spec": weight_spec}


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, labels))


def make_train_step(model, aux: Dict, *, mode: str = "learn",
                    loss_fn: Callable = cross_entropy,
                    train_bn: bool = True, donate: bool = True,
                    remat: bool = False):
    """One QAT step: forward (STE fake-quant) -> grads -> two optimizers.

    ``mode='learn'`` trains quant ranges through the STE (learn_ranges);
    ``mode='calibrate_train'`` keeps re-estimating ranges during training
    instead (estimate_ranges_train, quantization_manager.py:131-136) — in
    that mode range updates come back through the mutated 'quant' collection.

    ``remat=True`` rematerializes the forward in the backward pass
    (jax.checkpoint): fake-quantized activations are recomputed instead of
    stored, trading FLOPs for HBM — the standard lever for large-batch QAT.
    """
    model_tx, quant_tx = aux["model_tx"], aux["quant_tx"]

    def step(state: QATState, x, y):
        mutable = ["batch_stats"] + (["quant"] if mode == "calibrate_train" else [])

        def _forward(params, qtrain):
            variables = {"params": params,
                         "quant": merge_quant(qtrain, state.quant_frozen)}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            # per-step rng streams: stochastic-rounding discretizers +
            # classifier dropout (models/mobilenet_v2.py dropout_rate)
            rngs = {"quant_noise": jax.random.fold_in(
                        jax.random.PRNGKey(17), state.step),
                    "dropout": jax.random.fold_in(
                        jax.random.PRNGKey(23), state.step)}
            return model.apply(
                variables, x, mode=mode, train_bn=train_bn, mutable=mutable,
                rngs=rngs)

        fwd = jax.checkpoint(_forward) if remat else _forward
        osc: Optional[OscillationConfig] = aux.get("oscillation")

        def _loss(params, qtrain):
            logits, updates = fwd(params, qtrain)
            loss = loss_fn(logits, y)
            if osc is not None and osc.dampen:
                from fp8_quantization_tpu.training.oscillation import _anneal

                lam = _anneal(osc.dampen_weight, osc.dampen_weight_final,
                              state.step, osc.total_steps,
                              osc.dampen_anneal_start)
                loss = loss + lam * dampening_loss(
                    params, merge_quant(qtrain, state.quant_frozen),
                    aux["weight_spec"])
            return loss, (logits, updates)

        (loss, (logits, updates)), (gp, gq) = jax.value_and_grad(
            _loss, argnums=(0, 1), has_aux=True)(state.params, state.quant_train)

        p_updates, opt_state = model_tx.update(gp, state.opt_state, state.params)
        params = optax.apply_updates(state.params, p_updates)

        osc_state, osc_stats = state.osc_state, {}
        if osc is not None and osc.freeze and state.osc_state is not None:
            params, osc_state, osc_stats = apply_freezing(
                params, merge_quant(state.quant_train, state.quant_frozen),
                state.osc_state, aux["weight_spec"], state.step, osc)

        q_updates, quant_opt_state = quant_tx.update(
            gq, state.quant_opt_state, state.quant_train)
        quant_train = optax.apply_updates(state.quant_train, q_updates)

        quant_frozen = state.quant_frozen
        if mode == "calibrate_train":
            qt, qf = partition_quant(updates["quant"], aux["mask"])
            quant_train = jax.tree.map(
                lambda a, b: b if b is not None else a, quant_train, qt,
                is_leaf=lambda v: v is None)
            quant_frozen = qf

        new_state = QATState(
            params=params, quant_train=quant_train, quant_frozen=quant_frozen,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=opt_state, quant_opt_state=quant_opt_state,
            step=state.step + 1, osc_state=osc_state)
        metrics = {"loss": loss,
                   "accuracy": jnp.mean(jnp.argmax(logits, -1) == y)}
        metrics.update(osc_stats)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def train_epoch(model, state: QATState, aux: Dict, batches: Iterable, *,
                mode: str = "learn", train_bn: bool = True,
                step_fn=None) -> Tuple[QATState, Dict[str, float]]:
    """Drive one epoch; returns (state, mean metrics).  The ignite trainer
    engine (supervised_driver.py:11-60) collapses to this loop."""
    step_fn = step_fn or make_train_step(model, aux, mode=mode, train_bn=train_bn)
    totals, n = None, 0
    for x, y in batches:
        state, m = step_fn(state, jnp.asarray(x), jnp.asarray(y))
        totals = m if totals is None else jax.tree.map(jnp.add, totals, m)
        n += 1
    if n == 0:
        raise ValueError("no training batches")
    return state, {k: float(v) / n for k, v in totals.items()}


# ---------------------------------------------------------------------------
# BN re-estimation (reference: utils/qat_utils.py:45-90)
# ---------------------------------------------------------------------------

def reestimate_bn_stats(model, variables: dict, batches: Iterable, *,
                        num_batches: int = 50, bn_momentum: float = 0.1,
                        quant_w: bool = True, quant_a: bool = True) -> dict:
    """Replace BN running stats with the average of per-batch stats.

    The reference sets momentum=1 so each forward writes the batch stats into
    the running buffers, then averages over ``num_batches`` (qat_utils.py:45-90).
    Our BN layers update ``new = (1-m)*old + m*batch`` with m=bn_momentum, so
    the batch stats are recovered algebraically as ``(new - (1-m)*old)/m`` —
    no momentum plumbing needed, identical semantics (running_var already
    carries torch's unbiased-batch-var convention, nn/layers.py:97-100).
    """
    old = variables["batch_stats"]

    @jax.jit
    def batch_stats_of(bs, x):
        _, upd = model.apply(
            {**variables, "batch_stats": bs}, x, mode="fixed",
            quant_w=quant_w, quant_a=quant_a, train_bn=True,
            mutable=["batch_stats"])
        return jax.tree.map(
            lambda new, o: (new - (1.0 - bn_momentum) * o) / bn_momentum,
            upd["batch_stats"], bs)

    total, n = None, 0
    for i, batch in enumerate(batches):
        if i >= num_batches:
            break
        x = batch[0] if isinstance(batch, (tuple, list)) else batch
        bstats = batch_stats_of(old, jnp.asarray(x))
        total = bstats if total is None else jax.tree.map(jnp.add, total, bstats)
        n += 1
    if n == 0:
        raise ValueError("no batches for BN re-estimation")
    mean_stats = jax.tree.map(lambda t: t / n, total)
    return {**variables, "batch_stats": mean_stats}
