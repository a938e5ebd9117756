"""Checkpoint / resume via orbax.

Reference counterparts: ignite Checkpoint (utils/supervised_driver.py:40-51,
model+optimizer+scheduler each epoch, n_saved=1) and the quantized state-dict
load with its lazy-shape dummy-forward dance (base_quantized_model.py:34-62).
Here all shapes are static, so a checkpoint is just the pytree — model params,
batch stats, quant params (maxval/mantissa_bits/delta per layer), and both
optimizer states.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, tree: Any, step: int = 0,
                    keep: int = 1) -> str:
    """Save a pytree (variables dict or QATState) to ``ckpt_dir/step_<N>``."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    path = os.path.join(ckpt_dir, f"step_{step}")
    ckptr = _checkpointer()
    ckptr.save(path, jax.tree.map(lambda x: x, tree), force=True)
    ckptr.wait_until_finished()
    # prune old checkpoints (n_saved semantics, supervised_driver.py:47-50)
    steps = sorted(int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
                   if d.startswith("step_") and d.split("_")[1].isdigit())
    for s in steps[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"), ignore_errors=True)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_") and d.split("_")[1].isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure of ``target`` (an abstract or concrete
    pytree of the same shape/dtype layout)."""
    step = latest_step(ckpt_dir) if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x),
                                       jax.numpy.asarray(x).dtype), target)
    return _checkpointer().restore(path, abstract)
