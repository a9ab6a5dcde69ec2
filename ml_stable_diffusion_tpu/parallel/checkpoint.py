"""Training checkpoint save/resume (orbax).

The reference's "checkpoints" are its compiled model artifacts (SURVEY.md
section 5.4); for the training path this framework adds (parallel/train.py),
orbax provides sharding-aware save/restore of the full TrainState.
"""

from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp

from .train import TrainState


def save_train_state(directory: str | Path, state: TrainState):
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(directory).absolute(),
               {"params": state.params, "opt_state": state.opt_state,
                "step": state.step})
    ckptr.wait_until_finished()


def restore_train_state(directory: str | Path, template: TrainState) -> TrainState:
    """Restore with the template's structure/shardings."""
    ckptr = ocp.StandardCheckpointer()
    target = {"params": template.params, "opt_state": template.opt_state,
              "step": template.step}
    restored = ckptr.restore(Path(directory).absolute(), target)
    # re-pin every leaf to the template's sharding (orbax may restore
    # unsharded leaves to a single device)
    restored = jax.tree.map(
        lambda t, r: jax.device_put(r, t.sharding) if hasattr(t, "sharding") else r,
        target, restored)
    return TrainState(restored["params"], restored["opt_state"],
                      restored["step"])
