"""Checkpoint / resume: structured array checkpoints via orbax.

Replaces the reference's checkpointing (SURVEY.md §5): joblib-pickled
``vars.pkl`` + whole-model ``model.pt`` every ``save_freq`` epochs
(``openAIppo.py:507-508``, ``logx.py:180-280``) and ``.mat`` code dumps
(``fileHandler.saveCodeInstance``).  Here a checkpoint is a pytree of
arrays: actor/critic params, optimizer states, PRNG key, the current code's
first-row tensor, and scalar counters — restorable mid-training, unlike the
reference's (no resume logic existed for interrupted sweeps).
"""

from __future__ import annotations

import pathlib

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _mgr(directory):
    import orbax.checkpoint as ocp
    path = pathlib.Path(directory).absolute()
    path.mkdir(parents=True, exist_ok=True)
    return ocp.CheckpointManager(path)


def save_checkpoint(directory, step: int, state: dict) -> None:
    """Save a pytree-of-arrays state dict under ``directory/step``."""
    import orbax.checkpoint as ocp
    with _mgr(directory) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore_checkpoint(directory, step: int | None = None,
                       template=None) -> dict:
    """Restore the given (default: latest) step's state dict.

    ``template``: a pytree of arrays with the structure the caller wants
    back (e.g. freshly initialised optimizer states).  Without it, orbax
    returns plain nested dicts/lists, which cannot be fed back into optax
    — pass the template to restore NamedTuple-structured states intact.
    """
    import orbax.checkpoint as ocp
    with _mgr(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
        if template is None:
            return mgr.restore(step)
        return mgr.restore(step, args=ocp.args.StandardRestore(template))


def latest_step(directory) -> int | None:
    with _mgr(directory) as mgr:
        return mgr.latest_step()
