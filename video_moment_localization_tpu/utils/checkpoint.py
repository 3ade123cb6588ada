"""Checkpoint save/restore via orbax.

Surface matches the reference's semantics (reference main.py:213-218,
237-241, 270-274): one checkpoint per experiment at
``{checkpoint_path}/{experiment}_model.ckpt`` holding
{epoch, params, optimizer state}, overwritten every epoch, reloaded when
``resume_training`` is set to continue at epoch+1. Improvements over the
reference: optimizer state round-trips through a structure-preserving
state-dict (optax namedtuples restore intact), and the training data-order
RNG needs no saving at all because the input pipeline derives every draw
from (seed, epoch, index) — resume is bit-reproducible (the reference lost
RNG state on resume, SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

import orbax.checkpoint as ocp


def checkpoint_paths(checkpoint_path: str, experiment: str) -> Tuple[str, str]:
    """(model checkpoint path, stats json path) for an experiment."""
    prefix = os.path.join(checkpoint_path, f"{experiment}_")
    return prefix + "model.ckpt", prefix + "stats.json"


def _checkpointer() -> ocp.Checkpointer:
    """A Checkpointer whose barrier scope matches who actually saves.

    Under multi-process (jax.distributed active) only process 0 writes
    checkpoints (params are fully replicated, trainer.fit gates the call)
    — but orbax's default save ends with a GLOBAL barrier, which would
    deadlock the processes that never call save. Restricting
    active_processes to {0} scopes the barrier to the one caller.
    """
    if jax.process_count() > 1:
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}),
        )
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, epoch: int, params: Any, opt_state: Any) -> None:
    """Overwrite the experiment checkpoint with the current train state."""
    state = {
        "epoch": np.int64(epoch),
        "params": serialization.to_state_dict(jax.tree.map(np.asarray, params)),
        "opt_state": serialization.to_state_dict(jax.tree.map(np.asarray, opt_state)),
    }
    abspath = os.path.abspath(path)
    os.makedirs(os.path.dirname(abspath), exist_ok=True)
    _checkpointer().save(abspath, state, force=True)


def restore_checkpoint(
    path: str, params_template: Any, opt_state_template: Any = None
) -> Optional[Dict[str, Any]]:
    """Restore {epoch, params, opt_state} or None if no checkpoint exists.

    Templates define the pytree structure (incl. optax namedtuples) that the
    stored arrays are poured back into. Pass ``opt_state_template=None`` for
    inference-only restores (opt_state comes back None).
    """
    abspath = os.path.abspath(path)
    if not os.path.exists(abspath):
        return None
    raw = ocp.PyTreeCheckpointer().restore(abspath)
    params = serialization.from_state_dict(params_template, raw["params"])
    opt_state = (
        serialization.from_state_dict(opt_state_template, raw["opt_state"])
        if opt_state_template is not None else None
    )
    return {"epoch": int(raw["epoch"]), "params": params, "opt_state": opt_state}
