"""Checkpoint save/restore (orbax).

The reference checkpoints only (radiance_field, occupancy_grid) state dicts
once at the end (train_real.py:433-441) and reloads them for video rendering
(--load_model, train_real.py:524-529). We keep that CLI contract but save the
full resumable state: params, optimizer state, occupancy grid, and step.
"""

import os
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state, step: int):
    """Write {params, opt_state, occ, step} to `path` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = {
        "params": state.params,
        "opt_state": state.opt_state,
        "occ": {
            "occs": state.occ.occs,
            "binaries": state.occ.binaries,
            "aabbs": state.occ.aabbs,
        },
        "step": np.asarray(step),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, ckpt, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, state) -> tuple:
    """Restore into the structure of `state`; returns (state, step)."""
    import orbax.checkpoint as ocp

    from ..ops.occupancy import OccGridState

    path = os.path.abspath(path)
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "occ": {
            "occs": state.occ.occs,
            "binaries": state.occ.binaries,
            "aabbs": state.occ.aabbs,
        },
        "step": np.asarray(0),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, template)
    occ = OccGridState(
        occs=restored["occ"]["occs"],
        binaries=restored["occ"]["binaries"],
        aabbs=restored["occ"]["aabbs"],
    )
    new_state = state._replace(params=restored["params"],
                               opt_state=restored["opt_state"], occ=occ)
    return new_state, int(restored["step"])
