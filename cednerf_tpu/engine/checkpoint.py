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


def _ckpt_tree(state, step: int, key=None, bucket: int = 0, steady: int = 0):
    if key is None:
        key = np.zeros(2, np.uint32)
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "occ": {
            "occs": state.occ.occs,
            "binaries": state.occ.binaries,
            "aabbs": state.occ.aabbs,
        },
        "step": np.asarray(step),
        "key": np.asarray(key, np.uint32),
        "bucket": np.asarray(bucket),
        # the Trainer's adaptive steady-march lattice (0 = none recorded):
        # without it a resumed run would drop back to the configured lattice
        # and re-truncate until the auto-repair re-fires (ADVICE r3 #1)
        "steady": np.asarray(steady),
    }


def _shape_meta(params) -> dict:
    """Stable {path: shape} map of the param tree (for mismatch diagnosis)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {jax.tree_util.keystr(p): list(np.shape(l)) for p, l in flat}


def save_checkpoint(path: str, state, step: int, key=None, bucket: int = 0,
                    steady: int = 0):
    """Write {params, opt_state, occ, step, key, bucket, steady} to `path`
    (a dir).

    `key`/`bucket`/`steady` are the Trainer's RNG key, current ray bucket,
    and adaptive steady-march lattice; saving them makes a mid-run resume
    bit-exact with the uninterrupted run.

    A side-car `param_shapes.json` records every parameter's shape so a load
    under a different encoder config (e.g. --hash_levels/--hash_features
    changing the table split, ADVICE r1 #5) fails with a message naming the
    mismatched tensors instead of an orbax structure error."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _ckpt_tree(state, step, key, bucket, steady), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "param_shapes.json"), "w") as f:
        json.dump(_shape_meta(state.params), f)


def load_checkpoint(path: str, state) -> tuple:
    """Restore into the structure of `state`; returns (state, step).

    (Use `load_checkpoint_full` for the RNG key + bucket as well.)"""
    state, step, _, _, _ = load_checkpoint_full(path, state)
    return state, step


def load_checkpoint_full(path: str, state) -> tuple:
    """Returns (state, step, key [2] uint32, bucket int, steady int).
    steady == 0 means the checkpoint predates the field (keep the
    configured lattice).

    Raises ValueError naming the mismatched parameter shapes when the
    checkpoint was written under a different model config (the usual cause:
    a different --hash_levels/--hash_features encoder split)."""
    import json

    import orbax.checkpoint as ocp

    from ..ops.occupancy import OccGridState

    path = os.path.abspath(path)
    meta_path = os.path.join(path, "param_shapes.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            saved = json.load(f)
        here = _shape_meta(state.params)
        bad = sorted(
            f"{k}: checkpoint {saved.get(k)} vs model {here.get(k)}"
            for k in set(saved) | set(here)
            if saved.get(k) != here.get(k)
        )
        if bad:
            raise ValueError(
                "checkpoint/model parameter shapes differ (was it trained "
                "with different --hash_levels/--hash_features or grid "
                "flags?):\n  " + "\n  ".join(bad)
            )
    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(path, _ckpt_tree(state, 0))
    except Exception:
        try:
            # pre-steady layout
            older = _ckpt_tree(state, 0)
            older.pop("steady")
            restored = dict(ckptr.restore(path, older))
            restored["steady"] = np.asarray(0)
        except Exception:
            # legacy layout (pre key/bucket): restore without them
            legacy = _ckpt_tree(state, 0)
            legacy.pop("key"); legacy.pop("bucket"); legacy.pop("steady")
            restored = dict(ckptr.restore(path, legacy))
            restored["key"] = np.zeros(2, np.uint32)
            restored["bucket"] = np.asarray(0)
            restored["steady"] = np.asarray(0)
    occ = OccGridState(
        occs=restored["occ"]["occs"],
        binaries=restored["occ"]["binaries"],
        aabbs=restored["occ"]["aabbs"],
    )
    new_state = state._replace(params=restored["params"],
                               opt_state=restored["opt_state"], occ=occ)
    return (new_state, int(restored["step"]), restored["key"],
            int(restored["bucket"]), int(restored["steady"]))


def _prop_ckpt_tree(state, occ, step: int, key=None):
    if key is None:
        key = np.zeros(2, np.uint32)
    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(step),
        "key": np.asarray(key, np.uint32),
    }
    if occ is not None:
        tree["occ"] = {"occs": occ.occs, "binaries": occ.binaries,
                       "aabbs": occ.aabbs}
    return tree


def save_prop_checkpoint(path: str, state, occ, step: int, key=None):
    """Checkpoint the proposal path (engine/train_prop.py PropTrainState).

    The reference's prop clone keeps the occ script's save/--load_model/
    --render_video contract (train_prop_real.py:213,459,547); this is its
    state surface: joint {field, props} params + optimizer, the eval-culling
    occupancy grid (PropTrainer.occ — None when occ_eval is off), step, RNG.
    """
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _prop_ckpt_tree(state, occ, step, key), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "param_shapes.json"), "w") as f:
        json.dump(_shape_meta(state.params), f)


def load_prop_checkpoint(path: str, state, occ):
    """Restore a prop checkpoint into the structure of (state, occ).

    Returns (state, occ, step, key). `occ` is the template OccGridState to
    restore into (None skips the occ subtree — e.g. occ_eval=False runs).
    Raises ValueError naming mismatched parameter shapes like
    load_checkpoint_full."""
    import json

    import orbax.checkpoint as ocp

    from ..ops.occupancy import OccGridState

    path = os.path.abspath(path)
    meta_path = os.path.join(path, "param_shapes.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            saved = json.load(f)
        here = _shape_meta(state.params)
        bad = sorted(
            f"{k}: checkpoint {saved.get(k)} vs model {here.get(k)}"
            for k in set(saved) | set(here)
            if saved.get(k) != here.get(k)
        )
        if bad:
            raise ValueError(
                "prop checkpoint/model parameter shapes differ (different "
                "--hash_levels/--hash_features or proposal config?):\n  "
                + "\n  ".join(bad)
            )
    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(path, _prop_ckpt_tree(state, occ, 0))
    except Exception:
        if occ is None:
            raise
        # checkpoint written without an occ grid (occ_eval=False run)
        restored = dict(ckptr.restore(path, _prop_ckpt_tree(state, None, 0)))
    new_occ = occ
    if "occ" in restored and occ is not None:
        new_occ = OccGridState(
            occs=restored["occ"]["occs"],
            binaries=restored["occ"]["binaries"],
            aabbs=restored["occ"]["aabbs"],
        )
    new_state = state._replace(params=restored["params"],
                               opt_state=restored["opt_state"])
    return new_state, new_occ, int(restored["step"]), restored["key"]
