"""Checkpointing: orbax save/restore with the reference's logical layout.

Behavioral reference: trainer.py:638-688 — per-epoch folders
``<log>/<model>/models/weights_<epoch>/`` holding per-module weights plus
optimizer state; the encoder record embeds height/width/use_stereo for
inference-time shape recovery (:652-656). Loading intersects keys so
partial checkpoints warm-start cleanly (:676-678).

Here one orbax checkpoint per epoch folder stores
{params, batch_stats, opt_state, step, meta}; ``load_checkpoint`` with
``modules=[...]`` restores a subset (the reference's models_to_load).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    folder: str,
    state,
    opt=None,
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Save TrainState (+ config meta) into ``folder`` (an epoch dir)."""
    folder = os.path.abspath(folder)
    os.makedirs(os.path.dirname(folder) or ".", exist_ok=True)
    payload = {
        "params": _to_numpy(state.params),
        "batch_stats": _to_numpy(state.batch_stats),
        "opt_state": _to_numpy(state.opt_state),
        "step": np.asarray(state.step),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(folder, payload, force=True)
    ckptr.wait_until_finished()

    m = dict(meta or {})
    if opt is not None:
        # shape recovery at inference (reference trainer.py:652-656)
        m.update(
            {"height": opt.height, "width": opt.width, "use_stereo": opt.use_stereo}
        )
    with open(folder + ".meta.json", "w") as f:
        json.dump(m, f, indent=2, default=str)
    return folder


def load_checkpoint(folder: str, target_payload=None) -> Dict[str, Any]:
    """Restore a full checkpoint dict {params, batch_stats, opt_state, step}."""
    ckptr = ocp.StandardCheckpointer()
    if target_payload is not None:
        target = {
            "params": _to_numpy(target_payload["params"]),
            "batch_stats": _to_numpy(target_payload["batch_stats"]),
            "opt_state": _to_numpy(target_payload["opt_state"]),
            "step": np.zeros((), np.int32),
        }
        return ckptr.restore(os.path.abspath(folder), target)
    return ckptr.restore(os.path.abspath(folder))


def load_modules(
    folder: str, variables: Dict[str, Any], modules: Sequence[str]
) -> Dict[str, Any]:
    """Warm-start selected sub-modules (reference models_to_load semantics).

    variables: {'params': {...}, 'batch_stats': {...}} to update in place
    (functionally — returns new dict).
    """
    restored = load_checkpoint(folder)
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    for m in modules:
        if m in restored["params"]:
            params[m] = restored["params"][m]
        if m in restored.get("batch_stats", {}):
            stats[m] = restored["batch_stats"][m]
    return {"params": params, "batch_stats": stats}


def read_meta(folder: str) -> Dict[str, Any]:
    path = folder + ".meta.json"
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}
