"""Orbax checkpointing with the reference's run-directory layout.

The reference writes single .pth files {epoch, model_state_dict,
optimizer_states, loss, args} (utils.py:17-28), periodic
`checkpoint_epoch_{N}.pth` plus `best_model.pth` (train.py:566-575). Here a
checkpoint is an Orbax directory `checkpoint_epoch_{N}/` (sharding-aware,
async-capable) holding the full TrainState (params + BOTH optimizer states +
spectral stats + rng + step) plus a `meta.json` sidecar {epoch, loss, args}.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from vae_cyclegan_tpu.models.state import TrainState

_META = "meta.json"
_STATE_DIR = "state"


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(
    state: TrainState,
    epoch: int,
    loss: float,
    args: Optional[Dict[str, Any]],
    path: os.PathLike,
) -> None:
    """Write TrainState + metadata to `path/` (replaces utils.py:17-28)."""
    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    ckptr = _checkpointer()
    state_path = path / _STATE_DIR
    if state_path.exists():
        import shutil

        shutil.rmtree(state_path)
    ckptr.save(state_path, state)
    ckptr.wait_until_finished()
    meta = {"epoch": int(epoch), "loss": float(loss), "args": args or {}}
    with open(path / _META, "w") as f:
        json.dump(meta, f, indent=2)
    print(f"Checkpoint saved to {path}")


def checkpoint_exists(path: os.PathLike) -> bool:
    path = Path(path)
    return (path / _META).exists() and (path / _STATE_DIR).exists()


def load_checkpoint(
    target_state: TrainState, path: os.PathLike
) -> Tuple[TrainState, int, float, Dict[str, Any]]:
    """Restore a TrainState (shape/dtype template = target_state).

    Returns (state, epoch, loss, args). Replaces utils.py:31-54; the
    optimizer states ride inside the TrainState so no separate
    load_optimizer_states step exists.
    """
    path = Path(path).absolute()
    if not checkpoint_exists(path):
        raise FileNotFoundError(f"No checkpoint found at {path}")
    ckptr = _checkpointer()
    # Restore onto the target's shardings (replicated on the current mesh).
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, target_state
    )
    state = ckptr.restore(path / _STATE_DIR, abstract)
    with open(path / _META) as f:
        meta = json.load(f)
    print(
        f"Loaded checkpoint from {path} (epoch {meta['epoch']}, "
        f"loss {meta['loss']:.4f})"
    )
    return state, meta["epoch"], meta["loss"], meta.get("args", {})
