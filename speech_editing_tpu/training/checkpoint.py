"""Checkpoint save/restore for TrainState pytrees.

Parity surface: reference checkpointing (``utils/commons/trainer.py:431-470``,
``utils/commons/ckpt_utils.py``): ``model_ckpt_steps_{N}.ckpt`` naming,
rolling retention of ``num_ckpt_keep`` newest, best-val tracking, atomic
write (tmp + rename), sub-tree loading for transfer learning.

Format: pickled dict {"state": numpy pytree, "steps", "epoch", "val_loss"}.
Arrays are host numpy — loading never requires the same device topology
(params are replicated back onto the mesh by the trainer).
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    # multi-host safe: replicated leaves read the local replica, sharded
    # leaves allgather (collective — save_checkpoint is called by every
    # process before gating the file write to process 0)
    from speech_editing_tpu.parallel.mesh import to_host_local

    return to_host_local(tree)


def get_all_ckpts(work_dir: str) -> list[str]:
    pattern = os.path.join(work_dir, "model_ckpt_steps_*.ckpt")
    return sorted(
        glob.glob(pattern),
        key=lambda x: -int(re.findall(r".*steps\_(\d+)\.ckpt", x)[0]))


def get_last_checkpoint(work_dir: str) -> Tuple[Optional[str], int]:
    ckpts = get_all_ckpts(work_dir)
    if not ckpts:
        return None, 0
    steps = int(re.findall(r".*steps\_(\d+)\.ckpt", ckpts[0])[0])
    return ckpts[0], steps


def save_checkpoint(work_dir: str, state: Any, steps: int, epoch: int = 0,
                    val_loss: Optional[float] = None, num_ckpt_keep: int = 3,
                    save_best: bool = False) -> str:
    os.makedirs(work_dir, exist_ok=True)
    # the gather below may be a collective (TP shards): run it on ALL
    # processes, then gate the file write to process 0 (reference rank-0
    # checkpointing, trainer.py:431-449). Assumes work_dir is shared (or
    # mirrored) across hosts, like the reference's single-node workdir.
    payload = {"state": _to_host(state), "steps": int(steps),
               "epoch": int(epoch), "val_loss": val_loss}
    path = os.path.join(work_dir, f"model_ckpt_steps_{steps}.ckpt")
    if jax.process_count() > 1 and jax.process_index() != 0:
        return path
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)  # atomic: a crash can't corrupt the latest ckpt
    for old in get_all_ckpts(work_dir)[num_ckpt_keep:]:
        os.remove(old)
    if save_best and val_loss is not None:
        best_path = os.path.join(work_dir, "model_ckpt_best.pt")
        best_loss = np.inf
        if os.path.exists(best_path):
            with open(best_path, "rb") as f:
                stored = pickle.load(f).get("val_loss")
            # explicit None check: a stored val_loss of 0.0 is a valid best
            best_loss = np.inf if stored is None else stored
        if val_loss < best_loss:
            tmp = best_path + ".part"
            with open(tmp, "wb") as f:
                pickle.dump(payload, f, protocol=4)
            os.replace(tmp, best_path)
    return path


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_state(payload: dict, target_state: Any) -> Any:
    """Structure-check the pickled pytree against a freshly built state."""
    flat_t, treedef_t = jax.tree.flatten(target_state)
    flat_l, treedef_l = jax.tree.flatten(payload["state"])
    if treedef_t != treedef_l:
        raise ValueError(
            f"checkpoint tree mismatch:\n saved={treedef_l}\n want={treedef_t}")
    for a, b in zip(flat_t, flat_l):
        if hasattr(a, "shape") and tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(f"shape mismatch {a.shape} vs {np.shape(b)}")
    return jax.tree.unflatten(treedef_t, flat_l)


def load_subtree(path: str, key_path: str) -> Any:
    """Extract a params sub-tree by '/'-joined path, for transfer learning
    (reference load_ckpt sub-model extraction, ckpt_utils.py:26-66)."""
    payload = load_checkpoint(path)
    node = payload["state"].params if hasattr(payload["state"], "params") \
        else payload["state"]["params"]
    for part in key_path.split("/"):
        if part:
            node = node[part]
    return node
