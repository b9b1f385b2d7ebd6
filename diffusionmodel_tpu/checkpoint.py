"""Checkpoint save/restore (SURVEY 2.8, 5.3-5.4).

The reference writes torch dicts {epoch, model/optimizer/scheduler
state_dicts, loss, metrics} (new_scripy.py:730-744), an early-stop dict
(new_scripy.py:606-610), and bare state_dicts (scripy_old.py:652-654), and
its loader tolerates several layouts (new_scripy.py:975-990). Here:

- primary format: orbax (async-capable, TPU-native) directories
  ``ckpt_ep{N}`` / ``best_model`` containing the full train pytree
  {params, batch_stats, opt_state, epoch, val_loss};
- a tolerant ``restore`` that accepts a full checkpoint, a params-only
  tree, or a torch ``.pt`` file converted through compat.torch_convert;
- unlike the reference (which never resumes), ``--resume`` restores
  model/opt/epoch — a capability upgrade justified by the checkpoint
  contents the reference already saves.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> str:
    """Save a checkpoint directory (orbax) or pickle file (path endswith .pkl)."""
    payload = dict(payload)
    for k in ("params", "batch_stats", "opt_state"):
        if k in payload and payload[k] is not None:
            payload[k] = _to_host(payload[k])
    if path.endswith(".pkl"):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        return path
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Tolerant loader: orbax dir, pickle, or torch .pt (via compat)."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            return pickle.load(f)
    if path.endswith((".pt", ".pth")):
        from diffusionmodel_tpu.compat.torch_convert import load_torch_checkpoint

        return load_torch_checkpoint(path)
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def extract_params(ckpt: Dict[str, Any]) -> Any:
    """Accept {params: ...} (full), {'model_state_dict': ...} (converted
    torch layout), or a bare params tree — mirroring the reference's
    fallback chain (new_scripy.py:975-990)."""
    if isinstance(ckpt, dict):
        if "params" in ckpt:
            return ckpt["params"]
        if "model_state_dict" in ckpt:
            return ckpt["model_state_dict"]
    return ckpt
