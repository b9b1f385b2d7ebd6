"""Checkpoint save/restore (SURVEY 2.8, 5.3-5.4).

The reference writes torch dicts {epoch, model/optimizer/scheduler
state_dicts, loss, metrics} (new_scripy.py:730-744), an early-stop dict
(new_scripy.py:606-610), and bare state_dicts (scripy_old.py:652-654), and
its loader tolerates several layouts (new_scripy.py:975-990). Here:

- primary format: checkpoint DIRECTORIES ``ckpt_ep{N}`` / ``best_model``
  containing the full train pytree {params, batch_stats, opt_state,
  epoch, val_loss}. The default on-disk layout inside the directory is a
  single atomic pickle (``payload.pkl``): this host's disk writes at
  ~3 MB/s (measured 2026-08-17, dd fdatasync) and orbax's per-leaf
  tensorstore layout is ~5x slower end-to-end than one sequential
  pickle stream (104.7s vs 18.8s for a 200 MB tree, measured). Pass
  ``fmt="orbax"`` for the orbax layout; ``load_checkpoint``
  auto-detects both;
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
    # chunked+threaded fetch: a per-leaf np.asarray hits the tunneled
    # platform's ~5 MB/s large-array path (the flagship model has a
    # 604 MB leaf -> minutes per save); see utils/transfer.py.
    from diffusionmodel_tpu.utils.transfer import fetch_tree

    return fetch_tree(tree)


_PICKLE_NAME = "payload.pkl"


def save_checkpoint(path: str, payload: Dict[str, Any],
                    fmt: str = "pickle") -> str:
    """Save a checkpoint directory or pickle file (path endswith .pkl).

    Directory layouts: ``fmt="pickle"`` (default — one atomic
    ``payload.pkl``, written to a temp dir then renamed so a crash never
    leaves a half-written checkpoint that looks complete) or
    ``fmt="orbax"``. See the module docstring for why pickle is the
    default on this host.
    """
    payload = dict(payload)
    for k in ("params", "batch_stats", "opt_state", "ema_params"):
        if k in payload and payload[k] is not None:
            payload[k] = _to_host(payload[k])
    if path.endswith(".pkl"):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
        return path
    path = os.path.abspath(path)
    if fmt == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
        return path
    import glob
    import shutil

    tmp_dir = f"{path}.tmp-{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    with open(os.path.join(tmp_dir, _PICKLE_NAME), "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    if os.path.isdir(path):
        # Swap via rename-aside, NOT rmtree-then-rename: a kill landing
        # between rmtree and rename would destroy the only copy (this
        # host's pipeline kills long jobs at its deadline as a matter of
        # course). With rename-aside every instant has either the old or
        # the new checkpoint reachable (the loader also knows to fall
        # back to a stranded ``.old-*`` dir).
        old_dir = f"{path}.old-{os.getpid()}"
        os.rename(path, old_dir)
        os.rename(tmp_dir, path)
        shutil.rmtree(old_dir, ignore_errors=True)
    else:
        os.rename(tmp_dir, path)
    # best-effort cleanup of leftovers from previously killed writers of
    # THIS checkpoint name (their PIDs are gone; the dirs are dead weight
    # and confuse "newest checkpoint" globs)
    for stale in glob.glob(f"{path}.tmp-*") + glob.glob(f"{path}.old-*"):
        shutil.rmtree(stale, ignore_errors=True)
    return path


def load_checkpoint(path: str, arch: Optional[str] = None,
                    norm: str = "batch") -> Dict[str, Any]:
    """Tolerant loader: orbax dir, pickle, or torch .pt (via compat).

    For ``.pt``/``.pth`` files, ``arch``/``norm`` (from the ModelConfig)
    select the compat converter that maps the torch state dict (flat
    ``nn_model.*`` keys, OIHW kernels) onto this package's flax trees.
    Without ``arch`` a torch file cannot be used as model weights — the raw
    numpy state dict is returned under ``torch_state_dict`` so callers get a
    clear error instead of a flax param-structure mismatch.
    """
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            return pickle.load(f)
    if not os.path.isdir(path):
        # recover from a save interrupted between its two renames: the
        # previous checkpoint survives as ``<path>.old-<pid>``
        import glob

        stranded = sorted(glob.glob(f"{path}.old-*"), key=os.path.getmtime)
        if stranded:
            path = stranded[-1]
    if os.path.isdir(path) and os.path.exists(
            os.path.join(path, _PICKLE_NAME)):
        with open(os.path.join(path, _PICKLE_NAME), "rb") as f:
            return pickle.load(f)
    if path.endswith((".pt", ".pth")):
        from diffusionmodel_tpu.compat.torch_convert import (
            convert_state_dict,
            load_torch_checkpoint,
        )

        raw = load_torch_checkpoint(path)
        sd = raw.pop("model_state_dict")
        if arch is None:
            return {"torch_state_dict": sd, **raw}
        params, batch_stats = convert_state_dict(sd, arch, norm)
        return {"params": params, "batch_stats": batch_stats, **raw}
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def extract_params(ckpt: Dict[str, Any], prefer_ema: bool = True) -> Any:
    """Accept {params: ...} (full), {'model_state_dict': ...} (converted
    torch layout), or a bare params tree — mirroring the reference's
    fallback chain (new_scripy.py:975-990).

    When the checkpoint carries an EMA shadow tree (train.ema_decay > 0
    runs), ``prefer_ema`` returns it instead of the live params — EMA
    exists to be sampled from. Pass False for the raw training params
    (resume does, so optimization continues from the live weights)."""
    if isinstance(ckpt, dict):
        if "torch_state_dict" in ckpt:
            raise ValueError(
                "torch .pt checkpoint was loaded without an arch — pass "
                "arch/norm (from the ModelConfig) to load_checkpoint so the "
                "state dict is converted to flax params")
        if prefer_ema and ckpt.get("ema_params") is not None:
            return ckpt["ema_params"]
        if "params" in ckpt:
            return ckpt["params"]
        if "model_state_dict" in ckpt:
            return ckpt["model_state_dict"]
    return ckpt
