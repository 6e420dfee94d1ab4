"""Checkpoint save / load with the reference's best/final semantics.

Reference: lib/funcs_utils.py:111-128 (checkpoint{N}.pth.tar per epoch,
best.pth.tar on test-error improvement, final.pth.tar at the end; payload
carries model/optimizer/scheduler state plus loss and error histories) and
the resume path lib/core/base.py:67-92.

Format: flax.serialization msgpack of the host-fetched state pytree —
single file, no framework lock-in, loadable without the model class
(state_dict form).
"""
from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    ckpt_dir: str,
    epoch: int,
    state: Any,
    *,
    train_log: Optional[list] = None,
    test_log: Optional[dict] = None,
    is_best: bool = False,
    is_final: bool = False,
) -> str:
    """Write checkpoint{epoch}.ckpt (+ best.ckpt / final.ckpt copies)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "epoch": epoch,
        "state": serialization.to_state_dict(_to_host(state)),
        "train_log": train_log or [],
        "test_log": test_log or {"surface": [], "joint": []},
    }
    blob = serialization.msgpack_serialize(payload)
    path = osp.join(ckpt_dir, f"checkpoint{epoch}.ckpt")
    with open(path, "wb") as f:
        f.write(blob)
    for flag, name in ((is_best, "best.ckpt"), (is_final, "final.ckpt")):
        if flag:
            with open(osp.join(ckpt_dir, name), "wb") as f:
                f.write(blob)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not osp.isdir(ckpt_dir):
        return None
    best_epoch, best_path = -1, None
    for name in os.listdir(ckpt_dir):
        for suffix in (".ckpt", ".pth.tar"):  # native + reference formats
            if name.startswith("checkpoint") and name.endswith(suffix):
                try:
                    ep = int(name[len("checkpoint"):-len(suffix)])
                except ValueError:
                    continue
                if ep > best_epoch:
                    best_epoch, best_path = ep, osp.join(ckpt_dir, name)
    return best_path


def load_checkpoint(
    path_or_dir: str,
    target_state: Any = None,
    *,
    pick_best: bool = False,
) -> Dict[str, Any]:
    """Load a checkpoint; `target_state` (a TrainState template) restores
    typed pytrees, otherwise raw state dicts are returned.

    pick_best: prefer best.ckpt from a directory (the posenet-pretrained
    load path, lib/core/base.py:69).

    Reference-format interop: a `.pth.tar`/`.pth` path (the reference's
    published checkpoints, lib/funcs_utils.py:122-128) is converted on the
    fly via parity.convert — the engine and CLIs accept the reference's
    YAML paths unchanged."""
    path = path_or_dir
    if osp.isdir(path_or_dir):
        stems = ("best", "final") if pick_best else ("final", "best")
        candidates = [osp.join(path_or_dir, f"{stem}{ext}")
                      for stem in stems for ext in (".ckpt", ".pth.tar")]
        for candidate in candidates:
            if osp.exists(candidate):
                path = candidate
                break
        else:
            path = latest_checkpoint(path_or_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoints in {path_or_dir}")
        # make any substitution attributable: a caller asking for best.*
        # must know when it actually got final.* (or vice versa)
        want = stems[0]
        got = osp.basename(path).split(".")[0]
        if got != want:
            import warnings
            warnings.warn(
                f"load_checkpoint: {want}.* not found in {path_or_dir}; "
                f"loading {osp.basename(path)} instead")
    if path.endswith((".pth.tar", ".pth")):
        from ..parity.convert import load_torch_payload

        payload = load_torch_payload(path)
    else:
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
    if target_state is not None:
        payload["state"] = serialization.from_state_dict(
            target_state, payload["state"]
        )
    return payload
