"""Reference torch checkpoint -> flax parameter tree conversion.

Key map (reference state-dict names -> this framework's module tree):

  pose_lifter.w1                    -> pose_lifter/Dense_0
  pose_lifter.linear_stages.N.{w1,batch_norm1,w2,batch_norm2}
                                    -> pose_lifter/ResidualStage_N/{Dense_0,
                                       BatchNorm_0,Dense_1,BatchNorm_1}
  pose_lifter.w2                    -> pose_lifter/Dense_1
  pose2mesh.cl.K / pose2mesh.bn.K   -> pose2mesh/ChebConv_K/{kernel,bias} +
                                       BatchNorm_0
  pose2mesh.fc                      -> pose2mesh/Dense_0

torch Linear weights are (out, in) -> flax kernels (in, out) = W.T; the
Chebyshev kernel's fin-major K-interleaved row layout is identical on both
sides (cheby_graph_conv.py:30-37 == ops.cheby.chebyshev_stack), so cl
weights transpose straight in.  DataParallel 'module.' prefixes are
stripped (lib/funcs_utils.py:65-70).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["convert_cascade_state_dict", "convert_posenet_state_dict",
           "load_torch_checkpoint", "load_torch_payload"]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth.tar and return its (prefix-stripped)
    model_state_dict as numpy arrays."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state_dict", blob)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def load_torch_payload(path: str) -> Dict[str, Any]:
    """Load a reference .pth.tar and return it in this framework's checkpoint
    payload form: {"epoch", "state": {"params", "batch_stats", "step"},
    "train_log", "test_log"}.

    Auto-detects the model family from the state-dict keys: a full cascade
    checkpoint carries 'pose_lifter.' / 'pose2mesh.' prefixes
    (lib/models/pose2mesh_net.py:13-14), a standalone PoseNet checkpoint the
    bare 'w1.' / 'linear_stages.' names (lib/models/posenet.py:41-69).
    Reference payload schema: lib/funcs_utils.py:111-119.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(blob, dict):
        raise ValueError(f"unrecognized torch checkpoint: {path}")
    sd_raw = blob.get("model_state_dict", blob)
    sd = {}
    for k, v in sd_raw.items():
        if k.startswith("module."):  # DataParallel strip, funcs_utils.py:65-70
            k = k[len("module."):]
        sd[k] = np.asarray(v.detach().cpu().numpy())

    if any(k.startswith("pose_lifter.") or k.startswith("pose2mesh.") for k in sd):
        variables = convert_cascade_state_dict(sd)
    elif "w1.weight" in sd:
        variables = convert_posenet_state_dict(sd)
    else:
        raise ValueError(
            f"cannot identify reference model family in {path}: "
            f"keys like {sorted(sd)[:4]}"
        )
    test_log = blob.get("test_log", {})
    if not isinstance(test_log, dict):
        test_log = {"joint": list(np.asarray(test_log).ravel())}
    return {
        "epoch": int(blob.get("epoch", 0)),
        "state": {"params": variables["params"],
                  "batch_stats": variables["batch_stats"],
                  "step": 0},
        "train_log": list(np.asarray(blob.get("train_log", [])).ravel()),
        "test_log": test_log,
    }


def _dense(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T.astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _bn_params(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _bn_stats(sd, prefix):
    return {"mean": sd[f"{prefix}.running_mean"].astype(np.float32),
            "var": sd[f"{prefix}.running_var"].astype(np.float32)}


def convert_posenet_state_dict(sd: Dict[str, np.ndarray], prefix: str = ""
                               ) -> Dict[str, Any]:
    """PoseNet-only conversion; `prefix` is '' for a standalone posenet
    checkpoint or 'pose_lifter.' inside the cascade."""
    p = prefix
    params: Dict[str, Any] = {"Dense_0": _dense(sd, f"{p}w1"),
                              "Dense_1": _dense(sd, f"{p}w2")}
    stats: Dict[str, Any] = {}
    s = 0
    while f"{p}linear_stages.{s}.w1.weight" in sd:
        sp = f"{p}linear_stages.{s}"
        params[f"ResidualStage_{s}"] = {
            "BatchNorm_0": _bn_params(sd, f"{sp}.batch_norm1"),
            "Dense_0": _dense(sd, f"{sp}.w1"),
            "BatchNorm_1": _bn_params(sd, f"{sp}.batch_norm2"),
            "Dense_1": _dense(sd, f"{sp}.w2"),
        }
        stats[f"ResidualStage_{s}"] = {
            "BatchNorm_0": _bn_stats(sd, f"{sp}.batch_norm1"),
            "BatchNorm_1": _bn_stats(sd, f"{sp}.batch_norm2"),
        }
        s += 1
    return {"params": params, "batch_stats": stats}


def convert_cascade_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Full FlatPose2Mesh checkpoint -> {'params', 'batch_stats'} for
    models.pose2mesh.Pose2Mesh."""
    lifter = convert_posenet_state_dict(sd, "pose_lifter.")

    mesh_params: Dict[str, Any] = {"Dense_0": _dense(sd, "pose2mesh.fc")}
    mesh_stats: Dict[str, Any] = {}
    k = 0
    while f"pose2mesh.cl.{k}.weight" in sd:
        conv: Dict[str, Any] = {
            "kernel": sd[f"pose2mesh.cl.{k}.weight"].T.astype(np.float32),
            "bias": sd[f"pose2mesh.cl.{k}.bias"].astype(np.float32),
        }
        if f"pose2mesh.bn.{k}.weight" in sd:
            conv["BatchNorm_0"] = _bn_params(sd, f"pose2mesh.bn.{k}")
            mesh_stats[f"ChebConv_{k}"] = {
                "BatchNorm_0": _bn_stats(sd, f"pose2mesh.bn.{k}")
            }
        mesh_params[f"ChebConv_{k}"] = conv
        k += 1

    return {
        "params": {"pose_lifter": lifter["params"],
                   "pose2mesh": mesh_params},
        "batch_stats": {"pose_lifter": lifter["batch_stats"],
                        "pose2mesh": mesh_stats},
    }
