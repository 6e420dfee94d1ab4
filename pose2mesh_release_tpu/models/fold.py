"""Deploy-time BatchNorm folding for the MeshNet graph convs.

XLA cannot fuse elementwise ops INTO a Pallas custom call, so at inference
each ChebConv costs three HBM passes (kernel -> BN -> ReLU) over a
(V, B, F) activation.  Since eval-mode BN is affine per channel, it folds
exactly into the conv projection:

    BN(z) = z * s + (beta - mean * s),  s = gamma / sqrt(var + eps)
    =>  W' = W * s,  b' = b * s + beta - mean * s

and the ReLU moves inside the kernel (ops.pallas_cheby.
fused_cheby_project_relu), making each conv ONE pass.  Training is
unaffected — fold once after loading/finishing training:

    inf_vars = fold_bn_variables(variables)
    model = Pose2Mesh(..., inference_fused=True)
    model.apply(inf_vars, art, x, False)
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax.numpy as jnp

__all__ = ["fold_bn_variables"]

_BN_EPS = 1e-5  # matches nn.BatchNorm epsilon in models.meshnet.ChebConv


def fold_bn_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every pose2mesh.ChebConv_k BatchNorm into its kernel/bias.

    Returns a new variables dict for `inference_fused=True` models:
    MeshNet conv BN params/stats removed; the PoseNet lifter is left
    untouched (its BNs sit behind residual adds and are cheap)."""
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    mesh_p = dict(params.get("pose2mesh", {}))
    mesh_s = dict(stats.get("pose2mesh", {}))

    for name, conv in list(mesh_p.items()):
        if not name.startswith("ChebConv_") or "BatchNorm_0" not in conv:
            continue
        conv = dict(conv)
        bn_p = conv.pop("BatchNorm_0")
        bn_s = mesh_s.pop(name)["BatchNorm_0"]
        s = np.asarray(bn_p["scale"]) / np.sqrt(
            np.asarray(bn_s["var"]) + _BN_EPS
        )
        shift = np.asarray(bn_p["bias"]) - np.asarray(bn_s["mean"]) * s
        conv["kernel"] = jnp.asarray(np.asarray(conv["kernel"]) * s[None, :])
        conv["bias"] = jnp.asarray(np.asarray(conv["bias"]) * s + shift)
        mesh_p[name] = conv

    params["pose2mesh"] = mesh_p
    stats["pose2mesh"] = mesh_s
    return {"params": params, "batch_stats": stats}
