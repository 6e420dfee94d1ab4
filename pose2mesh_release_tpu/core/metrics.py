"""Evaluation metrics: MPJPE, PA-MPJPE (Procrustes), MPVPE, acceleration.

Reference: lib/coord_utils.py:127-149 (rigid_align via SVD Procrustes, run
per-sample in numpy) and :194-222 (acceleration error).  Here the Procrustes
solve is vmapped batched SVD on device — thousands of 3xN problems at once
instead of a Python loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mpjpe", "rigid_align", "pa_mpjpe", "mpvpe", "accel_error"]


def mpjpe(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Mean per-joint position error: pred/gt (..., J, 3)."""
    return jnp.linalg.norm(pred - gt, axis=-1).mean()


def _rigid_transform(pred: jax.Array, gt: jax.Array):
    """Least-squares similarity transform (scale, R, t) aligning pred -> gt.

    pred, gt: (J, 3).  Umeyama/Procrustes as in coord_utils.py:127-149.
    """
    mu_p = pred.mean(axis=0)
    mu_g = gt.mean(axis=0)
    pc = pred - mu_p
    gc = gt - mu_g
    var_p = (pc ** 2).sum()
    H = pc.T @ gc / pred.shape[0]
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) .at[2].set(d))
    R = Vt.T @ D @ U.T
    scale = (S * jnp.diag(D)).sum() * pred.shape[0] / var_p
    t = mu_g - scale * (R @ mu_p)
    return scale, R, t


def rigid_align(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Align pred to gt with a similarity transform; shapes (J, 3)."""
    s, R, t = _rigid_transform(pred, gt)
    return s * pred @ R.T + t


def pa_mpjpe(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Procrustes-aligned MPJPE over a batch: (B, J, 3)."""
    aligned = jax.vmap(rigid_align)(pred, gt)
    return jnp.linalg.norm(aligned - gt, axis=-1).mean()


def mpvpe(pred_mesh: jax.Array, gt_mesh: jax.Array) -> jax.Array:
    """Mean per-vertex position error: (B, V, 3)."""
    return jnp.linalg.norm(pred_mesh - gt_mesh, axis=-1).mean()


def accel_error(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Acceleration error over a time sequence (T, J, 3)
    (coord_utils.py:194-222): ||d2 pred/dt2 - d2 gt/dt2|| averaged."""
    accel_p = pred[:-2] - 2 * pred[1:-1] + pred[2:]
    accel_g = gt[:-2] - 2 * gt[1:-1] + gt[2:]
    return jnp.linalg.norm(accel_p - accel_g, axis=-1).mean()
