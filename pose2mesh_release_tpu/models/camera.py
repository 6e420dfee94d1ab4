"""Weak-perspective camera fitting for demo-time overlay.

Reference: lib/models/project_net.py:7-25 — cam = (s, tx, ty) in
NORMALIZED crop coordinates: pixels = ((xy + t) * s) * res/2 + res/2 —
plus the demo's 1500-step Adam fit with lr 0.1 -> 0.05@500 -> 0.001@1000
(demo/run.py:149-197).  TPU-native: the whole fit is ONE jitted
lax.fori_loop over optax Adam steps — no Python-loop eager dispatch — and
vmaps over multiple persons at once.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["project_weak", "fit_camera", "cam_to_pixel_params"]


def project_weak(joints3d: jax.Array, cam: jax.Array,
                 img_res: float = 250.0) -> jax.Array:
    """(..., J, 3) x (s, tx, ty) -> (..., J, 2) crop pixels
    (project_net.py:14-17: ((xy + t) * s) * res/2 + res/2)."""
    s = cam[..., :1]
    t = cam[..., 1:]
    half = img_res * 0.5
    return (joints3d[..., :2] + t[..., None, :]) * s[..., None, :] * half + half


def cam_to_pixel_params(cam, img_res: float = 250.0):
    """(s, tx, ty) normalized -> pixel-space (scale, tx_px, ty_px) for the
    rasterizer: xy_px = xy * scale + t_px."""
    half = img_res * 0.5
    s, tx, ty = float(cam[0]), float(cam[1]), float(cam[2])
    return s * half, tx * s * half + half, ty * s * half + half


def crop_cam_to_orig_params(cam, bbox):
    """Fitted crop camera -> pixel params on the ORIGINAL image.

    cam: (s, tx, ty) weak-perspective fitted against the square fit-crop;
    bbox: (x, y, w, h) of that crop in original-image pixels (w == h).
    Composing the crop projection with the inverse crop affine gives
    xy_px = xy * (s*h/2) + (cx + t*s*h/2) — the reference's
    convert_crop_cam_to_orig_img (demo/run.py:24-43) in this renderer's
    pixel convention, so the overlay lands on the input photo.
    """
    x, y, w, h = (float(v) for v in bbox)
    cx, cy = x + w * 0.5, y + h * 0.5
    s, tx, ty = float(cam[0]), float(cam[1]), float(cam[2])
    scale = s * h * 0.5
    return scale, cx + tx * scale, cy + ty * scale


def fit_camera(
    joints3d: jax.Array,     # (J, 3) or (P, J, 3) root-relative, meters
    target2d: jax.Array,     # matching (..., J, 2) crop pixels
    num_steps: int = 1500,
    img_res: float = 250.0,
    init: Tuple[float, float, float] = (1.0, 0.0, 0.0),
) -> jax.Array:
    """Fit (s, tx, ty) minimizing mean |project - target|; returns cam
    params of shape (..., 3).  LR schedule 0.1 -> 0.05@500 -> 0.001@1000
    (demo/run.py:178-189)."""
    sched = optax.join_schedules(
        [optax.constant_schedule(0.1), optax.constant_schedule(0.05),
         optax.constant_schedule(0.001)],
        boundaries=[500, 1000],
    )
    tx = optax.adam(sched)

    def fit_one(j3d, t2d):
        cam0 = jnp.asarray(init, jnp.float32)
        state0 = tx.init(cam0)

        def loss_fn(cam):
            return jnp.abs(project_weak(j3d, cam, img_res) - t2d).mean()

        def body(_, carry):
            cam, state = carry
            g = jax.grad(loss_fn)(cam)
            updates, state = tx.update(g, state, cam)
            return optax.apply_updates(cam, updates), state

        cam, _ = jax.lax.fori_loop(0, num_steps, body, (cam0, state0))
        return cam

    if joints3d.ndim == 2:
        return jax.jit(fit_one)(joints3d, target2d)
    return jax.jit(jax.vmap(fit_one))(joints3d, target2d)
