"""Vectorized batch input pipeline.

The per-sample __getitem__ (data/base.py) mirrors the reference's worker
pipeline 1:1; this module is the production path: the SAME math over a
whole batch at once — batched bbox/affine solves, one fused standardize,
one fused 3-D rot/flip — optionally dropping into the C++/OpenMP kernels
(pose2mesh_release_tpu.native) for the inner loops.  BatchLoader uses
`MeshDataset.get_batch` (which calls this) when the dataset supports it.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..utils.augment import flip_2d_joint
from .. import native

__all__ = ["batched_affine", "batched_bbox", "batch_pipeline"]


def _rotate_2d_batch(pts: np.ndarray, rot_rad: np.ndarray) -> np.ndarray:
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.stack([pts[:, 0] * cs - pts[:, 1] * sn,
                     pts[:, 0] * sn + pts[:, 1] * cs], axis=1)


def batched_bbox(joint_img: np.ndarray, aspect: float) -> Tuple[np.ndarray, np.ndarray]:
    """Tight bbox -> aspect-preserving (center, scale) per sample
    (coord_utils.py:21-66 batched).  joint_img (B, J, 2)."""
    mn = joint_img.min(axis=1)
    mx = joint_img.max(axis=1)
    # process_bbox first shrinks to (w-1, h-1) (x2 = x+w-1), THEN
    # aspect-adjusts; center lands at (mn+mx-1)/2
    w = mx[:, 0] - mn[:, 0] - 1.0
    h = mx[:, 1] - mn[:, 1] - 1.0
    c = (mn + mx) * 0.5 - 0.5
    w2 = np.where(w > aspect * h, w, h * aspect)
    h2 = np.where(w > aspect * h, w / aspect, h)
    return c, np.stack([w2, h2], axis=1)


def batched_affine(center: np.ndarray, scale: np.ndarray, rot_deg: np.ndarray,
                   out_size: Tuple[int, int]) -> np.ndarray:
    """(B,) crop transforms -> (B, 2, 3) matrices
    (aug_utils.py:145-180 / utils.augment.get_affine_transform batched)."""
    B = len(center)
    dst_w, dst_h = out_size
    rot_rad = np.pi * rot_deg / 180.0
    src_dir = _rotate_2d_batch(
        np.stack([np.zeros(B), scale[:, 0] * -0.5], axis=1), rot_rad
    )
    dst_dir = np.array([0.0, dst_w * -0.5], np.float64)

    src = np.zeros((B, 3, 2), np.float64)
    dst = np.zeros((B, 3, 2), np.float64)
    src[:, 0] = center
    src[:, 1] = center + src_dir
    dst[:, 0] = [dst_w * 0.5, dst_h * 0.5]
    dst[:, 1] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir

    def third(a, b):
        d = a - b
        return b + np.stack([-d[:, 1], d[:, 0]], axis=1)

    src[:, 2] = third(src[:, 0], src[:, 1])
    dst[:, 2] = third(dst[:, 0], dst[:, 1])

    A = np.concatenate([src, np.ones((B, 3, 1))], axis=2)  # (B, 3, 3)
    M_T = np.linalg.solve(A, dst)                          # (B, 3, 2)
    return M_T.transpose(0, 2, 1)                          # (B, 2, 3)


def _affine_apply(joints: np.ndarray, mats: np.ndarray) -> np.ndarray:
    if native.available():
        return native.affine_batch(joints, mats)
    ones = np.ones(joints.shape[:2] + (1,), joints.dtype)
    homo = np.concatenate([joints, ones], axis=2)
    return np.einsum("bij,bkj->bki", mats, homo).astype(np.float32)


def _standardize(joints: np.ndarray, w: int, h: int) -> np.ndarray:
    if native.available():
        return native.standardize_batch(joints, w, h)
    joints = joints / np.array([[[w, h]]], np.float32)
    mean = joints.mean(axis=1, keepdims=True)
    std = np.maximum(joints.std(axis=1, keepdims=True), 1e-6)
    return ((joints - mean) / std).astype(np.float32)


def _rot_flip_3d(joints: np.ndarray, rot_deg: np.ndarray, flip: np.ndarray,
                 pairs) -> np.ndarray:
    pairs_arr = np.asarray(pairs, np.int32).reshape(-1, 2) if len(pairs) \
        else np.zeros((0, 2), np.int32)
    if native.available():
        return native.rot_flip_3d_batch(joints, rot_deg, flip, pairs_arr)
    out = joints.copy()
    rot_rad = -np.deg2rad(rot_deg)
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    x = out[..., 0].copy()
    y = out[..., 1].copy()
    out[..., 0] = cs[:, None] * x - sn[:, None] * y
    out[..., 1] = sn[:, None] * x + cs[:, None] * y
    fm = flip.astype(bool)
    if fm.any() and len(pairs_arr):
        sub = out[fm]
        sub[:, pairs_arr[:, 0]], sub[:, pairs_arr[:, 1]] = \
            sub[:, pairs_arr[:, 1]].copy(), sub[:, pairs_arr[:, 0]].copy()
        out[fm] = sub
    out[fm, :, 0] = -out[fm, :, 0]
    return out


def batch_pipeline(
    joint_img: np.ndarray,        # (B, J, 2) pixels
    joint_cam: np.ndarray,        # (B, J, 3) mm
    input_shape: Tuple[int, int],  # (H, W)
    flip_pairs,
    *,
    is_train: bool,
    rng: Optional[np.random.Generator] = None,
    mesh_cam: Optional[np.ndarray] = None,     # (B, V, 3)
    reg3d: Optional[np.ndarray] = None,        # (B, Jt, 3)
    target_flip_pairs=(),
    flip_enabled: bool = True,
    rotate_factor: float = 30.0,
) -> dict:
    """Full augmentation pipeline for one batch, vectorized.

    Returns dict with 'pose2d' (standardized), 'lift_pose3d', and
    augmented 'mesh'/'reg_pose3d' when given.  Semantics identical to
    MeshDataset.__getitem__ (the per-sample reference path)."""
    B, J = joint_img.shape[:2]
    H, W = input_shape
    rng = rng or np.random.default_rng()

    if is_train:
        flip = (rng.uniform(size=B) <= 0.5).astype(np.uint8) \
            if flip_enabled else np.zeros(B, np.uint8)
        rot = np.clip(rng.standard_normal(B) * rotate_factor,
                      -2 * rotate_factor, 2 * rotate_factor)
        rot = np.where(rng.uniform(size=B) <= 0.5, 0.0, rot)
    else:
        flip = np.zeros(B, np.uint8)
        rot = np.zeros(B, np.float64)

    center, scale = batched_bbox(joint_img, W / H)
    mats = batched_affine(center, scale, rot, (W, H))
    p2d = _affine_apply(joint_img.astype(np.float32), mats)
    # 2-D flip (aug_utils.py:33-40) where drawn
    fm = flip.astype(bool)
    if fm.any():
        flipped = p2d[fm].copy()
        flipped[..., 0] = W - flipped[..., 0] - 1
        pa = np.asarray(flip_pairs, np.int64).reshape(-1, 2)
        if len(pa):
            flipped[:, pa[:, 0]], flipped[:, pa[:, 1]] = \
                flipped[:, pa[:, 1]].copy(), flipped[:, pa[:, 0]].copy()
        p2d[fm] = flipped
    pose2d = _standardize(p2d, W, H)

    out = {
        "pose2d": pose2d,
        "lift_pose3d": _rot_flip_3d(joint_cam.astype(np.float32), rot, flip,
                                    flip_pairs),
    }
    if mesh_cam is not None:
        out["mesh"] = _rot_flip_3d(mesh_cam.astype(np.float32), rot, flip, ())
    if reg3d is not None:
        out["reg_pose3d"] = _rot_flip_3d(reg3d.astype(np.float32), rot, flip,
                                         target_flip_pairs)
    return out
