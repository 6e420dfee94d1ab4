"""Batched ground-truth mesh synthesis.

The reference runs a full SMPL LBS *per sample inside dataloader workers*
(data/Human36M/dataset.py:344 -> smpl_layer.py:65) — at TPU throughput the
host becomes the bottleneck (SURVEY.md §7.3).  Here GT synthesis is a
single vmapped/jitted JAX function evaluated in large batches once at
dataset-build time (CPU backend by default); the hot input pipeline then
only does cheap 2-D augmentation on cached arrays.

Math mirrors data/Human36M/dataset.py:255-301 (`get_smpl_coord`): the SMPL
world->camera change is folded into the root joint's axis-angle, the
translation is rotation-compensated about the root joint, output is
millimeters, camera frame.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..body.model import BodyModelParams, lbs_forward, rodrigues

__all__ = [
    "mat2axisang", "posed_mesh_cam", "posed_mesh_world", "posed_mesh_rotated",
    "regress_joints", "project_perspective", "add_pelvis_and_neck",
    "batched_gt",
]


def mat2axisang(R: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3) (log map).

    Safe at angle ~ 0 (returns the skew part) and numerically guarded at
    angle ~ pi.  Replaces transforms3d.axangles.mat2axangle
    (Human36M/dataset.py:271).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    angle = jnp.arccos(cos)
    # skew-symmetric part -> rotation axis * 2 sin(angle)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin = jnp.sin(angle)
    small = angle < 1e-5
    near_pi = angle > jnp.pi - 1e-4
    # generic branch
    axis_gen = v / jnp.where(small | near_pi, 1.0, 2.0 * sin)[..., None]
    # angle ~ pi: axis from the diagonal of (R + I) / 2 = aa^T
    diag = jnp.stack(
        [R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1
    )
    axis_pi = jnp.sqrt(jnp.clip((diag + 1.0) * 0.5, 0.0, None))
    # fix signs from off-diagonals (largest component positive)
    sign = jnp.sign(
        jnp.where(
            small[..., None],
            jnp.ones_like(v),
            jnp.where(near_pi[..., None], jnp.where(v == 0, 1.0, jnp.sign(v)), 1.0),
        )
    )
    axis_pi = axis_pi * sign
    axis_pi = axis_pi / jnp.linalg.norm(axis_pi + 1e-12, axis=-1, keepdims=True)
    axis = jnp.where(near_pi[..., None], axis_pi, axis_gen)
    out = axis * angle[..., None]
    return jnp.where(small[..., None], v * 0.5, out)


@jax.jit
def posed_mesh_cam(
    params: BodyModelParams,
    pose: jax.Array,   # (B, J*3) axis-angle, world frame
    shape: jax.Array,  # (B, n_betas)
    trans: jax.Array,  # (B, 3) model->world translation, meters
    R: jax.Array,      # (B, 3, 3) world->camera rotation
    t: jax.Array,      # (B, 3) world->camera translation, millimeters
) -> Tuple[jax.Array, jax.Array]:
    """World-frame SMPL params -> camera-frame (mesh_mm, joints_mm).

    Exact semantics of Human36M/dataset.py:255-301: betas with any
    |beta|>3 reset to the mean shape; camera rotation folded into the root
    axis-angle; translation compensated for the root-rotation pivot.
    """
    B = pose.shape[0]
    shape = jnp.where(
        (jnp.abs(shape) > 3).any(axis=1, keepdims=True), 0.0, shape
    )
    root = pose[:, :3]
    root_mat = rodrigues(root)                       # (B, 3, 3)
    root_cam = mat2axisang(R @ root_mat)             # (B, 3)
    pose_cam = jnp.concatenate([root_cam, pose[:, 3:]], axis=1)

    verts, joints = lbs_forward(params, pose_cam, shape)  # meters, (B,V,3)

    trans_cam = (
        jnp.einsum("nab,nb->na", R, trans) + t / 1000.0
    )  # (B, 3) meters
    root_joint = joints[:, :1]                       # (B, 1, 3)
    trans_cam = (
        trans_cam[:, None]
        - root_joint
        + jnp.einsum("nab,njb->nja", R, root_joint)
    )
    mesh_mm = (verts + trans_cam) * 1000.0
    joints_mm = (joints + trans_cam) * 1000.0
    return mesh_mm, joints_mm


@jax.jit
def posed_mesh_rotated(
    params: BodyModelParams,
    pose: jax.Array,   # (B, J*3) axis-angle
    shape: jax.Array,  # (B, n_betas)
    R: jax.Array,      # (B, 3, 3) camera rotation folded into the root
    t_mm: jax.Array,   # (B, 3) camera offset, millimeters
) -> Tuple[jax.Array, jax.Array]:
    """Root-rotated LBS + direct translation, millimeters — the AMASS
    camera model (data/AMASS/dataset.py:182-213): unlike the H36M path
    there is NO root-pivot compensation; t is added to the rotated mesh."""
    root_cam = mat2axisang(R @ rodrigues(pose[:, :3]))
    pose_cam = jnp.concatenate([root_cam, pose[:, 3:]], axis=1)
    verts, joints = lbs_forward(params, pose_cam, shape)
    return verts * 1000.0 + t_mm[:, None], joints * 1000.0 + t_mm[:, None]


@jax.jit
def posed_mesh_world(
    params: BodyModelParams,
    pose: jax.Array, shape: jax.Array, trans: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Plain posed mesh with translation, millimeters (PW3D/SURREAL GT:
    data/PW3D/dataset.py:84-102, data/SURREAL/dataset.py:62-80)."""
    verts, joints = lbs_forward(params, pose, shape, trans)
    return verts * 1000.0, joints * 1000.0


def regress_joints(regressor: jax.Array, mesh: jax.Array) -> jax.Array:
    """(J, V) x (..., V, 3) -> (..., J, 3) dense MXU matmul."""
    return jnp.einsum("jv,...vc->...jc", regressor, mesh)


def add_pelvis_and_neck(joints: jax.Array, lhip: int, rhip: int,
                        lsho: int, rsho: int) -> jax.Array:
    """Append pelvis=(L_Hip+R_Hip)/2 and neck=(L_Sho+R_Sho)/2 rows
    (Human36M/dataset.py:323-335)."""
    pelvis = (joints[..., lhip, :] + joints[..., rhip, :]) * 0.5
    neck = (joints[..., lsho, :] + joints[..., rsho, :]) * 0.5
    return jnp.concatenate(
        [joints, pelvis[..., None, :], neck[..., None, :]], axis=-2
    )


def project_perspective(cam_mm: jax.Array, focal: jax.Array,
                        princpt: jax.Array) -> jax.Array:
    """Perspective projection (lib/coord_utils.py:104-109), batched.

    cam_mm (..., J, 3); focal/princpt (..., 2).  Returns (..., J, 2) pixels.
    """
    z = cam_mm[..., 2:]
    xy = cam_mm[..., :2] / jnp.where(z == 0, 1e-8, z)
    return xy * focal[..., None, :] + princpt[..., None, :]


def batched_gt(
    fn,
    arrays: Tuple[np.ndarray, ...],
    batch: int = 512,
    device: Optional[jax.Device] = None,
    out_dtype=np.float32,
):
    """Run a jitted GT-synthesis fn over a big record set in fixed-size
    chunks (padding the tail so one compilation serves all chunks).

    fn(*chunk_arrays) -> array or tuple of arrays, leading dim = batch.
    """
    n = arrays[0].shape[0]
    if device is None:
        device = jax.local_devices(backend="cpu")[0]
    outs = None
    for start in range(0, n, batch):
        end = min(start + batch, n)
        chunk = [np.asarray(a[start:end]) for a in arrays]
        if end - start < batch:  # pad tail to the compiled shape
            pad = batch - (end - start)
            chunk = [np.concatenate([c, np.repeat(c[-1:], pad, 0)]) for c in chunk]
        res = fn(*[jax.device_put(c, device) for c in chunk])
        if not isinstance(res, tuple):
            res = (res,)
        res = [np.asarray(r[: end - start]).astype(out_dtype) for r in res]
        if outs is None:
            outs = [[] for _ in res]
        for o, r in zip(outs, res):
            o.append(r)
    if outs is None:
        return None
    outs = [np.concatenate(o) for o in outs]
    return outs[0] if len(outs) == 1 else tuple(outs)
