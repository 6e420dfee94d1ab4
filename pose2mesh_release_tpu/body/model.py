"""Body model parameter container + vectorized JAX LBS.

Replaces the reference's per-joint Python-loop LBS
(smplpytorch/smplpytorch/pytorch/smpl_layer.py:65-158 and
manopth/manopth/manolayer.py:109-273) with a single batched, `vmap`/`jit`
friendly linear-blend-skinning function: Rodrigues on all joints at once,
a trace-time-unrolled kinematic chain (J static 4x4 compositions that XLA
fuses), skinning as one (V, J) x (J, 4, 4) contraction on the MXU.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["BodyModelParams", "rodrigues", "lbs_forward"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BodyModelParams:
    """SMPL/MANO-style LBS parameters (arrays may be numpy or jax).

    v_template: (V, 3) rest vertices
    shapedirs:  (V, 3, B) shape blendshapes
    posedirs:   (V, 3, 9*(J-1)) pose blendshapes (flattened rotmat deltas)
    J_regressor:(J, V) rest-joint regressor
    lbs_weights:(V, J) skinning weights
    parents:    (J,) kinematic tree, parents[0] == 0
    faces:      (T, 3) triangles
    """

    v_template: jax.Array
    shapedirs: jax.Array
    posedirs: jax.Array
    J_regressor: jax.Array
    lbs_weights: jax.Array
    # static so the kinematic chain unrolls at trace time
    parents: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True), default=())
    faces: jax.Array = dataclasses.field(default=None)
    # non-flat rest-pose mean added to the articulated pose (MANO
    # hands_mean with flat_hand_mean=False, manopth/manolayer.py:128-155)
    pose_mean: jax.Array = dataclasses.field(default=None)

    def __post_init__(self):
        if not isinstance(self.parents, tuple):
            object.__setattr__(self, "parents", tuple(int(p) for p in self.parents))

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]


def rodrigues(axisang: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Matches smplpytorch/pytorch/rodrigues_layer.py:13-52 semantics
    (quaternion formulation, safe at the zero-angle limit).
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    w = jnp.cos(half)[..., 0]
    xyz = jnp.sin(half) * axis
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    R = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * (xy - wz), 2 * (wy + xz),
            2 * (wz + xy), w2 - x2 + y2 - z2, 2 * (yz - wx),
            2 * (xz - wy), 2 * (wx + yz), w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return R.reshape(axisang.shape[:-1] + (3, 3))


def _chain_depths(parents: np.ndarray) -> Tuple[np.ndarray, int]:
    depth = np.zeros(len(parents), dtype=np.int64)
    for j in range(1, len(parents)):
        depth[j] = depth[parents[j]] + 1
    return depth, int(depth.max())


def lbs_forward(
    params: BodyModelParams,
    pose_axisang: jax.Array,
    betas: jax.Array,
    trans: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Linear blend skinning forward pass.

    pose_axisang: (B, J*3) axis-angle, joint 0 = global rotation
    betas: (B, num_betas)
    trans: optional (B, 3) translation

    Returns (verts (B, V, 3), joints (B, J, 3)) in model units (meters for
    SMPL; the MANO wrapper converts to millimeters as the reference does,
    manopth/manopth/manolayer.py:271-272).
    """
    B = pose_axisang.shape[0]
    J = params.num_joints
    if params.pose_mean is not None:
        pose_axisang = jnp.concatenate(
            [pose_axisang[:, :3], pose_axisang[:, 3:] + params.pose_mean[None]],
            axis=1,
        )
    pose = pose_axisang.reshape(B, J, 3)
    rots = rodrigues(pose)  # (B, J, 3, 3)

    # Shape blendshapes: v_shaped = template + shapedirs @ betas
    v_shaped = params.v_template[None] + jnp.einsum(
        "vcb,nb->nvc", params.shapedirs, betas
    )
    j_rest = jnp.einsum("jv,nvc->njc", params.J_regressor, v_shaped)

    # Pose blendshapes from non-root rotations minus identity.
    eye = jnp.eye(3, dtype=rots.dtype)
    pose_feat = (rots[:, 1:] - eye).reshape(B, -1)  # (B, 9*(J-1))
    v_posed = v_shaped + jnp.einsum("vcp,np->nvc", params.posedirs, pose_feat)

    # Kinematic chain: compose joint transforms level by level.  Joints are
    # processed in depth order so every parent is ready; unlike the
    # reference's sequential Python loop this is J static compositions that
    # XLA fuses into a handful of small batched matmuls.
    parents = np.asarray(params.parents)
    rel_t = jnp.concatenate(
        [j_rest[:, :1], j_rest[:, 1:] - j_rest[:, parents[1:]]], axis=1
    )  # (B, J, 3)
    transforms = [None] * J
    top = jnp.concatenate([rots[:, 0], rel_t[:, 0, :, None]], axis=-1)
    pad = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0], rots.dtype), (B, 1, 1))
    transforms[0] = jnp.concatenate([top, pad], axis=1)  # (B, 4, 4)
    for j in range(1, J):
        local = jnp.concatenate([rots[:, j], rel_t[:, j, :, None]], axis=-1)
        local = jnp.concatenate([local, pad], axis=1)
        transforms[j] = transforms[parents[j]] @ local
    G = jnp.stack(transforms, axis=1)  # (B, J, 4, 4)

    joints = G[:, :, :3, 3]

    # Remove the rest-pose joint location from each transform so skinning
    # maps rest-pose vertices (the th_results2 correction in the reference).
    j_rest_h = jnp.concatenate([j_rest, jnp.zeros((B, J, 1), G.dtype)], axis=-1)
    correction = jnp.einsum("njab,njb->nja", G, j_rest_h)  # (B, J, 4)
    G_skin = G.at[:, :, :, 3].add(-correction)

    # Skinning: per-vertex transform = weights @ per-joint transforms.
    T = jnp.einsum("vj,njab->nvab", params.lbs_weights, G_skin)  # (B,V,4,4)
    v_h = jnp.concatenate(
        [v_posed, jnp.ones((B, params.num_vertices, 1), v_posed.dtype)], axis=-1
    )
    verts = jnp.einsum("nvab,nvb->nva", T, v_h)[..., :3]

    if trans is not None:
        verts = verts + trans[:, None]
        joints = joints + trans[:, None]
    return verts, joints
