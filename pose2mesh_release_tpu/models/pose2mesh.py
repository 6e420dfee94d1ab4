"""The Pose2Mesh cascade: PoseNet -> (stop-gradient) -> MeshNet.

Reference: /root/reference/lib/models/pose2mesh_net.py:8-28.  The lifted 3D
pose is detached and rescaled from millimeters to meters before being
concatenated with the 2D pose as MeshNet input.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graphs.artifact import PyramidArtifact
from .meshnet import MANO_BLOCKS, SMPL_BLOCKS, MeshNet
from .posenet import PoseNet

__all__ = ["Pose2Mesh"]


class Pose2Mesh(nn.Module):
    num_joint: int
    mano: bool = False
    posenet_hidden: int = 4096
    blocks: Tuple[Tuple[int, ...], ...] | None = None  # override for tests
    dtype: Any = jnp.float32  # compute dtype; bf16 for the TPU fast path
    use_pallas: bool = True
    # deploy mode: pair with models.fold.fold_bn_variables(variables)
    inference_fused: bool = False
    # ('data','graph') Mesh: graph axis > 1 routes band-level hops through
    # the explicit ppermute halo exchange (parallel.halo)
    spmd_mesh: Any = None

    def setup(self):
        self.pose_lifter = PoseNet(self.num_joint, hidden=self.posenet_hidden,
                                   dtype=self.dtype)
        blocks = self.blocks or (MANO_BLOCKS if self.mano else SMPL_BLOCKS)
        self.pose2mesh = MeshNet(blocks=blocks, dtype=self.dtype,
                                 use_pallas=self.use_pallas,
                                 inference_fused=self.inference_fused,
                                 spmd_mesh=self.spmd_mesh)

    def __call__(
        self,
        art: PyramidArtifact,
        pose2d: jnp.ndarray,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pose2d: (B, J, 2) normalized -> (mesh (B, V_pad, 3) meters in
        device vertex order, pose3d (B, J, 3) mm)."""
        B = pose2d.shape[0]
        pose3d = self.pose_lifter(pose2d.reshape(B, -1), train)
        pose3d = pose3d.reshape(B, self.num_joint, 3)
        combine = jnp.concatenate(
            [pose2d, jax.lax.stop_gradient(pose3d) / 1000.0], axis=2
        )
        mesh = self.pose2mesh(art, combine, train)
        return mesh, pose3d
