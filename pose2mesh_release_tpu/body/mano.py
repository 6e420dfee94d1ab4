"""MANO right-hand wrapper: 21-joint regressor with fingertips, mm output.

Reference: /root/reference/lib/_mano.py:10-33 and
manopth/manopth/manolayer.py (output scaled to millimeters, :271-272).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

import jax

from .loader import load_mano_params
from .model import BodyModelParams, lbs_forward
from .synthetic import MANO_VERTS, synthetic_body_params

__all__ = ["MANO"]

# fingertip mesh vertex ids (right hand), lib/_mano.py:23
FINGERTIP_VERTEX = (745, 317, 445, 556, 673)

# regressor row reorder to wrist->thumb->index->middle->ring->pinky order
# (lib/_mano.py:30)
JOINT_REORDER = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20)

JOINTS_NAME = (
    "Wrist", "Thumb_1", "Thumb_2", "Thumb_3", "Thumb_4", "Index_1",
    "Index_2", "Index_3", "Index_4", "Middle_1", "Middle_2", "Middle_3",
    "Middle_4", "Ring_1", "Ring_2", "Ring_3", "Ring_4", "Pinky_1",
    "Pinky_2", "Pinky_3", "Pinky_4",
)
SKELETON = (
    (0, 1), (0, 5), (0, 9), (0, 13), (0, 17), (1, 2), (2, 3), (3, 4),
    (5, 6), (6, 7), (7, 8), (9, 10), (10, 11), (11, 12), (13, 14),
    (14, 15), (15, 16), (17, 18), (18, 19), (19, 20),
)
# horizontal finger-base connections used for the FreiHAND joint graph
# (data/FreiHAND/dataset.py:40)
HORI_CONN = (
    (1, 5), (5, 9), (9, 13), (13, 17),
    (2, 6), (6, 10), (10, 14), (14, 18),
    (3, 7), (7, 11), (11, 15), (15, 19),
    (4, 8), (8, 12), (12, 16), (16, 20),
)


@dataclass
class MANO:
    model_dir: Optional[str] = None
    params: BodyModelParams = None

    vertex_num: int = MANO_VERTS
    joint_num: int = 21
    joints_name: Tuple[str, ...] = JOINTS_NAME
    skeleton: Tuple[Tuple[int, int], ...] = SKELETON
    hori_conn: Tuple[Tuple[int, int], ...] = HORI_CONN
    flip_pairs: Tuple[Tuple[int, int], ...] = ()
    root_joint_idx: int = 0  # Wrist

    def __post_init__(self):
        if self.params is None:
            self.params = load_mano_params(self.model_dir)
        if self.params is None:
            import dataclasses as _dc

            self.params = _dc.replace(
                synthetic_body_params(
                    num_vertices=MANO_VERTS, num_joints=16, seed=7, scale=0.1
                ),
                # the true MANO finger-chain tree (public topology; also
                # hardcoded by the reference layer, manolayer.py:195-229)
                parents=(0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14),
            )
        self.face = np.asarray(self.params.faces)

        base_reg = np.asarray(self.params.J_regressor)  # (16, V)
        onehots = np.zeros((5, self.vertex_num), dtype=np.float32)
        for i, v in enumerate(FINGERTIP_VERTEX):
            onehots[i, v % self.vertex_num] = 1.0
        reg = np.concatenate([base_reg, onehots])
        self.joint_regressor = reg[list(JOINT_REORDER)].astype(np.float32)
        self.joint_regressor_mano = self.joint_regressor

    def layer(self, gender: str = "right") -> BodyModelParams:
        return self.params

    def forward(self, pose, betas, trans=None):
        """LBS forward in MILLIMETERS (manolayer.py:271-272)."""
        verts, joints = lbs_forward(self.params, pose, betas, trans)
        return verts * 1000.0, joints * 1000.0
