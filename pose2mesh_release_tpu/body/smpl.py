"""SMPL wrapper: gendered layers, extended 29-joint regressor, skeleton.

Reference: /root/reference/lib/smpl.py:11-52.  The base 24-joint SMPL
regressor is extended with 5 one-hot rows picking the nose/eye/ear
vertices; H36M and COCO regressors load from the reference .npy assets when
available.  Model parameters come from `body.loader` (real .pkl files) or
`body.synthetic` (deterministic stand-ins with identical shapes).
"""
from __future__ import annotations

import os.path as osp
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

from .loader import load_smpl_params
from .model import BodyModelParams
from .synthetic import SMPL_VERTS, synthetic_body_params

__all__ = ["SMPL"]

_REF_DATA_DIR = "/root/reference/data"

# mesh vertex indices of nose, L eye, R eye, L ear, R ear (lib/smpl.py:22)
FACE_KPS_VERTEX = (331, 2802, 6262, 3489, 3990)

JOINTS_NAME = (
    "Pelvis", "L_Hip", "R_Hip", "Torso", "L_Knee", "R_Knee", "Spine",
    "L_Ankle", "R_Ankle", "Chest", "L_Toe", "R_Toe", "Neck", "L_Thorax",
    "R_Thorax", "Head", "L_Shoulder", "R_Shoulder", "L_Elbow", "R_Elbow",
    "L_Wrist", "R_Wrist", "L_Hand", "R_Hand", "Nose", "L_Eye", "R_Eye",
    "L_Ear", "R_Ear",
)
FLIP_PAIRS = (
    (1, 2), (4, 5), (7, 8), (10, 11), (13, 14), (16, 17), (18, 19),
    (20, 21), (22, 23), (25, 26), (27, 28),
)
SKELETON = (
    (0, 1), (1, 4), (4, 7), (7, 10), (0, 2), (2, 5), (5, 8), (8, 11),
    (0, 3), (3, 6), (6, 9), (9, 14), (14, 17), (17, 19), (21, 23),
    (9, 13), (13, 16), (16, 18), (18, 20), (20, 22), (9, 12), (12, 24),
    (24, 14), (24, 25), (24, 26), (25, 27), (26, 28),
)


@dataclass
class SMPL:
    """SMPL body model family (neutral/male/female layers share topology)."""

    model_dir: Optional[str] = None
    data_dir: str = _REF_DATA_DIR
    layers: Dict[str, BodyModelParams] = field(default_factory=dict)

    vertex_num: int = SMPL_VERTS
    joint_num: int = 29
    joints_name: Tuple[str, ...] = JOINTS_NAME
    flip_pairs: Tuple[Tuple[int, int], ...] = FLIP_PAIRS
    skeleton: Tuple[Tuple[int, int], ...] = SKELETON
    root_joint_idx: int = 0  # Pelvis

    def __post_init__(self):
        for gender in ("neutral", "male", "female"):
            params = load_smpl_params(self.model_dir, gender)
            if params is None:
                params = synthetic_body_params(
                    num_vertices=SMPL_VERTS, num_joints=24,
                    seed={"neutral": 0, "male": 1, "female": 2}[gender],
                )
            self.layers[gender] = params

        neutral = self.layers["neutral"]
        self.face = np.asarray(neutral.faces)
        base_reg = np.asarray(neutral.J_regressor)  # (24, V)

        onehots = np.zeros((5, self.vertex_num), dtype=np.float32)
        for i, v in enumerate(FACE_KPS_VERTEX):
            onehots[i, v] = 1.0
        self.joint_regressor = np.concatenate([base_reg, onehots]).astype(np.float32)

        self.joint_regressor_h36m = self._load_npy("Human36M/J_regressor_h36m_correct.npy", 17)
        # engine-contract alias (datasets say 'human36', SURVEY.md §2.2)
        self.joint_regressor_human36 = self.joint_regressor_h36m
        self.joint_regressor_coco = self._load_npy("COCO/J_regressor_coco.npy", 17)
        # 'smpl' target set uses the base 24-joint regressor
        self.joint_regressor_smpl = base_reg

    def _load_npy(self, rel: str, num_joints: int) -> np.ndarray:
        path = osp.join(self.data_dir, rel)
        if osp.exists(path):
            return np.load(path).astype(np.float32)
        # deterministic stand-in with correct shape + row-stochastic rows
        rng = np.random.default_rng(hash(rel) % (2**32))
        w = rng.random((num_joints, self.vertex_num)).astype(np.float32) ** 8
        return w / w.sum(axis=1, keepdims=True)

    def layer(self, gender: str = "neutral") -> BodyModelParams:
        return self.layers[gender]
