"""LBS activation parity vs the reference's ACTUAL vendored torch layers.

Feeds identical synthetic BodyModelParams through body.model.lbs_forward and
through smplpytorch's SMPL_Layer / manopth's ManoLayer imported from
/root/reference, with `ready_arguments` stubbed (the real loaders need
chumpy + licensed pkls; the stub hands the layers the same numpy arrays our
side uses).  A sign error in posedirs handling, a kinematic-chain mixup, or
a Rodrigues convention mismatch fails these.  VERDICT.md r1 Weak #4.
"""
import os.path as osp
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pose2mesh_release_tpu.body.model import BodyModelParams, lbs_forward
from pose2mesh_release_tpu.body.synthetic import synthetic_body_params

SMPL_ROOT = "/root/reference/smplpytorch"
MANO_ROOT = "/root/reference/manopth"


class _R:
    """chumpy-array stand-in: exposes the numpy payload as `.r`."""

    def __init__(self, a):
        self.r = np.asarray(a)


def _smpl_stub(params: BodyModelParams):
    import scipy.sparse as sp

    J = len(params.parents)
    kintree = np.zeros((2, J), dtype=np.int64)
    kintree[0] = np.asarray(params.parents)
    kintree[1] = np.arange(J)
    return {
        "betas": _R(np.zeros(params.shapedirs.shape[-1])),
        "shapedirs": _R(params.shapedirs),  # (V, 3, B)
        "posedirs": _R(params.posedirs),    # (V, 3, 9*(J-1))
        "v_template": _R(params.v_template),
        "J_regressor": sp.csr_matrix(np.asarray(params.J_regressor)),
        "weights": _R(params.lbs_weights),
        "f": np.asarray(params.faces, dtype=np.int64),
        "kintree_table": kintree,
    }


@pytest.fixture(scope="module")
def ref_smpl_layer_mod():
    if not osp.isdir(SMPL_ROOT):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, SMPL_ROOT)
    try:
        import smplpytorch.pytorch.smpl_layer as sl

        yield sl
    finally:
        sys.path.remove(SMPL_ROOT)


@pytest.fixture(scope="module")
def ref_mano_layer_mod():
    if not osp.isdir(MANO_ROOT):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, MANO_ROOT)
    try:
        import manopth.manolayer as ml

        yield ml
    finally:
        sys.path.remove(MANO_ROOT)


def test_smpl_lbs_matches_reference_layer(ref_smpl_layer_mod):
    sl = ref_smpl_layer_mod
    params = synthetic_body_params(num_vertices=770, num_joints=24, seed=0)
    stub = _smpl_stub(params)
    orig = sl.ready_arguments
    sl.ready_arguments = lambda path: stub
    try:
        layer = sl.SMPL_Layer(gender="neutral", model_root="unused")
    finally:
        sl.ready_arguments = orig

    rng = np.random.default_rng(0)
    B = 3
    pose = (rng.standard_normal((B, 24 * 3)) * 0.4).astype(np.float32)
    betas = rng.standard_normal((B, 10)).astype(np.float32)
    trans = rng.standard_normal((B, 3)).astype(np.float32)

    with torch.no_grad():
        t_verts, t_joints = layer(
            torch.from_numpy(pose), torch.from_numpy(betas),
            torch.from_numpy(trans))
    verts, joints = lbs_forward(params, pose, betas, trans)

    np.testing.assert_allclose(np.asarray(verts), t_verts.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(joints), t_joints.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mano_lbs_matches_reference_layer(ref_mano_layer_mod):
    """Full-45-dof path with flat_hand_mean=False (the Pose2Mesh config,
    lib/_mano.py:33): hands_mean offsets the articulated pose."""
    ml = ref_mano_layer_mod
    rng = np.random.default_rng(1)
    base = synthetic_body_params(num_vertices=778, num_joints=16, seed=3)
    hands_mean = (rng.standard_normal(45) * 0.1).astype(np.float32)
    import dataclasses

    # manolayer HARDCODES the MANO finger-chain tree (level-parallel lists
    # at manolayer.py:195-229) and ignores kintree_table, so the synthetic
    # params must carry the true MANO parents for both sides to agree
    mano_parents = (0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)
    base = dataclasses.replace(base, parents=mano_parents)
    params = dataclasses.replace(base, pose_mean=hands_mean)

    stub = _smpl_stub(base)
    stub["hands_components"] = np.eye(45, dtype=np.float32)
    stub["hands_mean"] = hands_mean
    orig = ml.ready_arguments
    ml.ready_arguments = lambda path: stub
    try:
        layer = ml.ManoLayer(mano_root="unused", use_pca=False,
                             flat_hand_mean=False, side="right")
    finally:
        ml.ready_arguments = orig

    B = 3
    pose = (rng.standard_normal((B, 48)) * 0.4).astype(np.float32)
    betas = rng.standard_normal((B, 10)).astype(np.float32)
    trans = rng.standard_normal((B, 3)).astype(np.float32)

    with torch.no_grad():
        t_verts, t_jtr = layer(
            torch.from_numpy(pose), torch.from_numpy(betas),
            torch.from_numpy(trans))
    verts, joints = lbs_forward(params, pose, betas, trans)

    # manolayer returns millimeters (manolayer.py:271-272)
    np.testing.assert_allclose(np.asarray(verts) * 1000.0, t_verts.numpy(),
                               rtol=1e-4, atol=1e-2)
    # recover the 16 kinematic joints from the reordered 21-joint output
    perm = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19,
            7, 8, 9, 20]
    inv = np.argsort(perm)
    t_joints16 = t_jtr.numpy()[:, inv][:, :16]
    np.testing.assert_allclose(np.asarray(joints) * 1000.0, t_joints16,
                               rtol=1e-4, atol=1e-2)
