"""Real-template readiness tests (VERDICT r2 task 7).

Everything else in CI runs on synthetic `uv_sphere` stand-ins because the
licensed SMPL/MANO .pkl files are absent from this environment.  These
tests assert the reference-exact pyramid properties on the REAL templates
the moment the assets appear — point P2M_SMPL_MODEL_DIR /
P2M_MANO_MODEL_DIR at directories holding the reference's pkl names
(basicModel_*_lbs_10_207_0_v1.0.0.pkl, MANO_RIGHT.pkl; same files
`smplpytorch/native/models/` and `manopth/mano/models/` hold in the
reference checkout).  Skipped cleanly when absent.

Expected values come from the reference pipeline
(`lib/graph_utils.py:75-95` + `lib/coarsening.py:43-64`): SMPL 6890
vertices at levels=9 coarsen to binary-tree-padded
{12288, 6144, 3072, 1536, 768, 384, 192, 96} mesh levels (48 deleted by
`lib/models/meshnet.py:35`, 24 swapped for the joint graph), with the fc
"upsample" sized 17*64 -> 96*64 (`lib/models/meshnet.py:36-37`); MANO 778
vertices at levels=6 give {1088, 544, 272, 136, 68}.
"""
import os

import numpy as np
import pytest

SMPL_DIR = os.environ.get("P2M_SMPL_MODEL_DIR", "")
MANO_DIR = os.environ.get("P2M_MANO_MODEL_DIR", "")


def _has_smpl() -> bool:
    return SMPL_DIR and os.path.exists(
        os.path.join(SMPL_DIR, "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"))


def _has_mano() -> bool:
    return MANO_DIR and os.path.exists(os.path.join(MANO_DIR, "MANO_RIGHT.pkl"))


@pytest.mark.skipif(not _has_smpl(), reason="real SMPL pkl not present "
                    "(set P2M_SMPL_MODEL_DIR)")
def test_real_smpl_pyramid_sizes():
    from pose2mesh_release_tpu.body.smpl import SMPL, SKELETON, FLIP_PAIRS
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.models.meshnet import SMPL_BLOCKS

    smpl = SMPL(model_dir=SMPL_DIR)
    assert smpl.face.max() + 1 == 6890
    pyr = build_pyramid(smpl.face, joint_num=17,
                        skeleton=((0, 7), (7, 8), (8, 9), (9, 10), (8, 11),
                                  (11, 12), (12, 13), (8, 14), (14, 15),
                                  (15, 16), (0, 1), (1, 2), (2, 3), (0, 4),
                                  (4, 5), (5, 6)),
                        levels=9)
    # binary-tree padded sizes (reference-exact coarsening)
    padded = tuple(L.shape[0] for L in pyr.mesh_laplacians)
    assert padded == (12288, 6144, 3072, 1536, 768, 384, 192, 96), padded
    # fc layer shape on the converted checkpoint path:
    # joints*64 -> coarsest_mesh*64 (lib/models/meshnet.py:36-37)
    art_tree = pack_pyramid(pyr, smpl.face, ordering="tree",
                            dense_threshold=10_000)
    assert art_tree.mesh_ops[-1].num_vertices == 96
    assert SMPL_BLOCKS[1][0] == 64  # f at the fc boundary
    # rcm deploy artifact: fakes dropped at non-coarsest levels
    art = pack_pyramid(pyr, smpl.face)
    assert art.mesh_ops[0].num_vertices == 6890
    assert art.mesh_ops[-1].num_vertices == 96  # checkpoint-visible level
    assert art.num_vertices == 6890


@pytest.mark.skipif(not _has_mano(), reason="real MANO pkl not present "
                    "(set P2M_MANO_MODEL_DIR)")
def test_real_mano_pyramid_sizes():
    from pose2mesh_release_tpu.body.mano import MANO
    from pose2mesh_release_tpu.graphs.build import build_pyramid

    mano = MANO(model_dir=MANO_DIR)
    assert mano.face.max() + 1 == 778
    pyr = build_pyramid(mano.face, joint_num=21, skeleton=mano.skeleton,
                        levels=6)
    padded = tuple(L.shape[0] for L in pyr.mesh_laplacians)
    assert padded == (1088, 544, 272, 136, 68), padded


@pytest.mark.skipif(not _has_smpl(), reason="real SMPL pkl not present")
def test_real_smpl_lbs_finite():
    """Smoke: the real-template LBS path produces finite meshes."""
    import jax.numpy as jnp

    from pose2mesh_release_tpu.body.model import lbs_forward
    from pose2mesh_release_tpu.body.smpl import SMPL

    smpl = SMPL(model_dir=SMPL_DIR)
    params = smpl.layers["neutral"]
    pose = jnp.zeros((2, 72))
    betas = jnp.zeros((2, 10))
    verts, joints = lbs_forward(params, pose, betas)
    assert verts.shape == (2, 6890, 3)
    assert np.isfinite(np.asarray(verts)).all()
