"""Body model (LBS) tests: geometric invariants + regressor wiring."""
import numpy as np
import pytest

import jax.numpy as jnp

from pose2mesh_release_tpu.body.mano import MANO
from pose2mesh_release_tpu.body.model import lbs_forward, rodrigues
from pose2mesh_release_tpu.body.smpl import SMPL
from pose2mesh_release_tpu.body.synthetic import synthetic_body_params


@pytest.fixture(scope="module")
def params():
    return synthetic_body_params(num_vertices=770, num_joints=8, seed=3)


def test_rodrigues_identity_and_axis():
    R = np.asarray(rodrigues(jnp.zeros((2, 3))))
    np.testing.assert_allclose(R, np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)
    # 90 deg about z
    R = np.asarray(rodrigues(jnp.array([[0.0, 0.0, np.pi / 2]])))[0]
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(R, expect, atol=1e-6)
    # orthonormality for random inputs
    rng = np.random.default_rng(0)
    aa = jnp.asarray(rng.standard_normal((5, 3)))
    R = np.asarray(rodrigues(aa))
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (5, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(5), atol=1e-5)


def test_lbs_rest_pose_is_shaped_template(params):
    B = 2
    pose = jnp.zeros((B, params.num_joints * 3))
    betas = jnp.zeros((B, 10))
    verts, joints = lbs_forward(params, pose, betas)
    np.testing.assert_allclose(
        np.asarray(verts[0]), np.asarray(params.v_template), atol=1e-5
    )
    expect_j = np.asarray(params.J_regressor) @ np.asarray(params.v_template)
    np.testing.assert_allclose(np.asarray(joints[0]), expect_j, atol=1e-5)


def test_lbs_shape_blend(params):
    betas = jnp.zeros((1, 10)).at[0, 0].set(2.0)
    verts, _ = lbs_forward(params, jnp.zeros((1, params.num_joints * 3)), betas)
    expect = np.asarray(params.v_template) + 2.0 * np.asarray(params.shapedirs)[:, :, 0]
    np.testing.assert_allclose(np.asarray(verts[0]), expect, atol=1e-5)


def test_lbs_global_rotation_is_rigid(params):
    """Root rotation must rigidly rotate the whole mesh about the root joint."""
    B = 1
    aa = np.zeros((B, params.num_joints * 3), np.float32)
    aa[0, :3] = [0.0, np.pi / 3, 0.0]
    v_rot, j_rot = lbs_forward(params, jnp.asarray(aa), jnp.zeros((B, 10)))
    v0, j0 = lbs_forward(params, jnp.zeros((B, params.num_joints * 3)), jnp.zeros((B, 10)))
    R = np.asarray(rodrigues(jnp.asarray(aa[:, :3])))[0]
    root = np.asarray(j0[0, 0])
    expect = (np.asarray(v0[0]) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(v_rot[0]), expect, atol=1e-4)


def test_lbs_translation(params):
    t = jnp.asarray([[0.1, -0.2, 0.3]])
    v0, j0 = lbs_forward(params, jnp.zeros((1, params.num_joints * 3)), jnp.zeros((1, 10)))
    v1, j1 = lbs_forward(params, jnp.zeros((1, params.num_joints * 3)), jnp.zeros((1, 10)), t)
    np.testing.assert_allclose(np.asarray(v1 - v0)[0], np.tile([0.1, -0.2, 0.3], (770, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(j1 - j0)[0].mean(axis=0), [0.1, -0.2, 0.3], atol=1e-6)


def test_smpl_wrapper_shapes():
    s = SMPL()
    assert s.joint_regressor.shape == (29, 6890)
    assert s.joint_regressor_h36m.shape == (17, 6890)
    assert s.joint_regressor_coco.shape == (17, 6890)
    # extended rows are one-hot at the documented face vertices
    for i, v in enumerate((331, 2802, 6262, 3489, 3990)):
        row = s.joint_regressor[24 + i]
        assert row[v] == 1.0 and row.sum() == 1.0
    assert s.face.max() + 1 == 6890
    assert len(s.skeleton) == 27 and len(s.flip_pairs) == 11


def test_mano_wrapper_shapes():
    m = MANO()
    assert m.joint_regressor.shape == (21, 778)
    assert m.joint_regressor_mano.shape == (21, 778)
    # wrist row must come first after the reorder
    assert np.argmax(m.joint_regressor.sum(axis=1) > 0) == 0
    verts, joints = m.forward(
        jnp.zeros((1, m.params.num_joints * 3)), jnp.zeros((1, 10))
    )
    assert verts.shape == (1, 778, 3) and joints.shape == (1, 16, 3)
    # millimeter scale: synthetic hand is ~0.1m -> ~100mm
    assert 10 < np.abs(np.asarray(verts)).max() < 1000
