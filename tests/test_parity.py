"""Parity: JAX cascade vs the reference-architecture torch model on
identical weights (the converter path a real final.pth.tar would take)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pose2mesh_release_tpu.body.synthetic import uv_sphere
from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
from pose2mesh_release_tpu.graphs.build import build_pyramid
from pose2mesh_release_tpu.models.meshnet import extract_mesh
from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh
from pose2mesh_release_tpu.parity.convert import (
    convert_cascade_state_dict,
    convert_posenet_state_dict,
)
from pose2mesh_release_tpu.parity.torch_ref import RefCascade, RefPoseNet

J = 7
SKEL = ((0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6))
BLOCKS = ((5, 8, 8), (8, 16), (16, 16), (16, 16), (16, 8, 3))


@pytest.fixture(scope="module")
def pyramid():
    _, faces = uv_sphere(770)
    pyr = build_pyramid(faces, joint_num=J, skeleton=SKEL, levels=4)
    return pyr, faces


def test_posenet_parity():
    torch.manual_seed(0)
    ref = RefPoseNet(J, hidden=32).eval()
    sd = {k: np.asarray(v.detach()) for k, v in ref.state_dict().items()}
    variables = convert_posenet_state_dict(sd)

    from pose2mesh_release_tpu.models.posenet import PoseNet
    model = PoseNet(J, hidden=32)
    x = np.random.default_rng(0).standard_normal((4, J * 2)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), False))
    theirs = ref(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_cascade_parity(pyramid):
    pyr, faces = pyramid
    torch.manual_seed(1)
    laps = list(pyr.mesh_laplacians) + [pyr.joint_laplacian]
    ref = RefCascade(J, BLOCKS, laps, hidden=32).eval()
    sd = {k: np.asarray(v.detach()) for k, v in ref.state_dict().items()}
    variables = convert_cascade_state_dict(sd)

    # tree ordering (no RCM) so both sides share the vertex layout; XLA path
    art = pack_pyramid(pyr, faces, ordering="tree", dense_threshold=10_000)
    model = Pose2Mesh(num_joint=J, posenet_hidden=32, blocks=BLOCKS,
                      use_pallas=False)

    x = np.random.default_rng(1).standard_normal((2, J, 2)).astype(np.float32)
    mesh_dev, pose3d = model.apply(variables, art, jnp.asarray(x), False)
    ours_mesh = np.asarray(extract_mesh(art, mesh_dev))
    ours_pose = np.asarray(pose3d)

    t_mesh, t_pose = ref(torch.from_numpy(x))
    t_mesh = t_mesh.detach().numpy()[:, pyr.vertex_slot, :]
    t_pose = t_pose.detach().numpy()

    np.testing.assert_allclose(ours_pose, t_pose, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ours_mesh, t_mesh, rtol=1e-3, atol=1e-4)


def test_cascade_parity_banded_rcm(pyramid):
    """The production packing (RCM + banded + Pallas interpret) matches the
    torch reference too — ordering invariance of the whole cascade."""
    pyr, faces = pyramid
    torch.manual_seed(2)
    laps = list(pyr.mesh_laplacians) + [pyr.joint_laplacian]
    ref = RefCascade(J, BLOCKS, laps, hidden=32).eval()
    sd = {k: np.asarray(v.detach()) for k, v in ref.state_dict().items()}
    variables = convert_cascade_state_dict(sd)

    art = pack_pyramid(pyr, faces, ordering="rcm", dense_threshold=300)
    model = Pose2Mesh(num_joint=J, posenet_hidden=32, blocks=BLOCKS,
                      use_pallas=True)

    x = np.random.default_rng(2).standard_normal((2, J, 2)).astype(np.float32)
    mesh_dev, _ = model.apply(variables, art, jnp.asarray(x), False)
    ours_mesh = np.asarray(extract_mesh(art, mesh_dev))

    t_mesh, _ = ref(torch.from_numpy(x))
    t_mesh = t_mesh.detach().numpy()[:, pyr.vertex_slot, :]
    np.testing.assert_allclose(ours_mesh, t_mesh, rtol=1e-3, atol=5e-4)
