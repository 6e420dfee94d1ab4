"""Model tests: ChebConv semantics, MeshNet pyramid walk, cascade wiring."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose2mesh_release_tpu.body.synthetic import uv_sphere
from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
from pose2mesh_release_tpu.graphs.build import build_pyramid
from pose2mesh_release_tpu.models.meshnet import (
    MeshNet,
    channel_interp_matrix,
    extract_mesh,
)
from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh
from pose2mesh_release_tpu.models.posenet import PoseNet
from pose2mesh_release_tpu.ops.cheby import chebyshev_stack

J = 7
SKEL = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6)]
# small test schedule: 5 blocks for the 3 mesh levels of a levels=4 pyramid
TEST_BLOCKS = ((5, 8, 8), (8, 16), (16, 16), (16, 16), (16, 8, 3))


@pytest.fixture(scope="module")
def art():
    _, faces = uv_sphere(770)
    pyr = build_pyramid(faces, joint_num=J, skeleton=SKEL, levels=4)
    return pack_pyramid(pyr, faces, dense_threshold=300)


def test_channel_interp_matrix_against_torch():
    import torch
    for fin, fout in [(64, 256), (256, 128), (8, 16), (16, 3)]:
        M = channel_interp_matrix(fin, fout)
        x = np.random.default_rng(0).standard_normal((2, 5, fin)).astype(np.float32)
        ours = x @ M.T
        theirs = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=fout, mode="linear"
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_chebyshev_stack_layout(art):
    """Feature layout must be fin-major (index = fin*K + k), matching the
    reference's view chain (cheby_graph_conv.py:31-35).  Vertex-major."""
    op = art.joint_op
    x = jnp.asarray(np.random.default_rng(1).standard_normal((J, 2, 3)).astype(np.float32))
    K = 3
    s = chebyshev_stack(op, x, K)
    assert s.shape == (J, 2, 9)
    L = np.asarray(op.dense)
    x0 = np.asarray(x)
    x1 = np.einsum("vw,wbc->vbc", L, x0)
    x2 = 2 * np.einsum("vw,wbc->vbc", L, x1) - x0
    for fin in range(3):
        np.testing.assert_allclose(np.asarray(s[..., fin * K + 0]), x0[..., fin], atol=1e-5)
        np.testing.assert_allclose(np.asarray(s[..., fin * K + 1]), x1[..., fin], atol=1e-4)
        np.testing.assert_allclose(np.asarray(s[..., fin * K + 2]), x2[..., fin], atol=1e-4)


def test_meshnet_forward_shapes(art):
    model = MeshNet(blocks=TEST_BLOCKS)
    x = jnp.zeros((2, J, 5))
    variables = model.init(jax.random.PRNGKey(0), art, x, False)
    y = model.apply(variables, art, x, False)
    V_pad = art.mesh_ops[0].num_vertices
    assert y.shape == (2, V_pad, 3)
    mesh = extract_mesh(art, y)
    assert mesh.shape == (2, 770, 3)


@pytest.mark.slow
def test_meshnet_batchnorm_state(art):
    model = MeshNet(blocks=TEST_BLOCKS)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, J, 5)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), art, x, True)
    assert "batch_stats" in variables
    y, mutated = model.apply(variables, art, x, True, mutable=["batch_stats"])
    # running stats must move after a train-mode pass
    leaves0 = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves1 = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))


@pytest.mark.slow
def test_cascade_stop_gradient(art):
    """MeshNet gradients must not flow into PoseNet through the cascade
    (pose2mesh_net.py:19 detach semantics)."""
    model = Pose2Mesh(num_joint=J, posenet_hidden=64, blocks=TEST_BLOCKS)
    pose2d = jnp.asarray(np.random.default_rng(2).standard_normal((2, J, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), art, pose2d, False)

    def mesh_only_loss(params):
        mesh, _ = model.apply({**variables, "params": params}, art, pose2d, False)
        return (mesh ** 2).sum()

    g = jax.grad(mesh_only_loss)(variables["params"])
    posenet_grads = jax.tree_util.tree_leaves(g["pose_lifter"])
    meshnet_grads = jax.tree_util.tree_leaves(g["pose2mesh"])
    assert all(np.allclose(np.asarray(x), 0) for x in posenet_grads)
    assert any(not np.allclose(np.asarray(x), 0) for x in meshnet_grads)


def test_posenet_output_shape():
    model = PoseNet(num_joint=J, hidden=32)
    x = jnp.zeros((3, J, 2))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    y = model.apply(variables, x, False)
    assert y.shape == (3, J * 3)


def test_posenet_dropout_only_in_train():
    model = PoseNet(num_joint=J, hidden=32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, J, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    y1 = model.apply(variables, x, False)
    y2 = model.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
    t1 = model.apply(variables, x, True, rngs={"dropout": jax.random.PRNGKey(1)},
                     mutable=["batch_stats"])[0]
    t2 = model.apply(variables, x, True, rngs={"dropout": jax.random.PRNGKey(2)},
                     mutable=["batch_stats"])[0]
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


@pytest.mark.slow
def test_bn_folding_matches_eval(art):
    """fold_bn_variables + inference_fused model == standard eval forward."""
    import jax
    from pose2mesh_release_tpu.models.fold import fold_bn_variables
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh

    model = Pose2Mesh(num_joint=J, posenet_hidden=32, blocks=TEST_BLOCKS)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, J, 2)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), art, x, False)
    # perturb batch stats so folding is non-trivial
    variables = jax.tree.map(
        lambda a: a + 0.1 * np.random.default_rng(4).standard_normal(a.shape)
        .astype(a.dtype) if a.ndim >= 1 else a, variables)

    ref_mesh, ref_pose = model.apply(variables, art, x, False)

    inf_model = Pose2Mesh(num_joint=J, posenet_hidden=32,
                          blocks=TEST_BLOCKS, inference_fused=True)
    inf_vars = fold_bn_variables(variables)
    out_mesh, out_pose = inf_model.apply(inf_vars, art, x, False)

    np.testing.assert_allclose(np.asarray(out_pose), np.asarray(ref_pose),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_mesh), np.asarray(ref_mesh),
                               rtol=1e-3, atol=1e-4)


def _grid_faces(w: int, h: int) -> np.ndarray:
    """Long thin triangulated strip: RCM bandwidth ~2w << 128, so every
    band level is strict block-tridiagonal (band_k == 1) and the flat
    deploy pipeline (fused Pallas kernels) engages even on tiny CPU tests."""
    idx = lambda r, c: r * w + c
    faces = []
    for r in range(h - 1):
        for c in range(w - 1):
            faces.append((idx(r, c), idx(r, c + 1), idx(r + 1, c)))
            faces.append((idx(r, c + 1), idx(r + 1, c + 1), idx(r + 1, c)))
    return np.asarray(faces, np.int32)


@pytest.mark.slow
def test_flat_deploy_path_matches_3d():
    """The inference flat pipeline (2-D layout, fused skips, out_3d last
    conv, pack-time row padding) must reproduce the 3-D path exactly."""
    from pose2mesh_release_tpu.models.fold import fold_bn_variables

    J = 7
    skel = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6)]
    faces = _grid_faces(6, 260)  # V = 1560
    pyr = build_pyramid(faces, joint_num=J, skeleton=skel, levels=4)
    art = pack_pyramid(pyr, faces, dense_threshold=100)
    band_ops = [op for op in art.mesh_ops if op.kind == "band"]
    assert band_ops, "expected band levels"
    assert all(op.band_k == 1 for op in band_ops)
    # pack-time padding: tile counts multiples of 4 (when > 4)
    for op in band_ops:
        nt = op.band_val.shape[1]
        assert nt <= 4 or nt % 4 == 0
        assert op.padded_vertices == nt * op.block_size

    # covers: flat entry straight after the FC (no gather), interp-proj
    # skip with padded lanes (16->32), identity add skip (32->32),
    # interp-proj skip (32->16), padded up-gathers, out_3d final conv
    blocks = ((5, 16, 16), (16, 32), (32, 32), (32, 16), (16, 8, 3))
    net = MeshNet(blocks=blocks)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, J, 5)), jnp.float32)
    v = jax.jit(net.init, static_argnums=3)(jax.random.PRNGKey(0), art, x, False)
    y3d = extract_mesh(art, net.apply(v, art, x, False))

    netf = MeshNet(blocks=blocks, inference_fused=True)
    yf = extract_mesh(art, netf.apply(fold_bn_variables(v), art, x, False))
    np.testing.assert_allclose(np.asarray(y3d), np.asarray(yf),
                               rtol=1e-4, atol=1e-5)


def test_deploy_lane_packing_matches_plain():
    """Flat deploy path with batch-pair lane packing active (sub-128-channel
    final block, B divisible by the packing factor) == plain XLA forward."""
    from pose2mesh_release_tpu.body.synthetic import uv_sphere
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.models.fold import fold_bn_variables
    from pose2mesh_release_tpu.models.meshnet import extract_mesh
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh

    J = 7
    blocks = ((5, 8, 8), (8, 16), (16, 16), (16, 16), (16, 8, 3))
    _, faces = uv_sphere(770)
    pyr = build_pyramid(faces, joint_num=J,
                        skeleton=[(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6)],
                        levels=4)
    art = pack_pyramid(pyr, faces, dense_threshold=300)
    assert art.mesh_ops[0].kind == "band"

    # B=16: fin=16 packs 8/group, then fin=8 re-packs 16/group
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((16, J, 2)), jnp.float32)
    plain = Pose2Mesh(num_joint=J, posenet_hidden=32, blocks=blocks,
                      use_pallas=False)
    variables = plain.init(jax.random.PRNGKey(0), art, x, False)
    ref_mesh, ref_pose = plain.apply(variables, art, x, False)

    fused = Pose2Mesh(num_joint=J, posenet_hidden=32, blocks=blocks,
                      use_pallas=True, inference_fused=True)
    fus_mesh, fus_pose = fused.apply(fold_bn_variables(variables), art, x, False)
    np.testing.assert_allclose(np.asarray(extract_mesh(art, fus_mesh)),
                               np.asarray(extract_mesh(art, ref_mesh)),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fus_pose), np.asarray(ref_pose),
                               rtol=1e-4, atol=1e-5)


def test_bn_fold_training_path_matches(monkeypatch):
    """P2M_FOLD_BN=1 (BN-apply+ReLU folded into the next conv's in-kernel
    input read) must reproduce the default path: same forward, same
    gradients, same running-stat updates, same variable tree."""
    import jax

    from pose2mesh_release_tpu.body.synthetic import uv_sphere
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh

    _, faces = uv_sphere(770)
    pyr = build_pyramid(faces, joint_num=7,
                        skeleton=[(0, 1), (1, 2), (2, 3)], levels=4)
    art = pack_pyramid(pyr, faces, dense_threshold=300)
    blocks = ((5, 8, 8), (8, 16), (16, 16, 16), (16, 16), (16, 8, 3))
    model = Pose2Mesh(num_joint=7, posenet_hidden=32, blocks=blocks)
    rng = np.random.default_rng(0)
    pose2d = jnp.asarray(rng.standard_normal((2, 7, 2)), jnp.float32)

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("P2M_FOLD_BN", flag)
        jax.clear_caches()
        variables = model.init(jax.random.PRNGKey(0), art, pose2d, False)

        def loss(params):
            (mesh, pose3d), mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                art, pose2d, True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return (mesh.astype(jnp.float32) ** 2).sum() * 1e-3 \
                + (pose3d ** 2).sum() * 1e-9, mut["batch_stats"]

        (val, new_bs), grads = jax.value_and_grad(loss, has_aux=True)(
            variables["params"])
        outs[flag] = (val, grads, new_bs,
                      jax.tree.structure(variables["params"]))

    # identical variable trees (checkpoint compatibility)
    assert outs["0"][3] == outs["1"][3]
    np.testing.assert_allclose(float(outs["0"][0]), float(outs["1"][0]),
                               rtol=5e-3)
    for a, b in zip(jax.tree.leaves(outs["0"][1]),
                    jax.tree.leaves(outs["1"][1])):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-3)
    for a, b in zip(jax.tree.leaves(outs["0"][2]),
                    jax.tree.leaves(outs["1"][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)
