"""Engine tests: losses, train step semantics, overfit smoke."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose2mesh_release_tpu.body.synthetic import uv_sphere
from pose2mesh_release_tpu.core.losses import (
    coord_l1,
    edge_length_loss,
    make_laplacian_loss,
    normal_vector_loss,
)
from pose2mesh_release_tpu.core.metrics import mpjpe, pa_mpjpe, rigid_align
from pose2mesh_release_tpu.core.optim import ReduceLROnPlateau, make_preconditioner, multistep_lr
from pose2mesh_release_tpu.core.train import TrainState, make_posenet_steps, make_train_step
from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
from pose2mesh_release_tpu.graphs.build import build_pyramid
from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh
from pose2mesh_release_tpu.models.posenet import PoseNet

J = 7
SKEL = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6)]
TEST_BLOCKS = ((5, 8, 8), (8, 16), (16, 16), (16, 16), (16, 8, 3))


@pytest.fixture(scope="module")
def setup():
    _, faces = uv_sphere(770)
    pyr = build_pyramid(faces, joint_num=J, skeleton=SKEL, levels=4)
    art = pack_pyramid(pyr, faces, dense_threshold=300)
    model = Pose2Mesh(num_joint=J, posenet_hidden=64, blocks=TEST_BLOCKS)
    return art, model, faces


def _batch(rng, B, V):
    return {
        "pose2d": jnp.asarray(rng.standard_normal((B, J, 2)), jnp.float32),
        "mesh": jnp.asarray(rng.standard_normal((B, V, 3)) * 0.1, jnp.float32),
        "mesh_valid": jnp.ones((B, V, 3), jnp.float32),
        "reg_pose3d": jnp.asarray(rng.standard_normal((B, J, 3)) * 100, jnp.float32),
        "reg_pose3d_valid": jnp.ones((B, J, 3), jnp.float32),
        "lift_pose3d": jnp.asarray(rng.standard_normal((B, J, 3)) * 100, jnp.float32),
        "lift_pose3d_valid": jnp.ones((B, J, 3), jnp.float32),
    }


def test_coord_l1_masking():
    pred = jnp.ones((2, 4, 3))
    target = jnp.zeros((2, 4, 3))
    valid = jnp.zeros((2, 4, 3)).at[:, :2].set(1.0)
    # masked entries contribute 0 but stay in the denominator (reference
    # CoordLoss semantics, loss.py:10-23)
    assert float(coord_l1(pred, target, valid)) == pytest.approx(0.5)
    assert float(coord_l1(pred, target, None)) == pytest.approx(1.0)


def test_laplacian_loss_matches_dense_reference():
    # segment-sum form == the reference's dense row-normalized Laplacian
    # (loss.py:26-59) applied per sample
    _, faces = uv_sphere(110)
    f = np.asarray(faces)
    nv = int(f.max()) + 1
    lap = np.zeros((nv, nv), np.float32)
    lap[f[:, 0], f[:, 1]] = -1; lap[f[:, 1], f[:, 0]] = -1
    lap[f[:, 1], f[:, 2]] = -1; lap[f[:, 2], f[:, 1]] = -1
    lap[f[:, 2], f[:, 0]] = -1; lap[f[:, 0], f[:, 2]] = -1
    r, c = np.diag_indices(nv)
    lap[r, c] = -lap.sum(1)
    lap /= lap[r, c][:, None] + 1e-8

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, nv, 3)).astype(np.float32)
    want = float((np.einsum("vw,bwc->bvc", lap, x) ** 2).sum(2).mean())
    got = make_laplacian_loss(faces)(jnp.asarray(x))
    assert float(got) == pytest.approx(want, rel=1e-4)
    got_avg = make_laplacian_loss(faces)(jnp.asarray(x), average=True)
    want_avg = float((np.einsum("vw,bwc->bvc", lap, x) ** 2).sum(2).sum() / 2)
    assert float(got_avg) == pytest.approx(want_avg, rel=1e-4)


def test_normal_and_edge_losses_zero_at_gt():
    _, faces = uv_sphere(110)
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.standard_normal((2, 110, 3)), jnp.float32)
    f = jnp.asarray(faces)
    assert float(edge_length_loss(gt, gt, f)) == pytest.approx(0.0, abs=1e-6)
    # normal loss at gt: edges are perpendicular to gt normals -> ~0
    assert float(normal_vector_loss(gt, gt, f)) == pytest.approx(0.0, abs=1e-5)
    # a perturbed mesh must score strictly worse
    pred = gt + 0.1 * jnp.asarray(rng.standard_normal((2, 110, 3)), jnp.float32)
    assert float(edge_length_loss(pred, gt, f)) > 0.01
    assert float(normal_vector_loss(pred, gt, f)) > 0.01


def test_degenerate_triangle_grads_finite():
    """Round-3 regression (TRAINING_r3 NaN): a bf16-quantized prediction can
    contain exactly-coincident vertices (zero-length edges, degenerate
    triangles).  The grad of the full loss stack — run at the training
    dtype, bf16 prediction — must stay finite; one bad triangle must not
    poison the whole gradient (losses.py _normalize / elen double-where)."""
    _, faces = uv_sphere(110)
    f = jnp.asarray(faces)
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.standard_normal((2, 110, 3)), jnp.float32)

    def make_pred(kind):
        p = np.asarray(rng.standard_normal((2, 110, 3)), np.float32)
        v0, v1, v2 = faces[0]
        if kind == "coincident_edge":       # zero-length edge in face 0
            p[:, v1] = p[:, v0]
        elif kind == "coincident_face":     # fully collapsed triangle
            p[:, v1] = p[:, v0]
            p[:, v2] = p[:, v0]
        elif kind == "colinear":            # zero cross product in gt path
            p[:, v2] = 2.0 * p[:, v1] - p[:, v0]
        # quantize through bf16 exactly like the training forward
        return jnp.asarray(p, jnp.bfloat16).astype(jnp.float32)

    def total(pred, gt_m):
        return (normal_vector_loss(pred, gt_m, f)
                + edge_length_loss(pred, gt_m, f)
                + coord_l1(pred, gt_m))

    for kind in ("coincident_edge", "coincident_face", "colinear"):
        pred = make_pred(kind)
        val, grad = jax.value_and_grad(total)(pred, gt)
        assert np.isfinite(float(val)), kind
        assert bool(jnp.isfinite(grad).all()), kind
        # degenerate GT (colinear gt edges -> zero-norm gt normal) too
        val2, grad2 = jax.value_and_grad(total)(gt, pred)
        assert np.isfinite(float(val2)), kind
        assert bool(jnp.isfinite(grad2).all()), kind


def test_metrics_procrustes():
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.standard_normal((4, 17, 3)), jnp.float32)
    # a similarity transform of gt must align exactly -> PA-MPJPE ~ 0
    theta = 0.7
    R = jnp.asarray(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]],
        jnp.float32,
    )
    pred = 2.0 * gt @ R.T + jnp.asarray([1.0, -2.0, 3.0])
    assert float(pa_mpjpe(pred, gt)) == pytest.approx(0.0, abs=1e-3)
    assert float(mpjpe(gt, gt)) == 0.0
    aligned = rigid_align(pred[0], gt[0])
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(gt[0]), atol=1e-4)


@pytest.mark.slow
def test_train_step_decreases_loss(setup):
    art, model, faces = setup
    rng = np.random.default_rng(0)
    B, V = 8, art.num_vertices
    batch = _batch(rng, B, V)
    j_reg = jnp.asarray(rng.random((J, V)), jnp.float32)
    j_reg = j_reg / j_reg.sum(axis=1, keepdims=True)

    variables = model.init(jax.random.PRNGKey(0), art, batch["pose2d"], False)
    tx = make_preconditioner("rmsprop")
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, tx, j_reg))

    losses_hist = []
    for i in range(30):
        state, losses = step(state, art, batch, jnp.float32(1e-3),
                             jnp.bool_(False), jax.random.PRNGKey(42))
        losses_hist.append(float(losses["total"]))
    assert int(state.step) == 30
    assert all(np.isfinite(losses_hist))
    # overfitting one batch must cut the loss substantially
    assert losses_hist[-1] < 0.7 * losses_hist[0], losses_hist[::10]


@pytest.mark.slow
def test_edge_loss_gate(setup):
    art, model, _ = setup
    rng = np.random.default_rng(0)
    batch = _batch(rng, 4, art.num_vertices)
    j_reg = jnp.ones((J, art.num_vertices), jnp.float32) / art.num_vertices
    variables = model.init(jax.random.PRNGKey(0), art, batch["pose2d"], False)
    tx = make_preconditioner("rmsprop")
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, tx, j_reg))
    _, l_off = step(state, art, batch, jnp.float32(1e-3), jnp.bool_(False), jax.random.PRNGKey(0))
    _, l_on = step(state, art, batch, jnp.float32(1e-3), jnp.bool_(True), jax.random.PRNGKey(0))
    assert float(l_off["edge"]) == 0.0
    assert float(l_on["edge"]) > 0.0
    assert float(l_on["total"]) == pytest.approx(
        float(l_off["total"]) + float(l_on["edge"]), rel=1e-5
    )


def test_posenet_overfit():
    model = PoseNet(num_joint=J, hidden=64)
    rng = np.random.default_rng(0)
    batch = {
        "pose2d": jnp.asarray(rng.standard_normal((8, J, 2)), jnp.float32),
        "pose3d": jnp.asarray(rng.standard_normal((8, J, 3)) * 50, jnp.float32),
        "pose3d_valid": jnp.ones((8, J, 3), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["pose2d"], False)
    tx = make_preconditioner("adam")
    state = TrainState.create(variables, tx)
    train_step, eval_step = make_posenet_steps(model, tx)
    train_step = jax.jit(train_step)
    l0 = None
    for i in range(60):
        state, loss = train_step(state, batch, jnp.float32(1e-2), jax.random.PRNGKey(1))
        l0 = l0 or float(loss)
    assert float(loss) < 0.5 * l0
    pred = eval_step(state, batch["pose2d"])
    assert pred.shape == (8, J, 3)


def test_schedules():
    lr = multistep_lr(1e-3, [12], 0.1)
    assert lr(1) == pytest.approx(1e-3)
    assert lr(12) == pytest.approx(1e-4)
    assert lr(20) == pytest.approx(1e-4)
    sched = ReduceLROnPlateau(1e-3, patience=1)
    lrs = [sched.step(5.0), sched.step(5.0), sched.step(5.0)]
    assert lrs[-1] == pytest.approx(1e-4)


def test_face_take_vjp_matches_autodiff():
    """The scatter-free face-gather VJP (losses.face_take + artifact
    face_inverse_tables) must produce bit-comparable gradients to plain
    jnp.take autodiff for both losses."""
    from pose2mesh_release_tpu.core.losses import face_take
    from pose2mesh_release_tpu.graphs.artifact import face_inverse_tables

    _, faces = uv_sphere(110)
    faces_np = np.asarray(faces, np.int32)
    inv = face_inverse_tables(faces_np, 110)
    f = jnp.asarray(faces_np)
    rng = np.random.default_rng(3)
    pred = jnp.asarray(rng.standard_normal((2, 110, 3)), jnp.float32)
    gt = jnp.asarray(rng.standard_normal((2, 110, 3)), jnp.float32)

    # raw primitive: forward identical, grads match
    def via_take(p):
        return (p[:, f[:, 1]] * gt[:, f[:, 0]]).sum()

    def via_face_take(p):
        return (face_take(p, f[:, 1], inv[1]) * gt[:, f[:, 0]]).sum()

    np.testing.assert_allclose(float(via_take(pred)),
                               float(via_face_take(pred)), rtol=1e-6)
    g_a = jax.grad(via_take)(pred)
    g_b = jax.grad(via_face_take)(pred)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=1e-5, atol=1e-6)

    # full losses: tables vs no tables
    for loss in (normal_vector_loss, edge_length_loss):
        va, ga = jax.value_and_grad(lambda p: loss(p, gt, f))(pred)
        vb, gb = jax.value_and_grad(lambda p: loss(p, gt, f, inv))(pred)
        np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-6)


def test_face_band_scatter_parity():
    """face_take3_band (banded 0/1-selector matmul VJP) must reproduce the
    plain autodiff gather/scatter exactly: forward corners AND the mesh
    gradient through the full normal+edge loss stack."""
    import jax

    from pose2mesh_release_tpu.body.synthetic import uv_sphere
    from pose2mesh_release_tpu.core.losses import (
        edge_length_loss, face_take3_band, normal_vector_loss,
    )
    from pose2mesh_release_tpu.graphs.artifact import face_band_tables

    _, faces_np = uv_sphere(770)
    faces_np = faces_np.astype(np.int32)
    V = 770
    rng = np.random.default_rng(21)
    # a non-identity device order exercises the tile mapping honestly
    vg = rng.permutation(V).astype(np.int32)
    perm, sel = face_band_tables(faces_np, vg, V, T=128)
    assert sel.size, "tables must build for the test mesh"
    vgj = jnp.asarray(vg)
    pred = jnp.asarray(rng.standard_normal((3, V, 3)).astype(np.float32))
    gt = jnp.asarray(rng.standard_normal((3, V, 3)).astype(np.float32))
    faces = jnp.asarray(faces_np)

    c = face_take3_band(pred, faces, perm, sel, vgj)
    np.testing.assert_array_equal(np.asarray(c),
                                  np.asarray(pred[:, faces_np]))

    def loss_band(p):
        cs = face_take3_band(p, faces, perm, sel, vgj)
        corners = (cs[:, :, 0], cs[:, :, 1], cs[:, :, 2])
        return (normal_vector_loss(p, gt, faces, corners=corners)
                + edge_length_loss(p, gt, faces, corners=corners))

    def loss_plain(p):
        return (normal_vector_loss(p, gt, faces)
                + edge_length_loss(p, gt, faces))

    np.testing.assert_allclose(float(loss_band(pred)),
                               float(loss_plain(pred)), rtol=1e-6)
    g_band = jax.grad(loss_band)(pred)
    g_plain = jax.grad(loss_plain)(pred)
    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-6)
