"""Engine integration: Trainer/Tester epoch loop on a tiny synthetic setup,
checkpoint save/resume, CLI arg parsing, camera fit, renderer, smoothing."""
import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose2mesh_release_tpu.body.synthetic import uv_sphere
from pose2mesh_release_tpu.config import default_config
from pose2mesh_release_tpu.core.engine import Tester, Trainer
from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
from pose2mesh_release_tpu.graphs.build import build_pyramid
from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh

J = 7
V = 770
SKEL = ((0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6))
TEST_BLOCKS = ((5, 8, 8), (8, 16), (16, 16), (16, 16), (16, 8, 3))


class TinyMeshModel:
    def __init__(self, faces):
        self.face = faces
        self.vertex_num = V


class TinyDataset:
    """Duck-typed dataset over a sphere mesh (engine contract)."""
    name = "Tiny"

    def __init__(self, n, art, faces, seed=0):
        rng = np.random.default_rng(seed)
        self.n = n
        self.graph = art
        self.joint_num = J
        self.mesh_model = TinyMeshModel(faces)
        self.pose2d = rng.standard_normal((n, J, 2)).astype(np.float32)
        self.mesh = (rng.standard_normal((n, V, 3)) * 0.05).astype(np.float32)
        self.pose3d = (rng.standard_normal((n, J, 3)) * 50).astype(np.float32)
        reg = rng.random((J, V)).astype(np.float32) ** 4
        self.reg = reg / reg.sum(1, keepdims=True)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        inputs = {"pose2d": self.pose2d[i]}
        targets = {"mesh": self.mesh[i], "lift_pose3d": self.pose3d[i],
                   "reg_pose3d": self.pose3d[i]}
        meta = {"mesh_valid": np.ones((V, 1), np.float32),
                "lift_pose3d_valid": np.ones((J, 1), np.float32),
                "reg_pose3d_valid": np.ones((J, 1), np.float32)}
        return inputs, targets, meta

    def target_regressor(self):
        return self.reg

    def compute_both_err(self, pm, tm, pj, tj):
        return (float(np.abs(pj - tj).mean()), float(np.abs(pm - tm).mean()))

    def evaluate(self, outs):
        return {"mpjpe": 1.0}


@pytest.fixture(scope="module")
def tiny_setup():
    _, faces = uv_sphere(V)
    pyr = build_pyramid(faces, joint_num=J, skeleton=SKEL, levels=4)
    art = pack_pyramid(pyr, faces, dense_threshold=300)
    return art, faces


def _cfg(tmpdir):
    cfg = default_config()
    cfg.TRAIN.batch_size = 4
    cfg.TRAIN.end_epoch = 2
    cfg.TRAIN.print_freq = 100
    cfg.TEST.batch_size = 4
    cfg.DATASET.workers = 1
    cfg.TPU.compute_dtype = "f32"
    cfg.output_dir = str(tmpdir)
    return cfg


@pytest.mark.slow
def test_trainer_fit_and_resume(tiny_setup, tmp_path):
    art, faces = tiny_setup
    cfg = _cfg(tmp_path)
    train_ds = TinyDataset(8, art, faces, seed=0)
    test_ds = TinyDataset(8, art, faces, seed=1)
    model = Pose2Mesh(num_joint=J, posenet_hidden=32, blocks=TEST_BLOCKS)

    tr = Trainer(cfg, datasets=[train_ds], test_dataset=test_ds, model=model)
    result = tr.fit()
    assert "joint_err" in result and np.isfinite(result["joint_err"])
    assert osp.exists(osp.join(cfg.checkpoint_dir, "checkpoint2.ckpt"))
    assert osp.exists(osp.join(cfg.checkpoint_dir, "best.ckpt"))
    assert osp.exists(osp.join(cfg.checkpoint_dir, "final.ckpt"))
    assert osp.exists(osp.join(cfg.output_dir, "metrics.jsonl"))
    assert osp.exists(osp.join(cfg.graph_dir, "train_loss.pdf"))
    assert len(tr.train_log) == 2

    # resume: begin_epoch fast-forwards past saved epochs
    tr2 = Trainer(cfg, resume=True, datasets=[train_ds],
                  test_dataset=test_ds, model=model)
    assert tr2.begin_epoch == 3
    assert len(tr2.train_log) == 2


@pytest.mark.slow
def test_tester_with_checkpoint(tiny_setup, tmp_path):
    art, faces = tiny_setup
    cfg = _cfg(tmp_path)
    train_ds = TinyDataset(8, art, faces, seed=0)
    test_ds = TinyDataset(8, art, faces, seed=1)
    model = Pose2Mesh(num_joint=J, posenet_hidden=32, blocks=TEST_BLOCKS)
    tr = Trainer(cfg, datasets=[train_ds], test_dataset=test_ds, model=model)
    tr.train_epoch(1)
    tr._save(1, True, False)

    te = Tester(cfg, load_path=osp.join(cfg.checkpoint_dir, "best.ckpt"),
                dataset=test_ds, mesh_model=train_ds.mesh_model, model=model)
    out = te.test(0)
    assert np.isfinite(out["joint_err"])


def test_cli_arg_parsing():
    from pose2mesh_release_tpu.cli.demo import parse_args as demo_args
    from pose2mesh_release_tpu.cli.test import parse_args as test_args
    from pose2mesh_release_tpu.cli.train import parse_args as train_args
    a = train_args(["--cfg", "x.yml", "--resume_training", "--seed", "7"])
    assert a.cfg == "x.yml" and a.resume_training and a.seed == 7
    a = test_args(["--weights", "w.npz"])
    assert a.weights == "w.npz"
    a = demo_args(["--input_pose", "p.npy", "--joint_set", "coco"])
    assert a.joint_set == "coco"


def test_camera_fit_recovers_params():
    from pose2mesh_release_tpu.models.camera import fit_camera, project_weak
    rng = np.random.default_rng(0)
    j3d = jnp.asarray(rng.standard_normal((17, 3)).astype(np.float32))
    true_cam = jnp.asarray([1.8, 0.25, -0.4])  # normalized crop coords
    target = project_weak(j3d, true_cam, 500.0)
    cam = fit_camera(j3d, target, num_steps=1500, img_res=500.0)
    recon = project_weak(j3d, cam, 500.0)
    assert float(jnp.abs(recon - target).mean()) < 1.0  # < 1 px reprojection


def test_renderer_overlay():
    from pose2mesh_release_tpu.utils.renderer import render_mesh_overlay
    _, faces = uv_sphere(110)
    verts = np.zeros((110, 3), np.float32)
    rng = np.random.default_rng(1)
    # unit sphere vertices
    from pose2mesh_release_tpu.body.synthetic import uv_sphere as us
    v, f = us(110)
    img = np.zeros((64, 64, 3), np.uint8)
    out = render_mesh_overlay(img, v * 0.5, f, np.array([40.0, 32.0, 32.0]))
    assert out.shape == (64, 64, 3)
    assert out.sum() > 0  # something was drawn


def test_one_euro_smoothing():
    from pose2mesh_release_tpu.utils.smooth import smooth_pose
    rng = np.random.default_rng(2)
    t = np.linspace(0, 2 * np.pi, 60)
    clean = np.stack([np.sin(t), np.cos(t), t * 0], -1)[:, None, :]
    clean = np.repeat(clean, 5, axis=1).astype(np.float32)
    noisy = clean + rng.standard_normal(clean.shape).astype(np.float32) * 0.15
    sm = smooth_pose(noisy, min_cutoff=0.004, beta=0.7)
    assert sm.shape == noisy.shape
    # smoothing reduces error vs GT
    assert np.abs(sm - clean).mean() < np.abs(noisy - clean).mean()


def test_save_obj(tmp_path):
    from pose2mesh_release_tpu.utils.io import save_obj
    v, f = uv_sphere(110)
    p = str(tmp_path / "m.obj")
    save_obj(v, f, p)
    lines = open(p).read().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == len(v)
    assert sum(1 for l in lines if l.startswith("f ")) == len(f)


def test_reference_yamls_parse():
    """All 18 reference experiment YAMLs load unchanged
    (lib/core/config.py:87-109 compatibility)."""
    import glob
    from pose2mesh_release_tpu.config import load_config
    paths = sorted(glob.glob("/root/reference/asset/yaml/*.yml"))
    if not paths:
        pytest.skip("reference not mounted")
    for p in paths:
        cfg = load_config(p)
        assert cfg.TRAIN.batch_size > 0
    # spot-check one config's values
    cfg = load_config("/root/reference/asset/yaml/pose2mesh_human36J_train_human36.yml")
    assert cfg.DATASET.train_list == ["Human36M"]
    assert cfg.TRAIN.end_epoch == 15 and cfg.TRAIN.edge_loss_start == 7
    assert cfg.MODEL.posenet_pretrained is True


def _write_freihand_fixture(dirpath, split, n=4, seed=8):
    """Minimal FreiHAND annotation files in the real schema
    (reference data/FreiHAND/dataset.py:41-66 json layout)."""
    import json as _json

    rng = np.random.default_rng(seed)
    images, annotations, data = [], [], {}
    for i in range(n):
        images.append({"id": i, "file_name": f"rgb/{i:08d}.jpg",
                       "width": 224, "height": 224, "db_idx": i})
        annotations.append({"id": i, "image_id": i,
                            "bbox": [40.0, 40.0, 150.0, 150.0]})
        data[str(i)] = {
            "cam_param": {"focal": [500.0, 500.0], "princpt": [112.0, 112.0],
                          "R": np.eye(3).tolist(), "t": [0.0, 0.0, 0.5]},
            "mano_param": {"pose": (rng.standard_normal(48) * 0.1).tolist(),
                           "shape": (rng.standard_normal(10) * 0.3).tolist()},
            "joint_3d": (rng.standard_normal((21, 3)) * 50).tolist(),
        }
    tag = "train" if split == "train" else "eval"
    with open(osp.join(dirpath, f"freihand_{tag}_coco.json"), "w") as f:
        _json.dump({"images": images, "annotations": annotations}, f)
    with open(osp.join(dirpath, f"freihand_{tag}_data.json"), "w") as f:
        _json.dump(data, f)


@pytest.mark.slow
def test_freihand_mano_train_and_codalab_dump(tmp_path):
    """End-to-end MANO config (VERDICT r3 item #10): Trainer.fit one epoch
    on fixture FreiHAND data with the REAL 6-level MANO pyramid +
    MANO_BLOCKS schedule, then eval-split Tester writes the codalab
    pred.json in the [joints, meshes] schema
    (reference data/FreiHAND/dataset.py:230-256)."""
    import json as _json

    from pose2mesh_release_tpu.body.mano import MANO
    from pose2mesh_release_tpu.data.freihand import FreiHAND

    mano = MANO()
    _write_freihand_fixture(str(tmp_path), "train")
    _write_freihand_fixture(str(tmp_path), "eval")
    out_dir = str(tmp_path / "out")
    train_ds = FreiHAND("train", data_dir=str(tmp_path), mesh_model=mano,
                        output_dir=out_dir)
    eval_ds = FreiHAND("test", data_dir=str(tmp_path), mesh_model=mano,
                       build_graph=False, output_dir=out_dir)
    eval_ds.graph = train_ds.graph  # same pyramid (both construct it once
    # per dataset in the reference, FreiHAND/dataset.py:48-49)

    cfg = _cfg(tmp_path)
    cfg.TRAIN.end_epoch = 1
    cfg.DATASET.input_joint_set = "mano"
    cfg.MODEL.posenet_hidden = 64  # keep the CPU run fast; schedule is real
    tr = Trainer(cfg, datasets=[train_ds], test_dataset=eval_ds,
                 mesh_model=mano)
    assert len(tr.art.mesh_ops) + 2 == 7  # real MANO_BLOCKS depth
    result = tr.fit()
    assert np.isfinite(tr.train_log[-1])
    assert np.isfinite(result.get("joint_err", np.nan))

    pred_path = osp.join(out_dir, "pred.json")
    assert osp.exists(pred_path)
    with open(pred_path) as f:
        pred = _json.load(f)
    # codalab schema: [xyz_pred_list, verts_pred_list]
    assert isinstance(pred, list) and len(pred) == 2
    joints, verts = np.asarray(pred[0]), np.asarray(pred[1])
    assert joints.shape == (len(eval_ds), 21, 3)
    assert verts.shape == (len(eval_ds), 778, 3)
    assert np.isfinite(joints).all() and np.isfinite(verts).all()


def test_trainer_multi_step_dispatch_matches(tiny_setup, tmp_path):
    """cfg.TPU.steps_per_dispatch > 1 (k batches stacked into one transfer
    + one jitted k-step scan) must reproduce the k=1 epoch exactly: same
    data order, same per-step rng (folded off state.step), same final
    parameters."""
    art, faces = tiny_setup
    results = {}
    for k in (1, 2):
        cfg = _cfg(tmp_path / f"k{k}")
        cfg.TRAIN.shuffle = False
        cfg.TPU.steps_per_dispatch = k
        model = Pose2Mesh(num_joint=J, posenet_hidden=32, blocks=TEST_BLOCKS)
        tr = Trainer(cfg, datasets=[TinyDataset(12, art, faces, seed=0)],
                     test_dataset=TinyDataset(4, art, faces, seed=1),
                     model=model)
        # 12 samples / batch 4 -> 3 full batches; k=2 runs ONE stacked
        # 2-step scan dispatch (the path under test) AND the 1-batch tail
        mean = tr.train_epoch(1)
        if k == 2:
            assert tr._multi_step is not None
        results[k] = (mean, jax.device_get(tr.state.params))
    m1, p1 = results[1]
    m4, p4 = results[2]
    np.testing.assert_allclose(m1, m4, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=1e-4, atol=1e-5), p1, p4)
