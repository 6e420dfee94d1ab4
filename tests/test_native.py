"""Native C++ kernels vs the numpy reference path, and the fused batch
pipeline vs the per-sample __getitem__ pipeline."""
import numpy as np
import pytest

from pose2mesh_release_tpu import native
from pose2mesh_release_tpu.data import pipeline as pl
from pose2mesh_release_tpu.utils import augment as aug


def test_native_builds():
    if not native.available():
        pytest.skip("no g++ toolchain")
    assert native.lib() is not None


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_affine_batch_matches_numpy():
    rng = np.random.default_rng(0)
    B, J = 16, 19
    joints = rng.standard_normal((B, J, 2)).astype(np.float32) * 100
    mats = rng.standard_normal((B, 2, 3)).astype(np.float32)
    fast = native.affine_batch(joints, mats)
    ones = np.ones((B, J, 1), np.float32)
    ref = np.einsum("bij,bkj->bki", mats,
                    np.concatenate([joints, ones], 2)).astype(np.float32)
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_standardize_batch_matches_numpy():
    rng = np.random.default_rng(1)
    joints = (rng.standard_normal((8, 17, 2)) * 200 + 150).astype(np.float32)
    fast = native.standardize_batch(joints, 288.0, 384.0)
    ref = joints / np.array([[[288.0, 384.0]]], np.float32)
    mean = ref.mean(1, keepdims=True)
    std = np.maximum(ref.std(1, keepdims=True), 1e-6)
    ref = (ref - mean) / std
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_rot_flip_3d_matches_reference_aug():
    rng = np.random.default_rng(2)
    B, J = 6, 17
    pairs = ((1, 4), (2, 5), (3, 6))
    joints = rng.standard_normal((B, J, 3)).astype(np.float32) * 100
    rot = rng.uniform(-60, 60, B).astype(np.float64)
    flip = (rng.uniform(size=B) < 0.5).astype(np.uint8)
    fast = native.rot_flip_3d_batch(joints, rot, flip, np.asarray(pairs))
    for b in range(B):
        ref = aug.j3d_processing(joints[b].copy(), float(rot[b]),
                                 int(flip[b]), pairs)
        np.testing.assert_allclose(fast[b], ref, rtol=1e-4, atol=1e-3)


def test_batched_affine_matches_per_sample():
    rng = np.random.default_rng(3)
    B = 8
    joints = (rng.standard_normal((B, 19, 2)) * 150 + 300).astype(np.float32)
    from pose2mesh_release_tpu.utils.coords import get_bbox, process_bbox
    from pose2mesh_release_tpu.utils.augment import get_affine_transform
    from pose2mesh_release_tpu.utils.coords import get_center_scale

    rot = rng.uniform(-45, 45, B)
    center, scale = pl.batched_bbox(joints, 288 / 384)
    mats = pl.batched_affine(center, scale, rot, (288, 384))
    for b in range(B):
        bbox = process_bbox(get_bbox(joints[b]), 288 / 384)
        c, s = get_center_scale(bbox)
        ref = get_affine_transform(c, s, rot[b], (288, 384))
        np.testing.assert_allclose(mats[b], ref, rtol=1e-6, atol=1e-6)


def test_batch_pipeline_matches_getitem(tmp_path):
    """Eval mode (no random aug): fused batch == stacked per-sample."""
    import json
    from pose2mesh_release_tpu.body.smpl import SMPL
    from pose2mesh_release_tpu.data.human36m import Human36M

    # reuse the h36m fixture generator inline (eval split, subject 9/11)
    root = tmp_path
    annot = root / "annotations"
    annot.mkdir()
    rng = np.random.default_rng(0)
    for subject in (9, 11):
        images, annotations = [], []
        joints = {"2": {"1": {}}}
        smpl_params = {"2": {"1": {}}}
        for i in range(4):
            frame = i * 50
            images.append({
                "id": i, "file_name": f"s_{subject:02d}_act_02_subact_01_ca_01_{frame:06d}.jpg",
                "width": 1000, "height": 1000, "subject": subject,
                "action_idx": 2, "subaction_idx": 1, "frame_idx": frame,
                "cam_idx": 1,
            })
            annotations.append({"id": i, "image_id": i,
                                "bbox": [300.0, 300.0, 400.0, 400.0]})
            joints["2"]["1"][str(frame)] = (
                rng.standard_normal((17, 3)) * 200).tolist()
            smpl_params["2"]["1"][str(frame)] = {
                "pose": (rng.standard_normal(72) * 0.1).tolist(),
                "shape": (rng.standard_normal(10) * 0.5).tolist(),
                "trans": [0.0, 0.0, 0.0],
            }
        base = annot / f"Human36M_subject{subject}"
        with open(f"{base}_data.json", "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)
        with open(f"{base}_camera.json", "w") as f:
            json.dump({"1": {"R": np.eye(3).tolist(), "t": [0.0, 0.0, 5000.0],
                             "f": [1500.0, 1500.0], "c": [500.0, 500.0]}}, f)
        with open(f"{base}_joint_3d.json", "w") as f:
            json.dump(joints, f)
        with open(f"{base}_smpl_param.json", "w") as f:
            json.dump(smpl_params, f)

    ds = Human36M("test", data_dir=str(root), mesh_model=SMPL(),
                  build_graph=False, input_joint_name="human36")
    assert ds.supports_batch()
    idx = list(range(len(ds)))
    bi, bt, bm = ds.get_batch(idx)
    for k, i in enumerate(idx):
        si, st, sm = ds[i]
        np.testing.assert_allclose(bi["pose2d"][k], si["pose2d"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(bt["mesh"][k], st["mesh"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(bt["reg_pose3d"][k], st["reg_pose3d"],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(bm["mesh_valid"][k], sm["mesh_valid"])
