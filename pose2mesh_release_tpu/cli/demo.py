"""Demo CLI: 2D pose (.npy) or multi-person detections (.json) -> mesh.

Reference: demo/run.py (327 LoC).  Same interface:
  python -m pose2mesh_release_tpu.cli.demo --input_pose pose.npy \
      --joint_set {human36,coco,smpl,mano} [--input_img img.png] \
      [--weights ckpt.npz] [--out_dir demo_out]

Pipeline per person (demo/run.py:149-197, 225-251): tight bbox -> affine
crop to the model input resolution -> per-sample mean/std normalization ->
cascade forward -> un-permute -> regress 3D joints -> 1500-step jitted
weak-perspective camera fit (models.camera.fit_camera) -> z-buffer overlay
render (utils.renderer) + .obj dump.  Multi-person path consumes
HigherHRNet-format COCO json, adds pelvis/neck, confidence-filters and
NMS-dedups boxes (run.py:253-326).
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
from typing import Optional, Tuple

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Pose2Mesh demo (TPU)")
    p.add_argument("--input_pose", type=str, required=True,
                   help=".npy (J, 2|3) single person or .json detections")
    p.add_argument("--joint_set", type=str, default="human36",
                   choices=["human36", "coco", "smpl", "mano"])
    p.add_argument("--input_img", type=str, default="")
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--out_dir", type=str, default="demo_out")
    p.add_argument("--cam_steps", type=int, default=1500)
    p.add_argument("--gpu", type=str, default="", help="ignored")
    return p.parse_args(argv)


def _setting(joint_set: str):
    """(mesh_model, joint_set_meta, levels, regressor) per joint set
    (demo/run.py:70-124)."""
    from ..body.mano import MANO
    from ..body.smpl import SMPL
    from ..data.joint_sets import get_joint_set

    js = get_joint_set(joint_set)
    if joint_set == "mano":
        m = MANO()
        return m, js, 6, np.asarray(m.joint_regressor_mano)
    m = SMPL()
    reg = {"human36": m.joint_regressor_h36m,
           "coco": None, "smpl": m.joint_regressor_smpl}.get(joint_set)
    if joint_set == "coco":
        reg = np.asarray(m.joint_regressor_coco)
        names = js.joints_name
        lhip, rhip = names.index("L_Hip"), names.index("R_Hip")
        lsho, rsho = names.index("L_Shoulder"), names.index("R_Shoulder")
        extra = np.zeros((2, reg.shape[1]), np.float32)
        extra[0] = 0.5 * (reg[lhip] + reg[rhip])
        extra[1] = 0.5 * (reg[lsho] + reg[rsho])
        reg = np.concatenate([reg, extra])
    return m, js, 9, np.asarray(reg, np.float32)


def _normalize_input(joint_img: np.ndarray, input_shape: Tuple[int, int]):
    """Crop + standardize exactly like training (demo/run.py:150-160)."""
    from ..utils import augment as aug
    from ..utils.coords import get_bbox, process_bbox

    H, W = input_shape
    bbox = process_bbox(get_bbox(joint_img), W / H)
    pose, trans = aug.j2d_processing(joint_img.copy(), (W, H), bbox, 0, 0, None)
    pose = pose[:, :2] / np.array([[W, H]], np.float32)
    mean, std = pose.mean(0), pose.std(0)
    return ((pose - mean) / np.maximum(std, 1e-6)).astype(np.float32), trans


CROP_SIZE = 500  # square render-crop resolution (demo/run.py:237: crop 500)


def run_person(model, variables, art, joint_img, regressor, input_shape,
               cam_steps: int):
    import jax
    import jax.numpy as jnp

    from ..models.camera import fit_camera
    from ..models.meshnet import extract_mesh
    from ..utils import augment as aug
    from ..utils.coords import get_bbox, process_bbox

    norm, _ = _normalize_input(joint_img[:, :2], input_shape)
    mesh_dev, pose3d = model.apply(
        variables, art, jnp.asarray(norm)[None], False
    )
    mesh = np.asarray(extract_mesh(art, mesh_dev))[0]  # (V, 3) meters
    joints3d = regressor @ mesh                         # (J, 3) meters
    root = joints3d[:1]
    mesh = mesh - root
    joints3d = joints3d - root

    # square 1.25x crop for the camera fit (demo/run.py:150-153)
    bbox1 = process_bbox(get_bbox(joint_img), aspect_ratio=1.0, scale=1.25)
    target, trans = aug.j2d_processing(
        joint_img.copy(), (CROP_SIZE, CROP_SIZE), bbox1, 0, 0, None
    )
    cam = np.asarray(fit_camera(
        jnp.asarray(joints3d), jnp.asarray(target[:, :2].astype(np.float32)),
        num_steps=cam_steps, img_res=CROP_SIZE,
    ))
    return mesh, joints3d, cam, bbox1


def _nms_people(dets, joint_thr=0.1, box_iou_thr=0.6):
    """Confidence filter + manual box NMS over detections
    (demo/run.py:277-306)."""
    people = []
    for d in dets:
        kp = np.array(d["keypoints"], np.float32).reshape(-1, 3)
        if kp[:, 2].mean() < joint_thr:
            continue
        people.append(kp)
    kept = []
    for kp in sorted(people, key=lambda k: -k[:, 2].mean()):
        x0, y0 = kp[:, 0].min(), kp[:, 1].min()
        x1, y1 = kp[:, 0].max(), kp[:, 1].max()
        dup = False
        for other in kept:
            ox0, oy0 = other[:, 0].min(), other[:, 1].min()
            ox1, oy1 = other[:, 0].max(), other[:, 1].max()
            ix = max(0, min(x1, ox1) - max(x0, ox0))
            iy = max(0, min(y1, oy1) - max(y0, oy0))
            inter = ix * iy
            union = ((x1 - x0) * (y1 - y0) + (ox1 - ox0) * (oy1 - oy0)
                     - inter + 1e-9)
            if inter / union > box_iou_thr:
                dup = True
                break
        if not dup:
            kept.append(kp)
    return kept


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from ..config import default_config
    from ..core.checkpoint import load_checkpoint
    from ..data.base import pyramid_for
    from ..models.pose2mesh import Pose2Mesh
    from ..utils.io import save_obj
    from ..utils.renderer import render_mesh_overlay
    from ..utils.vis import vis_2d_pose

    cfg = default_config()
    os.makedirs(args.out_dir, exist_ok=True)
    mesh_model, js, levels, regressor = _setting(args.joint_set)
    art = pyramid_for(np.asarray(mesh_model.face), js, levels)
    model = Pose2Mesh(num_joint=js.joint_num, mano=args.joint_set == "mano")

    if args.weights:
        raw = load_checkpoint(args.weights, pick_best=True)["state"]
        variables = {"params": raw["params"],
                     "batch_stats": raw.get("batch_stats", {})}
    else:
        print("WARNING: no --weights given; using random init (shapes demo)")
        variables = model.init(
            jax.random.PRNGKey(0), art,
            jnp.zeros((1, js.joint_num, 2)), False,
        )

    img = None
    if args.input_img and osp.exists(args.input_img):
        import matplotlib.image as mpimg
        img = (np.asarray(mpimg.imread(args.input_img))[..., :3])
        if img.max() <= 1.0:
            img = (img * 255).astype(np.uint8)

    if args.input_pose.endswith(".json"):
        with open(args.input_pose) as f:
            people = _nms_people(json.load(f))
    else:
        people = [np.load(args.input_pose).astype(np.float32)]

    for i, kp in enumerate(people):
        kp = np.asarray(kp, np.float32)
        if kp.shape[1] == 2:
            kp = np.concatenate([kp, np.ones((len(kp), 1), np.float32)], 1)
        if args.joint_set == "coco" and len(kp) == 17:
            pelvis = 0.5 * (kp[11] + kp[12])
            neck = 0.5 * (kp[5] + kp[6])
            kp = np.concatenate([kp, pelvis[None], neck[None]])
        mesh, joints3d, cam, fit_bbox = run_person(
            model, variables, art, kp, regressor,
            cfg.MODEL.input_shape, args.cam_steps,
        )
        save_obj(mesh, np.asarray(mesh_model.face),
                 osp.join(args.out_dir, f"person_{i}.obj"))
        vis_2d_pose(kp, img if img is not None else (1000, 1000),
                    js.skeleton,
                    out_path=osp.join(args.out_dir, f"person_{i}_pose2d.png"))
        if img is not None:
            # crop cam -> original-image pixel params, overlay on the input
            # photo (demo/run.py:24-43 + render at :241)
            from ..models.camera import crop_cam_to_orig_params
            canvas = img if i == 0 else canvas  # accumulate multi-person
            over = render_mesh_overlay(
                canvas, mesh, np.asarray(mesh_model.face),
                np.asarray(crop_cam_to_orig_params(cam, fit_bbox)),
            )
            canvas = over
            import matplotlib.image as mpimg
            mpimg.imsave(osp.join(args.out_dir, f"person_{i}_overlay.png"),
                         over.astype(np.uint8))
        print(f"person {i}: mesh -> person_{i}.obj (cam s={cam[0]:.2f})")
    print(f"demo outputs in {args.out_dir}")


if __name__ == "__main__":
    main()
