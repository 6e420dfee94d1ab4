"""Training-dynamics demo (VERDICT r3 item #1): run the FULL-SIZE SMPL
cascade's train step on the live chip for N steps at the REFERENCE RECIPE
(rmsprop, lr 1e-3, edge loss on — asset/yaml/pose2mesh_human36J_train_human36.yml,
lib/core/base.py:134-148) and record the loss trajectory — evidence that the
training path (forward + 5 losses + grads + rmsprop) optimizes without NaN,
not just compiles.

Writes one JSON line {"steps", "lr", "optimizer", "loss_first", "loss_last",
"vertex_first", "vertex_last", "decreased", "any_nan", "loss_curve"};
committed as TRAINING_r4.json.
"""
from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_p2m"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H36M_SKELETON = (
    (0, 7), (7, 8), (8, 9), (9, 10), (8, 11), (11, 12), (12, 13),
    (8, 14), (14, 15), (15, 16), (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6),
)
H36M_FLIP_PAIRS = ((1, 4), (2, 5), (3, 6), (14, 11), (15, 12), (16, 13))


def main(steps=60, batch=64):
    from pose2mesh_release_tpu.body.smpl import SMPL
    from pose2mesh_release_tpu.core.optim import make_preconditioner
    from pose2mesh_release_tpu.core.train import TrainState, make_train_step
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh

    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        smpl = SMPL()
        pyr = build_pyramid(smpl.face, joint_num=17, skeleton=H36M_SKELETON,
                            flip_pairs=H36M_FLIP_PAIRS, levels=9)
        art = pack_pyramid(pyr, smpl.face)
        model = Pose2Mesh(num_joint=17, dtype=jnp.bfloat16)
        V, J = art.num_vertices, art.joint_num
        # geometrically plausible targets: template mesh + per-sample noise
        # (pure-noise target meshes have degenerate triangles whose normal
        # loss gradients NaN through the normalize; real data never does)
        v_t = np.asarray(smpl.layer().v_template, np.float32)
        mesh_gt = v_t[None] + rng.standard_normal(
            (batch, V, 3)).astype(np.float32) * 0.005
        j_reg = jnp.asarray(rng.random((J, V)), jnp.float32)
        j_reg = j_reg / j_reg.sum(axis=1, keepdims=True)
        pose_gt = np.einsum("jv,bvc->bjc", np.asarray(j_reg),
                            mesh_gt) * 1000.0  # mm
        batch_d = {
            "pose2d": jnp.asarray(pose_gt[..., :2] / 500.0, jnp.float32),
            "mesh": jnp.asarray(mesh_gt),
            "mesh_valid": jnp.ones((batch, V, 3), jnp.float32),
            "reg_pose3d": jnp.asarray(pose_gt, jnp.float32),
            "reg_pose3d_valid": jnp.ones((batch, J, 3), jnp.float32),
            "lift_pose3d": jnp.asarray(pose_gt, jnp.float32),
            "lift_pose3d_valid": jnp.ones((batch, J, 3), jnp.float32),
        }
        init_model = Pose2Mesh(num_joint=17, dtype=jnp.bfloat16,
                               use_pallas=False)
        variables = jax.jit(init_model.init, static_argnums=(3,))(
            jax.random.PRNGKey(0), art, batch_d["pose2d"], False)
        tx = make_preconditioner("rmsprop")
        state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx, j_reg)
    dev = jax.devices()[0]
    state, art, batch_d = jax.device_put((state, art, batch_d), dev)

    # chunk steps inside jitted scans (eager per-step dispatch through the
    # relay costs ~1 s each); collect per-chunk mean losses
    chunk = 10

    lr = float(os.environ.get("P2M_DEMO_LR", "1e-3"))  # reference recipe

    @jax.jit
    def run_chunk(s, a, bd):
        def body(c, _):
            s2, losses = train_step(c, a, bd, jnp.float32(lr),
                                    jnp.bool_(True), jax.random.PRNGKey(1))
            return s2, (losses["total"], losses["vertex"])
        s2, (tot, vert) = jax.lax.scan(body, s, None, length=chunk)
        return s2, tot.astype(jnp.float32), vert.astype(jnp.float32)

    totals, verts = [], []
    for _ in range(steps // chunk):
        state, tot, vert = run_chunk(state, art, batch_d)
        totals.append(np.asarray(tot))
        verts.append(np.asarray(vert))
        print(f"# step {len(totals)*chunk:4d}: total {totals[-1][-1]:.4f} "
              f"vertex {verts[-1][-1]:.4f}", file=sys.stderr, flush=True)
    totals = np.concatenate(totals)
    verts = np.concatenate(verts)
    out = {
        "steps": int(len(totals)), "batch": batch,
        "optimizer": "rmsprop", "lr": lr, "edge_loss": True,
        "loss_first": float(totals[0]), "loss_last": float(totals[-1]),
        "vertex_first": float(verts[0]), "vertex_last": float(verts[-1]),
        "any_nan": bool(~np.isfinite(totals).all() | ~np.isfinite(verts).all()),
        "decreased": bool(totals[-1] < totals[0]
                          and verts[-1] < verts[0]),
        "loss_curve": [round(float(t), 4) for t in totals[::10]],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
