"""Secondary benchmark configs (VERDICT r2 task 6): MANO/FreiHAND inference
and SMPL train-step throughput, alongside bench.py's primary SMPL inference.

Prints ONE JSON line {"mano_infer": {...}, "smpl_train": {...}}; the round's
committed artifact is BENCH_configs_r{N}.json.

Reference configs (BASELINE.json "configs"):
  mano_infer — the FreiHAND cascade (MANO 778-vertex template, 6-level
      pyramid, 21 joints; /root/reference/data/FreiHAND/dataset.py:48-49),
      batch 64 inference.
  smpl_train — one optimizer step (forward + losses + grads + rmsprop) of
      the Human36 SMPL config at the reference's batch 64
      (asset/yaml/pose2mesh_human36J_train_human36.yml).
Timing methodology identical to bench.py (lax.scan chaining, small/large
differencing, min over repeats — see its module docstring for why).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

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


def _time_scan(apply_fn, carry0, consts=(), small=2, large=22):
    """`consts` are passed as jit ARGUMENTS, not closures — closure arrays
    get baked into the HLO as constants and blow the relay's request-size
    limit (HTTP 413) for artifact-sized programs."""
    @functools.partial(jax.jit, static_argnums=0)
    def loop(n, c0, *cs):
        def body(c, _):
            return apply_fn(c, *cs), ()
        c, _ = jax.lax.scan(body, c0, None, length=n)
        # one concrete scalar: float() forces the fetch (block_until_ready
        # does not reliably block through the relay, see bench.py notes).
        # Probe the FIRST leaf — for a TrainState that is a parameter
        # (updating it needs the whole fwd+bwd+optimizer chain); the last
        # leaf is the step counter, which XLA computes as s0.step + n and
        # dead-code-eliminates everything else.
        return jax.tree.leaves(c)[0].astype(jnp.float32).mean()

    float(loop(small, carry0, *consts))
    float(loop(large, carry0, *consts))
    ts, tl = [], []
    for _ in range(3):
        t0 = time.time(); float(loop(small, carry0, *consts)); ts.append(time.time() - t0)
        t0 = time.time(); float(loop(large, carry0, *consts)); tl.append(time.time() - t0)
    return max(min(tl) - min(ts), 1e-9) / (large - small)


def bench_mano_infer(batch=64):
    from pose2mesh_release_tpu.body.mano import MANO
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.models.fold import fold_bn_variables
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mano = MANO()
        pyr = build_pyramid(mano.face, joint_num=mano.joint_num,
                            skeleton=mano.skeleton, levels=6)
        art = pack_pyramid(pyr, mano.face)
        model = Pose2Mesh(num_joint=mano.joint_num, mano=True,
                          dtype=jnp.bfloat16)
        pose2d = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, mano.joint_num, 2)), jnp.float32)
        variables = jax.jit(model.init, static_argnums=(3,))(
            jax.random.PRNGKey(0), art, pose2d, False)
        model = Pose2Mesh(num_joint=mano.joint_num, mano=True,
                          dtype=jnp.bfloat16, inference_fused=True)
        variables = fold_bn_variables(variables)
    dev = jax.devices()[0]
    art, variables, pose2d = jax.device_put((art, variables, pose2d), dev)

    def step(p, v, a):
        mesh, pose3d = model.apply(v, a, p, False)
        return p + mesh.mean() * 1e-30 + pose3d.mean() * 1e-30

    dt = _time_scan(step, pose2d, consts=(variables, art))
    return {"value": round(batch / dt, 1), "unit": "meshes/s",
            "ms_per_batch": round(dt * 1e3, 3), "batch": batch,
            "levels": list(art.level_sizes)}


def bench_smpl_train(batch=64):
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
        batch_d = {
            "pose2d": jnp.asarray(rng.standard_normal((batch, J, 2)),
                                  jnp.float32),
            "mesh": jnp.asarray(rng.standard_normal((batch, V, 3)) * 0.1,
                                jnp.float32),
            "mesh_valid": jnp.ones((batch, V, 3), jnp.float32),
            "reg_pose3d": jnp.asarray(
                rng.standard_normal((batch, J, 3)) * 100, jnp.float32),
            "reg_pose3d_valid": jnp.ones((batch, J, 3), jnp.float32),
            "lift_pose3d": jnp.asarray(
                rng.standard_normal((batch, J, 3)) * 100, jnp.float32),
            "lift_pose3d_valid": jnp.ones((batch, J, 3), jnp.float32),
        }
        j_reg = jnp.asarray(rng.random((J, V)), jnp.float32)
        j_reg = j_reg / j_reg.sum(axis=1, keepdims=True)
        # init through the XLA path: params are layout-independent and the
        # CPU-side init must not lower real Pallas kernels
        init_model = Pose2Mesh(num_joint=17, dtype=jnp.bfloat16,
                               use_pallas=False)
        variables = jax.jit(init_model.init, static_argnums=(3,))(
            jax.random.PRNGKey(0), art, batch_d["pose2d"], False)
        tx = make_preconditioner("rmsprop")
        state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx, j_reg)
    dev = jax.devices()[0]
    state, art, batch_d = jax.device_put((state, art, batch_d), dev)

    def step(s, a, bd):
        s2, _losses = train_step(s, a, bd, jnp.float32(1e-3),
                                 jnp.bool_(True), jax.random.PRNGKey(1))
        return s2

    dt = _time_scan(step, state, consts=(art, batch_d), small=2, large=10)
    return {"value": round(batch / dt, 1), "unit": "samples/s",
            "ms_per_step": round(dt * 1e3, 3), "batch": batch}


def bench_mano_train(batch=64):
    """One rmsprop step of the FreiHAND/MANO cascade (VERDICT r4 item #6).

    Which kernels the MANO pyramid actually hits: the 6-level 778-vertex
    pyramid packs ONE band level (V=778 -> 8 row-tiles at T=128, band_k=1)
    — the rest are dense (<= the 768 threshold) — so the fused forward +
    fully fused backward Pallas kernels run only on the finest level's
    three convs and the m=8 single-program-group regime; everything
    coarser is XLA dense matmuls.
    Reference config: asset/yaml/pose2mesh_manoJ_train_freihand.yml."""
    from pose2mesh_release_tpu.body.mano import MANO
    from pose2mesh_release_tpu.core.optim import make_preconditioner
    from pose2mesh_release_tpu.core.train import TrainState, make_train_step
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh

    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mano = MANO()
        pyr = build_pyramid(mano.face, joint_num=mano.joint_num,
                            skeleton=mano.skeleton, levels=6)
        art = pack_pyramid(pyr, mano.face)
        model = Pose2Mesh(num_joint=mano.joint_num, mano=True,
                          dtype=jnp.bfloat16)
        V, J = art.num_vertices, art.joint_num
        batch_d = {
            "pose2d": jnp.asarray(rng.standard_normal((batch, J, 2)),
                                  jnp.float32),
            "mesh": jnp.asarray(rng.standard_normal((batch, V, 3)) * 0.1,
                                jnp.float32),
            "mesh_valid": jnp.ones((batch, V, 3), jnp.float32),
            "reg_pose3d": jnp.asarray(
                rng.standard_normal((batch, J, 3)) * 100, jnp.float32),
            "reg_pose3d_valid": jnp.ones((batch, J, 3), jnp.float32),
            "lift_pose3d": jnp.asarray(
                rng.standard_normal((batch, J, 3)) * 100, jnp.float32),
            "lift_pose3d_valid": jnp.ones((batch, J, 3), jnp.float32),
        }
        j_reg = jnp.asarray(rng.random((J, V)), jnp.float32)
        j_reg = j_reg / j_reg.sum(axis=1, keepdims=True)
        init_model = Pose2Mesh(num_joint=mano.joint_num, mano=True,
                               dtype=jnp.bfloat16, use_pallas=False)
        variables = jax.jit(init_model.init, static_argnums=(3,))(
            jax.random.PRNGKey(0), art, batch_d["pose2d"], False)
        tx = make_preconditioner("rmsprop")
        state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx, j_reg)
    dev = jax.devices()[0]
    state, art, batch_d = jax.device_put((state, art, batch_d), dev)

    def step(s, a, bd):
        s2, _losses = train_step(s, a, bd, jnp.float32(1e-3),
                                 jnp.bool_(True), jax.random.PRNGKey(1))
        return s2

    dt = _time_scan(step, state, consts=(art, batch_d), small=2, large=10)
    band = [op for op in art.mesh_ops if op.kind == "band"]
    return {"value": round(batch / dt, 1), "unit": "samples/s",
            "ms_per_step": round(dt * 1e3, 3), "batch": batch,
            "levels": list(art.level_sizes),
            "band_levels": [int(op.num_vertices) for op in band],
            "band_tiles": [int(op.band_val.shape[1]) for op in band]}


def main():
    out = {}
    which = sys.argv[1:] or ["mano_infer", "smpl_train", "mano_train"]
    for name in which:
        t0 = time.time()
        out[name] = {"mano_infer": bench_mano_infer,
                     "smpl_train": bench_smpl_train,
                     "mano_train": bench_mano_train}[name]()
        print(f"# {name}: {out[name]} ({time.time()-t0:.0f}s)",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
