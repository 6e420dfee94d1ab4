"""Vertex-axis scaling harness: halo-exchange graph parallelism over an
N-device mesh.

Measures, at graph_axis = 1..8:
  * the raw banded halo hop (edges/s),
  * the FULL jitted train step with the halo-enabled model,
and audits the collective schedule of the compiled step (collective-permute
= explicit halo; all-gather on band activations would mean GSPMD fell back
to replication — the "no implicit all-gather" proof, VERDICT r1 #5).

On real multi-chip hardware this measures edges/s scaling over ICI
(BASELINE north star: >=80% scaling to 2 hosts).  Without a multi-chip
slice it runs on N virtual CPU devices and reports relative scaling of
wall-clock per hop — CPU numbers validate the schedule and the trend, they
are NOT TPU projections.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/bench_scaling.py
Emits one JSON line per configuration (machine-readable).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pose2mesh_release_tpu.body.smpl import SMPL
from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
from pose2mesh_release_tpu.graphs.build import build_pyramid
from pose2mesh_release_tpu.parallel.halo import halo_banded_hop

H36M_SKELETON = (
    (0, 7), (7, 8), (8, 9), (9, 10), (8, 11), (11, 12), (12, 13),
    (8, 14), (14, 15), (15, 16), (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6),
)


def bench_hop(art, devices, batch: int, feat: int):
    """Raw halo hop scaling on the finest band level."""
    op = art.mesh_ops[0]
    edges = op.nnz
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((op.num_vertices, batch, feat)),
                    jnp.float32)
    results = {}
    for n in (1, 2, 4, 8):
        if n > len(devices):
            break
        mesh = Mesh(np.array(devices[:n]).reshape(1, n), ("data", "graph"))

        @jax.jit
        def run(x_):
            def body(c, _):
                return halo_banded_hop(op, c, mesh) * 0.5 + c * 0.5, ()
            c, _ = jax.lax.scan(body, x_, None, length=16)
            return c

        jax.block_until_ready(run(x))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x))
            best = min(best, (time.perf_counter() - t0) / 16)
        results[n] = best
        print(json.dumps({
            "bench": "halo_hop", "graph_axis": n,
            "ms_per_hop": round(best * 1e3, 3),
            "edge_features_per_sec": round(edges * batch * feat / best),
            "scaling_pct": round(results[1] / best / n * 100)
            if n > 1 else 100,
            "platform": jax.default_backend(),
        }))
    return results


def bench_train_step(art, model_blocks, devices, joint_num: int):
    """Full halo-enabled train step scaling + collective audit."""
    from pose2mesh_release_tpu.core.optim import make_preconditioner
    from pose2mesh_release_tpu.core.train import TrainState, make_train_step
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh
    from pose2mesh_release_tpu.parallel.sharding import (
        shard_artifact, shard_batch, shard_state,
    )

    rng = np.random.default_rng(0)
    V, J = art.num_vertices, art.joint_num
    results = {}
    for n in (1, 2, 4, 8):
        if n > len(devices):
            break
        mesh = Mesh(np.array(devices[:n]).reshape(1, n), ("data", "graph"))
        model = Pose2Mesh(num_joint=joint_num, blocks=model_blocks,
                          spmd_mesh=mesh if n > 1 else None)
        B = 8
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
        tx = make_preconditioner("sgd")
        state = shard_state(mesh, TrainState.create(variables, tx))
        art_s = shard_artifact(mesh, art)
        batch_s = shard_batch(mesh, batch)
        step = jax.jit(make_train_step(model, tx, j_reg))
        args = (state, art_s, batch_s, jnp.float32(1e-3), jnp.bool_(True),
                jax.random.PRNGKey(1))

        hlo = step.lower(*args).compile().as_text()
        n_cp = hlo.count("collective-permute(")
        n_ag = hlo.count("all-gather(")

        s, _ = step(*args)
        jax.block_until_ready(s.params)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s2, losses = step(*args)
            jax.block_until_ready(s2.params)
            best = min(best, time.perf_counter() - t0)
        results[n] = best
        print(json.dumps({
            "bench": "train_step", "graph_axis": n,
            "ms_per_step": round(best * 1e3, 2),
            "collective_permute_ops": n_cp,
            "all_gather_ops": n_ag,
            "scaling_pct": round(results[1] / best / n * 100)
            if n > 1 else 100,
            "platform": jax.default_backend(),
        }))
    return results


def main(batch: int = 16, feat: int = 128):
    smpl = SMPL()
    pyr = build_pyramid(smpl.face, joint_num=17, skeleton=H36M_SKELETON,
                        levels=9)
    art = pack_pyramid(pyr, smpl.face)
    devices = jax.devices()
    bench_hop(art, devices, batch, feat)

    # smaller config for the full-step sweep (compile cost on CPU)
    from __graft_entry__ import _build_small

    small_art, small_model = _build_small()
    bench_train_step(small_art, small_model.blocks, devices,
                     small_art.joint_num)


if __name__ == "__main__":
    main()
