"""Collective-schedule audit over graph-axis sizes (VERDICT r3 item #5).

Compiles the sharded train step (small config, 8 virtual CPU devices) at
graph_axis = 2 / 4 / 8 and reports, per config: all-gather count + result
sizes, collective-permute count, all-reduce count.  The expectation after
the round-4 sharding constraints (models/meshnet.py block-entry pins):

  * band levels: ZERO activation all-gathers — hops ride the shard_map +
    ppermute halo path, V-sharded end to end;
  * dense/joint levels: V replicated, so exactly ONE gather per
    band->dense boundary crossing per direction (fwd + bwd), not one per
    conv per hop (the round-3 creep);
  * gradient psums on 'data' appear as all-reduces.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python benchmarks/audit_collectives.py
Prints one JSON line; committed as COLLECTIVES_r{N}.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def audit(graph_axis: int) -> dict:
    from __graft_entry__ import _build_small
    from pose2mesh_release_tpu.core.optim import make_preconditioner
    from pose2mesh_release_tpu.core.train import TrainState, make_train_step
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh
    from pose2mesh_release_tpu.parallel.audit import all_gather_sizes
    from pose2mesh_release_tpu.parallel.mesh import make_mesh
    from pose2mesh_release_tpu.parallel.sharding import (
        shard_artifact, shard_batch, shard_state,
    )

    devices = jax.devices("cpu")[:8]
    mesh = make_mesh(devices, graph_axis=graph_axis)
    art, model = _build_small()
    model = Pose2Mesh(num_joint=model.num_joint, blocks=model.blocks,
                      spmd_mesh=mesh)
    B = max(2 * (8 // graph_axis), 2)
    rng = np.random.default_rng(0)
    V, J = art.num_vertices, art.joint_num
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
    tx = make_preconditioner("rmsprop")
    state = TrainState.create(variables, tx)
    art_s = shard_artifact(mesh, art)
    batch_s = shard_batch(mesh, batch)
    state_s = shard_state(mesh, state)
    step = jax.jit(make_train_step(model, tx, j_reg))
    t0 = time.time()
    hlo = step.lower(state_s, art_s, batch_s, jnp.float32(1e-3),
                     jnp.bool_(True), jax.random.PRNGKey(1)).compile().as_text()
    ag = all_gather_sizes(hlo)
    row = {
        "graph_axis": graph_axis, "batch": B,
        "all_gathers": len(ag),
        "all_gather_sizes": sorted(ag)[-6:],
        "collective_permutes": hlo.count("collective-permute("),
        "all_reduces": hlo.count(" all-reduce("),
        "compile_s": round(time.time() - t0, 1),
    }
    print(f"# {row}", file=sys.stderr, flush=True)
    return row


def main():
    rows = [audit(ga) for ga in (2, 4, 8)]
    print(json.dumps({"results": rows}))


if __name__ == "__main__":
    main()
