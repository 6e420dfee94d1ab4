"""Shared construction for benchmarks that compile the sharded train step.

Five benchmark/audit scripts used to carry near-identical copies of the
synthetic batch dict + regressor + shard/lower/compile boilerplate; a
batch-contract change (e.g. round 5's per-sample broadcast `mesh_valid`)
then had to be found in every copy or an audit silently compiled a stale
program.  This module is the single source of truth.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def make_batch(V: int, J: int, B: int, seed: int = 0):
    """Synthetic training batch in the PRODUCTION contract (data/base.py):
    per-sample broadcast mesh_valid, per-joint 3-vector joint valids."""
    rng = np.random.default_rng(seed)
    return {
        "pose2d": jnp.asarray(rng.standard_normal((B, J, 2)), jnp.float32),
        "mesh": jnp.asarray(rng.standard_normal((B, V, 3)) * 0.1,
                            jnp.float32),
        "mesh_valid": jnp.ones((B, 1, 1), jnp.float32),
        "reg_pose3d": jnp.asarray(rng.standard_normal((B, J, 3)) * 100,
                                  jnp.float32),
        "reg_pose3d_valid": jnp.ones((B, J, 3), jnp.float32),
        "lift_pose3d": jnp.asarray(rng.standard_normal((B, J, 3)) * 100,
                                   jnp.float32),
        "lift_pose3d_valid": jnp.ones((B, J, 3), jnp.float32),
    }


def make_j_regressor(J: int, V: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    j = jnp.asarray(rng.random((J, V)), jnp.float32)
    return j / j.sum(axis=1, keepdims=True)


def lowered_step_hlo(art, model, mesh, B: int, optimizer: str = "rmsprop"):
    """Init + shard + lower + compile the train step on `mesh`; returns
    (hlo_text, n_params)."""
    from pose2mesh_release_tpu.core.optim import make_preconditioner
    from pose2mesh_release_tpu.core.train import TrainState, make_train_step
    from pose2mesh_release_tpu.parallel.sharding import (
        shard_artifact, shard_batch, shard_state,
    )

    batch = make_batch(art.num_vertices, art.joint_num, B)
    j_reg = make_j_regressor(art.joint_num, art.num_vertices)
    variables = model.init(jax.random.PRNGKey(0), art, batch["pose2d"], False)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(variables["params"]))
    tx = make_preconditioner(optimizer)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, tx, j_reg))
    compiled = step.lower(
        shard_state(mesh, state), shard_artifact(mesh, art),
        shard_batch(mesh, batch), jnp.float32(1e-3), jnp.bool_(True),
        jax.random.PRNGKey(1)).compile()
    return compiled, n_params
