"""Debug helper: print all-gather shapes + op metadata for the flagship
sharded train step (the dryrun_multichip(8) configuration)."""
import re
from collections import Counter

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_p2m")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from __graft_entry__ import _build_flagship
from pose2mesh_release_tpu.core.optim import make_preconditioner
from pose2mesh_release_tpu.core.train import TrainState, make_train_step
from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh
from pose2mesh_release_tpu.parallel.mesh import make_mesh
from pose2mesh_release_tpu.parallel.sharding import (
    shard_artifact, shard_batch, shard_state,
)

devices = jax.devices("cpu")[:8]
mesh = make_mesh(devices, graph_axis=2)
art, model = _build_flagship()
model = Pose2Mesh(num_joint=model.num_joint, dtype=jnp.bfloat16,
                  spmd_mesh=mesh)
B = 8
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
args = (shard_state(mesh, state), shard_artifact(mesh, art),
        shard_batch(mesh, batch), jnp.float32(1e-3), jnp.bool_(True),
        jax.random.PRNGKey(1))
step = jax.jit(make_train_step(model, tx, j_reg))
hlo = step.lower(*args).compile().as_text()
rows = []
for line in hlo.splitlines():
    if "all-gather(" in line and "=" in line:
        m = re.search(r'metadata={op_name="([^"]*)"', line)
        shape = line.split("=", 1)[1].strip().split(" ")[0]
        rows.append(shape + " | " + (m.group(1)[:120] if m else "?"))
for k, c in Counter(rows).most_common(30):
    print(c, k, flush=True)
