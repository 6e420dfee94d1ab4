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

from _flagship import lowered_step_hlo
from __graft_entry__ import _build_flagship
from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh
from pose2mesh_release_tpu.parallel.mesh import make_mesh

devices = jax.devices("cpu")[:8]
mesh = make_mesh(devices, graph_axis=2)
art, model = _build_flagship()
model = Pose2Mesh(num_joint=model.num_joint, dtype=jnp.bfloat16,
                  spmd_mesh=mesh)
hlo = lowered_step_hlo(art, model, mesh, B=8)[0].as_text()
rows = []
for line in hlo.splitlines():
    if "all-gather(" in line and "=" in line:
        m = re.search(r'metadata={op_name="([^"]*)"', line)
        shape = line.split("=", 1)[1].strip().split(" ")[0]
        rows.append(shape + " | " + (m.group(1)[:120] if m else "?"))
for k, c in Counter(rows).most_common(30):
    print(c, k, flush=True)
