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
    from _flagship import lowered_step_hlo
    from __graft_entry__ import _build_small
    from pose2mesh_release_tpu.models.pose2mesh import Pose2Mesh
    from pose2mesh_release_tpu.parallel.audit import all_gather_sizes
    from pose2mesh_release_tpu.parallel.mesh import make_mesh

    devices = jax.devices("cpu")[:8]
    mesh = make_mesh(devices, graph_axis=graph_axis)
    art, model = _build_small()
    model = Pose2Mesh(num_joint=model.num_joint, blocks=model.blocks,
                      spmd_mesh=mesh)
    B = max(2 * (8 // graph_axis), 2)
    t0 = time.time()
    compiled, _ = lowered_step_hlo(art, model, mesh, B)
    hlo = compiled.as_text()
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
