"""Vertex-axis scaling harness: halo-exchange hop over an N-device mesh.

On real multi-chip hardware this measures edges/s scaling over ICI
(BASELINE north star: >=80% scaling to 2 hosts).  Without a multi-chip
slice it runs on N virtual CPU devices (xla_force_host_platform_device
_count) and validates the collective schedule + reports relative scaling
of wall-clock per hop (CPU numbers are NOT TPU projections).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/bench_scaling.py
"""
from __future__ import annotations

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


def main(batch: int = 16, feat: int = 128):
    smpl = SMPL()
    pyr = build_pyramid(smpl.face, joint_num=17, skeleton=H36M_SKELETON,
                        levels=9)
    art = pack_pyramid(pyr, smpl.face)
    op = art.mesh_ops[0]  # V = 7680 finest level
    edges = op.nnz
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((op.num_vertices, batch, feat)),
                    jnp.float32)

    devices = jax.devices()
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
        eps = edges * batch * feat / best
        print(f"graph_axis={n}: {best*1e3:.2f} ms/hop, "
              f"{eps/1e9:.2f} G edge-features/s"
              + (f", scaling {results[1]/best/n*100:.0f}%" if n > 1 else ""))


if __name__ == "__main__":
    main()
