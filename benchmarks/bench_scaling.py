"""Vertex-axis scaling harness: halo-exchange graph parallelism over an
N-device mesh.

Measures, at graph_axis = 1..8:
  * the raw banded halo hop (edges/s),
  * the FULL jitted train step with the halo-enabled model,
and audits the collective schedule of the compiled step:
  * collective-permute present (the explicit halo), AND
  * NO all-gather at band-activation size (parallel.audit parses result
    shapes — presence-only checks can't prove the negative, VERDICT r2 #3).

On real multi-chip hardware this measures edges/s scaling over ICI
(BASELINE north star: >=80% scaling to 2 hosts).  Without a multi-chip
slice it runs on N virtual CPU devices and reports relative scaling of
wall-clock per hop — CPU numbers validate the schedule and the trend, they
are NOT TPU projections.

Budget: the default configuration is sized for the 8-device CPU mesh
(small pyramid, few columns, short scan) and completes in ~2 minutes.
Set P2M_SCALING_FULL=1 for the SMPL-size hop sweep on real hardware.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/bench_scaling.py [out.json]
Emits one JSON line per configuration and writes them all to out.json
(default SCALING.json next to this file's repo root).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

if os.environ.get("P2M_SCALING_FULL", "0") != "1":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("P2M_SCALING_FULL", "0") != "1":
    # the container's TPU plugin wins default-platform selection even under
    # JAX_PLATFORMS=cpu; force the local CPU mesh in-code (same mechanism
    # as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh

from pose2mesh_release_tpu.parallel.audit import (
    all_gather_sizes, assert_no_large_all_gather,
)
from pose2mesh_release_tpu.parallel.halo import halo_banded_hop

RESULTS: list = []


def emit(rec: dict) -> None:
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)


def bench_hop(art, devices, batch: int, feat: int, scan_len: int):
    """Raw halo hop scaling on the finest band level."""
    op = art.mesh_ops[0]
    assert op.kind == "band", op.kind
    edges = op.nnz
    rng = np.random.default_rng(0)
    # pre-pad rows to the packed tile count: divisible by every graph-axis
    # size, so the V dim shards evenly (padded rows multiply all-zero band
    # blocks; results on real rows are unchanged)
    Vp = op.band_val.shape[1] * op.block_size
    x = np.zeros((Vp, batch, feat), np.float32)
    x[:op.num_vertices] = rng.standard_normal((op.num_vertices, batch, feat))
    x = jnp.asarray(x)
    results = {}
    for n in (1, 2, 4, 8):
        if n > len(devices):
            break
        mesh = Mesh(np.array(devices[:n]).reshape(1, n), ("data", "graph"))
        # keep the scan carry V-sharded so iterations chain shard-to-shard
        # (a replicated carry would force a boundary all-gather per hop that
        # the real model, whose activations stay sharded, never pays)
        from jax.sharding import NamedSharding, PartitionSpec as P
        vsh = NamedSharding(mesh, P("graph"))
        x_in = jax.device_put(x, vsh)

        @functools.partial(jax.jit, out_shardings=vsh)
        def run(x_):
            def body(c, _):
                return halo_banded_hop(op, c, mesh) * 0.5 + c * 0.5, ()
            c, _ = jax.lax.scan(body, x_, None, length=scan_len)
            return c

        if n > 1:
            # strict audit on the raw hop: halo == collective-permute ONLY,
            # zero all-gather of any size
            hlo = run.lower(x_in).compile().as_text()
            assert "collective-permute" in hlo
            assert_no_large_all_gather(hlo, 1, context=f"halo_hop n={n}")

        jax.block_until_ready(run(x_in))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x_in))
            best = min(best, (time.perf_counter() - t0) / scan_len)
        results[n] = best
        emit({
            "bench": "halo_hop", "graph_axis": n,
            "V": int(op.num_vertices), "batch": batch, "feat": feat,
            "ms_per_hop": round(best * 1e3, 3),
            "edge_features_per_sec": round(edges * batch * feat / best),
            "scaling_pct": round(results[1] / best / n * 100)
            if n > 1 else 100,
            "platform": jax.default_backend(),
        })
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
    # Audit threshold: a finest-band-level conv activation
    # (V_finest * B * fin_finest).  Intra-level hops must halo-exchange, so
    # no all-gather may reach this size.  Smaller gathers are expected and
    # bounded: the inter-level upsample reshards the COARSE level (<= V/2
    # rows) and the final vertex un-permute gathers the (V, B, 3) output.
    band_vmax = max(op.num_vertices for op in art.mesh_ops
                    if op.kind == "band")
    fin_finest = model_blocks[-1][0]
    B = 8
    ag_threshold = band_vmax * B * fin_finest
    results = {}
    for n in (1, 2, 4, 8):
        if n > len(devices):
            break
        mesh = Mesh(np.array(devices[:n]).reshape(1, n), ("data", "graph"))
        model = Pose2Mesh(num_joint=joint_num, blocks=model_blocks,
                          spmd_mesh=mesh if n > 1 else None)
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
        ag_sizes = all_gather_sizes(hlo)
        if n > 1:
            assert n_cp > 0, "halo path must emit collective-permute"
            assert_no_large_all_gather(hlo, ag_threshold,
                                       context=f"train_step graph_axis={n}")

        s, _ = step(*args)
        jax.block_until_ready(s.params)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s2, losses = step(*args)
            jax.block_until_ready(s2.params)
            best = min(best, time.perf_counter() - t0)
        results[n] = best
        emit({
            "bench": "train_step", "graph_axis": n,
            "ms_per_step": round(best * 1e3, 2),
            "collective_permute_ops": n_cp,
            "all_gather_ops": len(ag_sizes),
            "max_all_gather_elems": max(ag_sizes) if ag_sizes else 0,
            "band_activation_threshold_elems": ag_threshold,
            "audit": "pass" if n == 1 else "pass-no-band-all-gather",
            "scaling_pct": round(results[1] / best / n * 100)
            if n > 1 else 100,
            "platform": jax.default_backend(),
        })
    return results


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "SCALING.json")
    devices = jax.devices()
    from __graft_entry__ import _build_small

    small_art, small_model = _build_small()

    if os.environ.get("P2M_SCALING_FULL", "0") == "1":
        # real-hardware config: SMPL-size finest level, full columns
        from bench import H36M_FLIP_PAIRS, H36M_SKELETON
        from pose2mesh_release_tpu.body.smpl import SMPL
        from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
        from pose2mesh_release_tpu.graphs.build import build_pyramid

        smpl = SMPL()
        pyr = build_pyramid(smpl.face, joint_num=17, skeleton=H36M_SKELETON,
                            flip_pairs=H36M_FLIP_PAIRS, levels=9)
        art = pack_pyramid(pyr, smpl.face)
        bench_hop(art, devices, batch=16, feat=128, scan_len=16)
    else:
        # budget config: completes on the 8-device CPU mesh in ~2 min
        bench_hop(small_art, devices, batch=4, feat=32, scan_len=4)

    bench_train_step(small_art, small_model.blocks, devices,
                     small_art.joint_num)

    with open(out_path, "w") as f:
        json.dump({"results": RESULTS}, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
