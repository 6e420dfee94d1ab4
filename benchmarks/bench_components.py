"""Component-level TPU timing: PoseNet vs MeshNet vs per-level hops.

Same relay-safe methodology as bench.py (scan-chained iterations inside
one jit, small-K/large-K differencing).  Prints one line per component.

Usage: python benchmarks/bench_components.py [batch]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pose2mesh_release_tpu.body.smpl import SMPL
from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
from pose2mesh_release_tpu.graphs.build import build_pyramid
from pose2mesh_release_tpu.models.meshnet import MeshNet, SMPL_BLOCKS
from pose2mesh_release_tpu.models.posenet import PoseNet
from pose2mesh_release_tpu.ops import pallas_cheby as pc

H36M_SKELETON = (
    (0, 7), (7, 8), (8, 9), (9, 10), (8, 11), (11, 12), (12, 13),
    (8, 14), (14, 15), (15, 16), (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6),
)


def timed(jit_loop_factory, *args, n_small=4, n_big=32, repeats=4):
    r_small = jit_loop_factory(n_small)
    r_big = jit_loop_factory(n_big)
    jax.block_until_ready(r_small(*args))
    jax.block_until_ready(r_big(*args))
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(r_small(*args))
        t1 = time.perf_counter()
        jax.block_until_ready(r_big(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n_big - n_small))
    return best


def main(batch=64):
    dt = jnp.bfloat16
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        smpl = SMPL()
        pyr = build_pyramid(smpl.face, joint_num=17, skeleton=H36M_SKELETON,
                            levels=9)
        art = pack_pyramid(pyr, smpl.face)
        posenet = PoseNet(17, dtype=dt)
        meshnet = MeshNet(blocks=SMPL_BLOCKS, dtype=dt)
        rng = jax.random.PRNGKey(0)
        x2d = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, 17, 2)), jnp.float32)
        pvars = jax.jit(posenet.init, static_argnums=2)(rng, x2d.reshape(batch, -1), False)
        xin = jnp.asarray(np.random.default_rng(1).standard_normal(
            (batch, 17, 5)), jnp.float32)
        mvars = jax.jit(meshnet.init, static_argnums=3)(rng, art, xin, False)

    art_d, pvars_d, mvars_d, x2d_d, xin_d = jax.device_put(
        (art, pvars, mvars, x2d, xin), tpu)

    def posenet_loop(K):
        @jax.jit
        def run(v, x):
            def body(c, _):
                y = posenet.apply(v, c, False)
                return (c * 0.999 + y.reshape(c.shape[0], -1, 3)[..., :2]
                        * 1e-6), ()
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c
        return run

    t = timed(posenet_loop, pvars_d, x2d_d)
    print(f"posenet:  {t*1e3:.2f} ms/batch{batch}")

    def meshnet_loop(K):
        @jax.jit
        def run(v, x):
            def body(c, _):
                y = meshnet.apply(v, art_d, c, False)
                return c * 0.999 + y[:, :17, :2].mean() * 1e-6, ()
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c
        return run

    t = timed(meshnet_loop, mvars_d, xin_d)
    print(f"meshnet:  {t*1e3:.2f} ms/batch{batch}")

    # per-level banded hop cost, F=128
    for k, op in enumerate(art.mesh_ops):
        if op.kind != "band":
            continue
        op_d = jax.device_put(op, tpu)
        xk = jax.device_put(jnp.asarray(np.random.default_rng(2).standard_normal(
            (op.num_vertices, batch, 128)), dt), tpu)

        def hop_loop(K, op_d=op_d):
            @jax.jit
            def run(x):
                def body(c, _):
                    return pc.banded_hop(op_d, c) * 0.5 + c * 0.5, ()
                c, _ = jax.lax.scan(body, x, None, length=K)
                return c
            return run

        t = timed(hop_loop, xk)
        nnz_flops = 2 * 3 * op.band_val.shape[1] * op.block_size ** 2 * batch * 128
        print(f"hop V={op.num_vertices}: {t*1e6:.0f} us "
              f"({nnz_flops/t/1e12:.1f} TF/s dense-band)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
