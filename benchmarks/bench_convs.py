"""Per-conv TPU timing across the SMPL MeshNet schedule: fused Pallas kernel
vs two banded hops + XLA projection, per (V, Fin, Fout).

Same relay-safe scan-differencing methodology as bench.py.
Usage: python benchmarks/bench_convs.py [batch]
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
from pose2mesh_release_tpu.ops import pallas_cheby as pc
from pose2mesh_release_tpu.ops.cheby import chebyshev_stack

H36M_SKELETON = (
    (0, 7), (7, 8), (8, 9), (9, 10), (8, 11), (11, 12), (12, 13),
    (8, 14), (14, 15), (15, 16), (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6),
)

# (level_index_from_finest, Fin, Fout) per conv in SMPL_BLOCKS order
# blocks[i>0] run at mesh_ops[n_mesh - i]; blocks[-1] at mesh_ops[0]
SMPL_SCHEDULE = [
    (7, 64, 128), (7, 128, 256),
    (6, 256, 256), (6, 256, 256),
    (5, 256, 256), (5, 256, 256),
    (4, 256, 256), (4, 256, 256),
    (3, 256, 256), (3, 256, 256),
    (2, 256, 128), (2, 128, 128),
    (1, 128, 128), (1, 128, 128),
    (0, 128, 64), (0, 64, 3),
]


def timed(factory, *args, n_small=4, n_big=24, repeats=4):
    r_small = factory(n_small)
    r_big = factory(n_big)
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
    return max(best, 0.0)


def main(batch=64):
    dt = jnp.bfloat16
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        smpl = SMPL()
        pyr = build_pyramid(smpl.face, joint_num=17, skeleton=H36M_SKELETON,
                            levels=9)
        art = pack_pyramid(pyr, smpl.face)
        rng = np.random.default_rng(0)

    total_f, total_u = 0.0, 0.0
    for li, fin, fout in SMPL_SCHEDULE:
        op = art.mesh_ops[li]
        with jax.default_device(cpu):
            x = jnp.asarray(rng.standard_normal((op.num_vertices, batch, fin)), dt)
            W = jnp.asarray(rng.standard_normal((3 * fin, fout)) * 0.01, dt)
            b = jnp.zeros((fout,), dt)
        op_d, x_d, W_d, b_d = jax.device_put((op, x, W, b), tpu)

        def fused_loop(K):
            @jax.jit
            def run(x, W, b):
                def body(c, _):
                    y = pc.fused_cheby_project(op_d, c, W, b)
                    return c * 0.999 + y[..., :1].mean() * 1e-6, ()
                c, _ = jax.lax.scan(body, x, None, length=K)
                return c
            return run

        from pose2mesh_release_tpu.ops.spmm import spmm

        def hop1(c):
            return pc.banded_hop(op_d, c) if op_d.kind == "band" else spmm(op_d, c)

        def unfused_loop(K):
            @jax.jit
            def run(x, W, b):
                def body(c, _):
                    z1 = hop1(c)
                    z2 = 2.0 * hop1(z1) - c
                    y = (jnp.einsum("vbf,fg->vbg", c, W[:fin])
                         + jnp.einsum("vbf,fg->vbg", z1, W[fin:2 * fin])
                         + jnp.einsum("vbf,fg->vbg", z2, W[2 * fin:]) + b)
                    return c * 0.999 + y[..., :1].mean() * 1e-6, ()
                c, _ = jax.lax.scan(body, x, None, length=K)
                return c
            return run

        tf = timed(fused_loop, x_d, W_d, b_d)
        tu = timed(unfused_loop, x_d, W_d, b_d)
        total_f += tf
        total_u += tu
        # real (unpadded) useful FLOPs: 2 hops of 3*V*T*B*Fin + projection
        if op.kind == "band":
            hop = 2 * 3 * op.band_val.shape[1] * op.block_size ** 2 * batch * fin
        else:
            hop = 2 * op.num_vertices ** 2 * batch * fin
        proj = 2 * op.num_vertices * batch * 3 * fin * fout
        fl = 2 * hop + proj
        print(f"V={op.num_vertices:5d} {fin:3d}->{fout:3d}: "
              f"fused {tf*1e6:7.0f} us ({fl/max(tf,1e-9)/1e12:5.1f} TF/s)  "
              f"unfused {tu*1e6:7.0f} us ({fl/max(tu,1e-9)/1e12:5.1f} TF/s)",
              flush=True)
    print(f"TOTAL fused {total_f*1e3:.2f} ms   unfused {total_u*1e3:.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
