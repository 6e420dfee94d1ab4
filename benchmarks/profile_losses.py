"""Isolate the face-loss gradient cost (round-4 open item: grad_train -
grad_vertex measured ~16 ms, ~10x the op-cost model).

Times, on chip, value_and_grad wrt the predicted mesh of:
  vertex        coord_l1 only
  faces_inv     + normal + edge with the scatter-free ELL-inverse VJP
  faces_scatter + normal + edge with plain autodiff (scatter backward)

No model, no Pallas — compiles are fast, so this pinpoints whether the
loss stack itself carries the cost and whether the gather-based VJP
actually beats the scatter form on hardware.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_p2m"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _measure(fn, x, *args, small=4, large=24, reps=3):
    @functools.partial(jax.jit, static_argnums=0)
    def loop(n, x0, *a):
        def body(c, _):
            g = fn(c, *a)
            return c + g * 1e-30, ()
        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c

    def run(n):
        np.asarray(jnp.sum(loop(n, x, *args)))

    run(small); run(large)
    ts, tl = [], []
    for _ in range(reps):
        t0 = time.time(); run(small); ts.append(time.time() - t0)
        t0 = time.time(); run(large); tl.append(time.time() - t0)
    return max(min(tl) - min(ts), 1e-9) / (large - small)


def main(batch=64):
    from pose2mesh_release_tpu.body.smpl import SMPL
    from pose2mesh_release_tpu.core.losses import (
        coord_l1, edge_length_loss, normal_vector_loss,
    )
    from pose2mesh_release_tpu.graphs.artifact import face_inverse_tables

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        smpl = SMPL()
        faces_np = np.asarray(smpl.face, np.int32)
        V = int(faces_np.max()) + 1
        inv = face_inverse_tables(faces_np, V)
        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.standard_normal((batch, V, 3)) * 0.1,
                           jnp.float32)
        gt = jnp.asarray(rng.standard_normal((batch, V, 3)) * 0.1,
                         jnp.float32)
        faces = jnp.asarray(faces_np)
    dev = jax.devices()[0]
    pred, gt, faces = jax.device_put((pred, gt, faces), dev)
    inv = jax.device_put(inv, dev)

    def g_vertex(p, t):
        return jax.grad(lambda q: coord_l1(q, t))(p)

    def g_faces_inv(p, t, f, iv):
        return jax.grad(lambda q: coord_l1(q, t)
                        + 0.1 * normal_vector_loss(q, t, f, iv)
                        + 20.0 * edge_length_loss(q, t, f, iv))(p)

    def g_faces_scatter(p, t, f):
        return jax.grad(lambda q: coord_l1(q, t)
                        + 0.1 * normal_vector_loss(q, t, f)
                        + 20.0 * edge_length_loss(q, t, f))(p)

    # sorted-scatter variant: per corner, pre-sort the face list by vertex
    # index so the backward scatter-add runs with indices_are_sorted=True
    orders = [np.argsort(np.asarray(faces_np[:, c])) for c in range(3)]
    sorted_idx = [jnp.asarray(faces_np[o, c]) for c, o in enumerate(orders)]
    orders_j = [jnp.asarray(o) for o in orders]

    import functools as _ft

    @_ft.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def take_sorted(p, fidx, sidx, c):
        return jnp.take(p, fidx, axis=1)

    def _ts_fwd(p, fidx, sidx, c):
        return jnp.take(p, fidx, axis=1), (sidx, p.shape)

    def _ts_bwd(c, res, g):
        sidx, pshape = res
        gs = jnp.take(g, orders_j[c], axis=1)
        dp = jnp.zeros(pshape, g.dtype).at[:, sidx].add(
            gs, indices_are_sorted=True, unique_indices=False)
        return dp, None, None

    take_sorted.defvjp(_ts_fwd, _ts_bwd)

    def _mini_loss(gather3):
        # a representative slice of the real losses' structure: normalized
        # edge dirs + edge-length; isolates gather/scatter cost apples-to-
        # apples between the two gather implementations
        def loss(q):
            p = gather3(q)
            v1o = p[1] - p[0]
            v2o = p[2] - p[0]
            n1 = v1o * jax.lax.rsqrt(
                (v1o * v1o).sum(-1, keepdims=True) + 1e-12)
            e = jnp.sqrt((v2o * v2o).sum(-1) + 1e-12)
            return jnp.abs(n1).mean() + e.mean()
        return loss

    def g_mini_plain(p, t, f):
        loss = _mini_loss(lambda q: [q[:, f[:, c]] for c in range(3)])
        return jax.grad(lambda q: coord_l1(q, t) + loss(q))(p)

    def g_mini_sorted(p, t, f):
        loss = _mini_loss(
            lambda q: [take_sorted(q, f[:, c], sorted_idx[c], c)
                       for c in range(3)])
        return jax.grad(lambda q: coord_l1(q, t) + loss(q))(p)

    out = {}
    for name, fn, args in (
        ("vertex", g_vertex, (gt,)),
        ("faces_inv", g_faces_inv, (gt, faces, inv)),
        ("faces_scatter", g_faces_scatter, (gt, faces)),
        ("mini_plain", g_mini_plain, (gt, faces)),
        ("mini_sorted", g_mini_sorted, (gt, faces)),
    ):
        ms = _measure(fn, pred, *args) * 1e3
        out[name] = round(ms, 3)
        print(f"# {name:14s} {ms:7.3f} ms/batch{batch}",
              file=sys.stderr, flush=True)
    out["faces_inv_delta_ms"] = round(out["faces_inv"] - out["vertex"], 3)
    out["faces_scatter_delta_ms"] = round(
        out["faces_scatter"] - out["vertex"], 3)
    out["sorted_vs_plain_ms"] = round(
        out["mini_sorted"] - out["mini_plain"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
