"""Per-level deploy-conv A/B harness: group vs window vs strip kernels.

For each band level of the real (synthetic-template) SMPL pyramid and each
conv shape the SMPL schedule runs there, times one fused conv through the
selected kernels on the live backend and checks cross-kernel parity.
Usage: python benchmarks/ab_conv.py [impl ...]   (default: group strip)
Env: P2M_AB_BATCH (64), P2M_AB_LEVELS (all), P2M_STRIP_H via pack.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_p2m"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H36M_SKELETON = (
    (0, 7), (7, 8), (8, 9), (9, 10), (8, 11), (11, 12), (12, 13),
    (8, 14), (14, 15), (15, 16), (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6),
)
H36M_FLIP_PAIRS = ((1, 4), (2, 5), (3, 6), (14, 11), (15, 12), (16, 13))

# conv shapes the SMPL schedule runs per band level index (finest = 0)
LEVEL_CONVS = {
    0: [(128, 128), (128, 64)],
    1: [(128, 128)],
    2: [(256, 128), (128, 128)],
    3: [(256, 256)],
}


def kernels_for(impl):
    from pose2mesh_release_tpu.ops import pallas_cheby as pc
    if impl == "group":
        return pc.fused_conv_flat
    if impl == "window":
        from pose2mesh_release_tpu.ops.pallas_window import fused_conv_flat_window
        return fused_conv_flat_window
    if impl == "strip":
        from pose2mesh_release_tpu.ops.pallas_strip import fused_conv_flat_strip
        return fused_conv_flat_strip
    raise SystemExit(f"unknown impl {impl}")


def time_conv(fn, op, x2, B, W, b, reps=300):
    dev = jax.devices()[0]
    x2, W, b = jax.device_put((x2, W, b), dev)
    op = jax.device_put(op, dev)

    @functools.partial(jax.jit, static_argnums=0)
    def loop(n, x):
        def body(c, _):
            y = fn(op, c, B, W, b, relu=True)
            # chain so iterations serialize, whatever the output width
            w = c.shape[1]
            y2 = (y if y.shape[1] == w else
                  jnp.pad(y, ((0, 0), (0, w - y.shape[1])))
                  if y.shape[1] < w else y[:, :w])
            return (c + y2 * jnp.asarray(1e-30, c.dtype)).astype(c.dtype), ()
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y.astype(jnp.float32).mean()

    small = 4
    large = small + reps
    float(loop(small, x2)); float(loop(large, x2))
    ts, tl = [], []
    for _ in range(3):
        t0 = time.time(); float(loop(small, x2)); ts.append(time.time() - t0)
        t0 = time.time(); float(loop(large, x2)); tl.append(time.time() - t0)
    return max(min(tl) - min(ts), 1e-9) / reps


def main():
    impls = sys.argv[1:] or ["group", "strip"]
    B = int(os.environ.get("P2M_AB_BATCH", "64"))
    dt = jnp.bfloat16

    from pose2mesh_release_tpu.body.smpl import SMPL
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        smpl = SMPL()
        pyr = build_pyramid(smpl.face, joint_num=17, skeleton=H36M_SKELETON,
                            flip_pairs=H36M_FLIP_PAIRS, levels=9)
        art = pack_pyramid(pyr, smpl.face,
                           strip_h=int(os.environ.get("P2M_STRIP_H", "128")))

    lv_filter = os.environ.get("P2M_AB_LEVELS")
    rng = np.random.default_rng(0)
    for li, convs in LEVEL_CONVS.items():
        if lv_filter and str(li) not in lv_filter.split(","):
            continue
        op = art.mesh_ops[li]
        if op.kind != "band":
            continue
        Vp = op.padded_vertices
        sw = op.strip_val.shape
        print(f"# level {li}: V={op.num_vertices} Vp={Vp} band_k={op.band_k} "
              f"strip={sw} h={op.strip_h}", flush=True)
        for fin, fout in convs:
            F = -(-fin // 128) * 128
            Fo = -(-fout // 128) * 128
            with jax.default_device(cpu):
                x2 = jnp.asarray(rng.standard_normal((Vp, B * F)) * 0.3, dt)
                W = jnp.asarray(rng.standard_normal((3 * F, Fo)) * 0.05, dt)
                b = jnp.asarray(rng.standard_normal((Fo,)) * 0.1, dt)
            ys = {}
            for impl in impls:
                fn = kernels_for(impl)
                t = time_conv(fn, op, x2, B, W, b)
                ys[impl] = np.asarray(
                    jax.device_put(fn(op, x2, B, W, b, relu=True),
                                   cpu)).astype(np.float32)
                gf = np.prod([2, Vp, B, 3 * F, Fo]) / 1e9
                print(f"  conv {fin:3d}->{fout:3d} [{impl:6s}]: "
                      f"{t*1e6:8.1f} us  (proj {gf:.1f} GF)", flush=True)
            base = impls[0]
            for impl in impls[1:]:
                err = np.max(np.abs(ys[impl] - ys[base])) / (
                    np.max(np.abs(ys[base])) + 1e-9)
                if err > 3e-2:
                    print(f"  !! parity {impl} vs {base}: rel err {err:.3e}",
                          flush=True)


if __name__ == "__main__":
    main()
