"""Isolated TPU microbenchmarks for the deploy-path conv kernels.

Locates where MXU throughput is lost relative to a plain dense matmul:
  dense  - equal-shape XLA matmul (the ~speed-of-light reference)
  hop    - banded hop kernel alone (concat + one K=384 matmul, no reshapes)
  fused  - full fused conv kernel (hops + in-kernel projection reshapes)
Usage: python benchmarks/probe_kernels.py [dense hop fused ...]
Relay-safe timing per bench.py: lax.scan chaining, small/large differencing.
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


def build_op():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import H36M_FLIP_PAIRS, H36M_SKELETON
    from pose2mesh_release_tpu.body.smpl import SMPL
    from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
    from pose2mesh_release_tpu.graphs.build import build_pyramid
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        smpl = SMPL()
        pyr = build_pyramid(smpl.face, joint_num=17, skeleton=H36M_SKELETON,
                            flip_pairs=H36M_FLIP_PAIRS, levels=9)
        art = pack_pyramid(pyr, smpl.face)
    return art.mesh_ops[0]


def timeloop(step, x0, flops, name, small=2, large=10):
    @functools.partial(jax.jit, static_argnums=0)
    def loop(n, x):
        def body(c, _):
            return step(c), ()
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y.astype(jnp.float32).mean()

    float(loop(small, x0))
    float(loop(large, x0))
    ts, tl = [], []
    for _ in range(3):
        t0 = time.time(); float(loop(small, x0)); ts.append(time.time() - t0)
        t0 = time.time(); float(loop(large, x0)); tl.append(time.time() - t0)
    dt = max(min(tl) - min(ts), 1e-9) / (large - small)
    print(f"{name}: {dt*1e3:.3f} ms/iter  {flops/dt/1e12:.1f} TF/s", flush=True)
    return dt


def main():
    variants = sys.argv[1:] or ["dense", "hop", "fused"]
    op = build_op()
    nbd, nt, T, _ = op.band_val.shape
    k = nbd // 2
    Vp = nt * T
    B, F = 64, 128
    C = B * F
    dev = jax.devices()[0]
    op_d = jax.device_put(op, dev)
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x2 = jnp.asarray(rng.standard_normal((Vp, C)) * 0.1, jnp.bfloat16)
        Wd = jnp.asarray(rng.standard_normal((Vp, nbd * T)) * 0.01, jnp.bfloat16)
        Wc = jnp.asarray(rng.standard_normal((3 * F, F)) * 0.05, jnp.bfloat16)
        bb = jnp.zeros((F,), jnp.bfloat16)
    x2, Wd, Wc, bb = jax.device_put((x2, Wd, Wc, bb), dev)
    x3 = x2.reshape(Vp, B, F)

    hop_fl = Vp * (nbd * T) * C * 2  # one hop's matmul volume at this band_k

    if "dense" in variants:
        timeloop(lambda x: (Wd @ x[:nbd * T]).astype(x.dtype), x2, hop_fl,
                 "dense")

    if "hop" in variants:
        from pose2mesh_release_tpu.ops.pallas_cheby import _hop_call
        timeloop(lambda x: _hop_call(op_d.band_val, x, T), x3, hop_fl, "hop")

    saved_m = os.environ.get("P2M_FUSED_M")
    try:
        for v in variants:
            if not v.startswith("fused"):
                continue
            m_env = v.split(":")[1] if ":" in v else "4"
            os.environ["P2M_FUSED_M"] = m_env
            m = int(m_env)
            from pose2mesh_release_tpu.ops.pallas_cheby import fused_conv_flat
            fl = (1.0 + (m + 2 * k) / m) * hop_fl + Vp * B * 3 * F * F * 2
            timeloop(lambda x: fused_conv_flat(op_d, x, B, Wc, bb, relu=True),
                     x2, fl, f"fused(m={m_env})")
    finally:
        if saved_m is None:
            os.environ.pop("P2M_FUSED_M", None)
        else:
            os.environ["P2M_FUSED_M"] = saved_m

    if "window" in variants:
        from pose2mesh_release_tpu.ops.pallas_window import (
            fused_conv_flat_window, window_supported)
        assert window_supported(op_d)
        fl = 2.0 * hop_fl + Vp * B * 3 * F * F * 2
        timeloop(lambda x: fused_conv_flat_window(op_d, x, B, Wc, bb,
                                                  relu=True),
                 x2, fl, "window")


if __name__ == "__main__":
    main()
