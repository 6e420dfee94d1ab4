"""Probe: does the MXU reward K=256 vs K=384 contractions at the band-hop
shapes?  Gates the round-5 'band2' narrow-window layout (hop windows of
2*T=256 columns for levels whose scalar bandwidth <= T/2): if the v5e MXU
pads K to 128-quanta, K=256 is 2 passes vs K=384's 3 and the hop matmuls
should run ~1.5x faster; if K is handled differently the layout is moot.

Also probes K=320 (2.5 quanta) to see the quantization shape directly.

Methodology: scan-chained matmuls inside one jitted program, small/large
differencing (relay-safe, bench.py notes).

CAVEAT: even with the per-rep chained operand (no CSE), this probe's
ABSOLUTE rates over-read (K=128 measured above the chip's bf16 peak —
the in-kernel chain still overlaps more than the model assumes).  Treat
only the RATIOS as evidence; the committed K-quantization numbers in
BENCH_NOTES_r5.md §1.1 come from the validated benchmarks/probe_shapes.py
(fori-loop form).  Measured here as corroboration: K=320 costs >= K=384
(both 3 passes), K=256 is ~1.7x cheaper than K=384 per matmul.
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(M, K, C, reps=64):
    """Time a Pallas kernel doing `reps` (M,K)@(K,C) matmuls per program."""
    dt = jnp.bfloat16

    def kernel(a_ref, b_ref, o_ref):
        # CHAIN each rep through the next operand (cur depends on the
        # previous product): no two dots are identical, so neither CSE nor
        # reordering can collapse the sequence (the r%4-rotation form of
        # this probe produced only 4 distinct dots for 64 reps)
        cur = a_ref[0:M, :]
        acc = jnp.zeros((M, C), jnp.float32)
        for r in range(reps):
            y = jnp.dot(cur, b_ref[:], preferred_element_type=jnp.float32)
            acc += y
            cur = (a_ref[pl.ds((r % 4) * M, M), :]
                   + y[:, :K].astype(dt) * jnp.asarray(1e-30, dt))
        o_ref[:, :] = acc.astype(dt)

    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        A = jnp.asarray(rng.standard_normal((4 * M, K)) * 0.1, dt)
        B = jnp.asarray(rng.standard_normal((K, C)) * 0.1, dt)
    A, B = jax.device_put((A, B), jax.devices()[0])

    call = functools.partial(
        pl.pallas_call,
        in_specs=[pl.BlockSpec((4 * M, K), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, C), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, C), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(kernel)

    @functools.partial(jax.jit, static_argnums=0)
    def loop(n, a, b):
        def body(c, _):
            y = call(c, b)
            # scalar feedback: the next iteration's A depends on this y,
            # so the scan can't hoist or parallelize the matmuls
            return (c + y.astype(jnp.float32).mean().astype(dt)
                    * jnp.asarray(1e-30, dt)).astype(dt), ()
        c, _ = jax.lax.scan(body, a, None, length=n)
        return c.astype(jnp.float32).mean()

    small, large = 8, 136
    float(loop(small, A, B)); float(loop(large, A, B))
    ts, tl = [], []
    for _ in range(3):
        t0 = time.time(); float(loop(small, A, B)); ts.append(time.time() - t0)
        t0 = time.time(); float(loop(large, A, B)); tl.append(time.time() - t0)
    per_call = max(min(tl) - min(ts), 1e-12) / (large - small)
    flops = 2 * M * K * C * reps
    return per_call / reps * 1e6, flops / per_call / 1e12


def main():
    out = {}
    for K in (128, 256, 320, 384, 512):
        us, tf = probe(128, K, 2048)
        out[f"K{K}"] = {"us_per_matmul": round(us, 2), "tf_s": round(tf, 1)}
        print(f"# M=128 K={K} C=2048: {us:.2f} us/matmul, {tf:.1f} TF/s",
              file=sys.stderr, flush=True)
    r256 = out["K256"]["us_per_matmul"]
    r384 = out["K384"]["us_per_matmul"]
    out["k384_over_k256"] = round(r384 / r256, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
