"""MXU shape-efficiency probe for TPU v5e (the chip behind this env).

Answers the question the round-2 verdict flagged (Weak #2): what matmul
shapes sustain what fraction of v5e's 197 TF/s bf16 peak?  Two probe
families:

  xla:<M>x<K>x<N>    one XLA einsum per iteration (HBM-resident operands,
                     write-out included) -- what a plain jnp.dot gets.
  pallas:<M>x<K>x<N>[:R]  a Pallas kernel with ALL operands VMEM-resident,
                     looping R matmuls of that shape inside one program --
                     isolates pure MXU issue rate from HBM traffic.
  hbm                elementwise copy bandwidth (read+write GB/s).

Usage: python benchmarks/probe_shapes.py [probe ...]
Default sweep covers the deploy kernels' actual shapes (hop: 128x384xC,
projection: 2048x384x128) plus large-K references.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_p2m"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DEFAULT = [
    "hbm",
    "xla:7168x384x8192",
    "xla:7168x768x8192",
    "xla:7168x1536x8192",
    "xla:4096x4096x4096",
    "pallas:128x384x2048:64",
    "pallas:2048x384x128:64",
    "pallas:256x384x2048:64",
    "pallas:512x384x1024:64",
    "pallas:1024x384x1024:64",
    "pallas:128x384x8192:16",
    "pallas:1024x1024x1024:16",
]


def timeloop(step, x0, work, unit, name, small=8, large=None):
    """Relay-safe: device->host fetch noise is 30-900ms, so the iteration
    delta must represent >=1s of device time.  When `large` is None it is
    sized from `work` (FLOPs or bytes per iteration) assuming the device
    peak, so cheap shapes get proportionally more iterations — the round-2
    probe under-iterated cheap shapes and printed physically impossible
    rates (>197 TF/s), which is how the 198-vs-100 TF/s contradiction
    (VERDICT r2 Weak #2) arose."""
    if large is None:
        peak = 197e12 if unit == "TF/s" else 0.8e12
        large = small + max(16, int(1.0 / (work / peak)))
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
    print(f"{name}: {dt*1e3:.3f} ms/iter  {work/dt/1e12:.2f} {unit}", flush=True)
    return dt


def probe_xla(M, K, N):
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        A = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((K, N)) * 0.1, jnp.bfloat16)
    A, x = jax.device_put((A, x), jax.devices()[0])

    def step(c):
        y = A @ c
        # the row-sum consumes EVERY output row, so XLA cannot narrow the
        # dot to the K rows the next iteration's rhs slice uses (DCE hole
        # that inflated earlier numbers ~18x)
        return y[:K] + y.sum(axis=0, keepdims=True) * jnp.bfloat16(1e-30)

    timeloop(step, x, 2 * M * K * N, "TF/s", f"xla {M}x{K}x{N}")


def probe_pallas(M, K, N, R):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((K, N)) * 0.1, jnp.bfloat16)
    A, x = jax.device_put((A, x), jax.devices()[0])

    def kernel(a_ref, x_ref, o_ref):
        def body(i, c):
            # rhs c changes every iteration (top rows nudged by the previous
            # product's full-row reduction), so the dot can't be hoisted,
            # iterations chain, and no output row is dead
            y = jnp.dot(a_ref[:], c, preferred_element_type=jnp.float32)
            nudge = (y[0:8, :] + y.sum(axis=0, keepdims=True)) * 1e-30
            return jnp.concatenate(
                [c[0:8, :] + nudge.astype(c.dtype), c[8:, :]], axis=0)

        c = jax.lax.fori_loop(0, R, body, x_ref[:])
        o_ref[:] = c[:1]

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.bfloat16),
        interpret=jax.default_backend() != "tpu",
    )

    def step(c):
        return c.at[:1].add(f(A, c) * 1e-30)

    timeloop(step, x, 2 * M * K * N * R, "TF/s",
             f"pallas {M}x{K}x{N} (VMEM-resident, x{R})", small=2)


def probe_striphop(Vp, W, C, h, align):
    """The strip kernel's H1 loop in isolation: fori over Vp/h row tiles,
    each a (h, W) @ (W, C) dot with a dynamic x-window slice whose start is
    `align`-sublane aligned.  Isolates the dynamic-slice / loop overhead
    the fused kernels pay on top of the raw matmul rate (compare with
    pallas:<h>x<W>x<C>)."""
    from jax.experimental.pallas import tpu as pltpu2

    rng = np.random.default_rng(0)
    nt = Vp // h
    strip = jnp.asarray(rng.standard_normal((Vp, W)) * 0.05, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((Vp, C)) * 0.1, jnp.bfloat16)
    strip, x = jax.device_put((strip, x), jax.devices()[0])

    def kernel(s_ref, x_ref, o_ref):
        def body(j, c):
            raw = j * h + (h - W) // 2
            o = jnp.clip((raw // align) * align, 0, Vp - W)
            win = x_ref[pl.ds(pl.multiple_of(o, align), W), :]
            sj = s_ref[pl.ds(j * h, h), :]
            o_ref[pl.ds(j * h, h), :] = jnp.dot(
                sj, win, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)
            return c
        jax.lax.fori_loop(0, nt, body, 0)

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vp, C), jnp.bfloat16),
        compiler_params=pltpu2.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )

    def step(c):
        return c + f(strip, c) * jnp.bfloat16(1e-30)

    timeloop(step, x, 2 * Vp * W * C, "TF/s",
             f"striphop Vp={Vp} {h}x{W}x{C} align={align}", small=4)


def probe_stripgrid(Vp, W, C, h, m):
    """Design probe for the grid-scheduled strip hop: grid over row-tile
    groups (m tiles per program, Pallas pipelines programs), x and strip
    whole-level resident (fetched once), ONE dynamic window read per
    matmul, STATIC stores to the output block.  If this reaches the
    static-shape pallas rate, the fused strip conv should be rebuilt on
    the grid schedule instead of in-kernel fori loops."""
    from jax.experimental.pallas import tpu as pltpu2

    rng = np.random.default_rng(0)
    nt = Vp // h
    ntg = nt // m
    strip = jnp.asarray(rng.standard_normal((Vp, W)) * 0.05, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((Vp, C)) * 0.1, jnp.bfloat16)
    strip, x = jax.device_put((strip, x), jax.devices()[0])

    def kernel(s_ref, x_ref, o_ref):
        t = pl.program_id(0)
        for j in range(m):
            g = t * m + j
            raw = g * h + (h - W) // 2
            o = jnp.clip((raw // 16) * 16, 0, Vp - W)
            win = x_ref[pl.ds(pl.multiple_of(o, 16), W), :]
            sj = s_ref[pl.ds(g * h, h), :]
            o_ref[j * h:(j + 1) * h, :] = jnp.dot(
                sj, win, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)

    f = pl.pallas_call(
        kernel,
        grid=(ntg,),
        in_specs=[pl.BlockSpec((Vp, W), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Vp, C), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m * h, C), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vp, C), jnp.bfloat16),
        compiler_params=pltpu2.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )

    def step(c):
        return c + f(strip, c) * jnp.bfloat16(1e-30)

    timeloop(step, x, 2 * Vp * W * C, "TF/s",
             f"stripgrid Vp={Vp} {h}x{W}x{C} m={m}", small=4)


def probe_stripcopy(Vp, W, C, h):
    """Pure dynamic-window-read bandwidth: fori over row tiles, each
    iteration copies a (W, C) window at a dynamic 16-aligned offset into a
    scratch (static store).  Reports effective TB/s — the hidden cost every
    dynamic-offset matmul operand pays on this toolchain."""
    from jax.experimental.pallas import tpu as pltpu2

    rng = np.random.default_rng(0)
    nt = Vp // h
    x = jnp.asarray(rng.standard_normal((Vp, C)) * 0.1, jnp.bfloat16)
    x = jax.device_put(x, jax.devices()[0])

    def kernel(x_ref, o_ref, sc_ref):
        def body(j, c):
            raw = j * h + (h - W) // 2
            o = jnp.clip((raw // 16) * 16, 0, Vp - W)
            sc_ref[:, :] = x_ref[pl.ds(pl.multiple_of(o, 16), W), :]
            # consume one row so the copy isn't dead
            o_ref[pl.ds(j * h, 1), :] = sc_ref[0:1, :]
            return c
        jax.lax.fori_loop(0, nt, body, 0)

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vp, C), jnp.bfloat16),
        scratch_shapes=[pltpu2.VMEM((W, C), jnp.bfloat16)],
        compiler_params=pltpu2.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )

    def step(c):
        return c + f(c) * jnp.bfloat16(1e-30)

    timeloop(step, x, nt * W * C * 2, "TB/s",
             f"stripcopy Vp={Vp} win({W}x{C}) h={h}", small=4)


def probe_hbm():
    rows, cols = 16384, 2048  # 64 MB bf16
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    with jax.default_device(cpu):
        x = jnp.asarray(rng.standard_normal((rows, cols)), jnp.bfloat16)
    x = jax.device_put(x, jax.devices()[0])
    # read + write 64 MB per iter; row-roll defeats any closed-form folding
    timeloop(lambda c: jnp.roll(c, 1, axis=0) + jnp.bfloat16(1.0), x,
             2 * rows * cols * 2, "TB/s",
             "hbm copy (read+write)", small=8, large=1032)


def main():
    for p in (sys.argv[1:] or DEFAULT):
        if p == "hbm":
            probe_hbm()
        elif p.startswith("xla:"):
            M, K, N = map(int, p.split(":")[1].split("x"))
            probe_xla(M, K, N)
        elif p.startswith("pallas:"):
            parts = p.split(":")
            M, K, N = map(int, parts[1].split("x"))
            R = int(parts[2]) if len(parts) > 2 else 64
            probe_pallas(M, K, N, R)
        elif p.startswith("striphop:"):
            Vp, W, C, h, align = map(int, p.split(":")[1].split("x"))
            probe_striphop(Vp, W, C, h, align)
        elif p.startswith("stripgrid:"):
            Vp, W, C, h, m = map(int, p.split(":")[1].split("x"))
            probe_stripgrid(Vp, W, C, h, m)
        elif p.startswith("stripcopy:"):
            Vp, W, C, h = map(int, p.split(":")[1].split("x"))
            probe_stripcopy(Vp, W, C, h)
        else:
            raise SystemExit(f"unknown probe {p}")


if __name__ == "__main__":
    main()
