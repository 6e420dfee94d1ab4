"""Profiling / roofline accounting (SURVEY.md §5: the reference has no
tracing at all; here: jax.profiler traces + per-level SpMM roofline).

`trace(dir)` wraps jax.profiler for TensorBoard-compatible traces of the
jitted steps.  `spmm_roofline(op, B, F)` reports the achievable-vs-ideal
cost model for one pyramid level's banded hop: FLOPs, HBM bytes, and the
arithmetic-intensity-implied bound on a v5e (197 TFLOP/s bf16, 819 GB/s).
"""
from __future__ import annotations

import contextlib
from dataclasses import dataclass
from typing import Dict, Iterator

import numpy as np

from ..graphs.artifact import LevelOperator, PyramidArtifact

__all__ = ["trace", "spmm_roofline", "pyramid_roofline",
           "fused_conv_roofline", "strip_conv_roofline",
           "sparse_conv_roofline"]

V5E_FLOPS = 197e12     # bf16 peak, per chip
V5E_HBM_BW = 819e9     # bytes/s


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Roofline:
    flops: float           # per hop
    hbm_bytes: float       # per hop (x read + y write + band blocks)
    intensity: float       # flops / byte
    bound: str             # "compute" | "memory"
    ideal_us: float        # speed-of-light time on v5e

    def as_dict(self) -> Dict[str, float]:
        return {"flops": self.flops, "hbm_bytes": self.hbm_bytes,
                "intensity": self.intensity, "ideal_us": self.ideal_us}


def spmm_roofline(op: LevelOperator, batch: int, feat: int,
                  dtype_bytes: int = 2) -> Roofline:
    """Cost model of one z = L @ x hop for a packed level operator."""
    C = batch * feat
    if op.kind == "dense":
        V = op.num_vertices
        flops = 2.0 * V * V * C
        bytes_ = dtype_bytes * (V * V + 2 * V * C)
    elif op.kind == "band":
        nbd, nt, T, _ = np.asarray(op.band_val.shape)
        flops = 2.0 * nbd * nt * T * T * C
        bytes_ = dtype_bytes * (nbd * nt * T * T + (nt * T) * C * 2)
    else:  # bcsr
        nt, maxb = op.blk_col.shape
        T = op.block_size
        flops = 2.0 * nt * maxb * T * T * C
        bytes_ = dtype_bytes * (nt * maxb * T * T + (nt * T) * C * 2)
    intensity = flops / bytes_
    t_compute = flops / V5E_FLOPS
    t_memory = bytes_ / V5E_HBM_BW
    return Roofline(
        flops=flops, hbm_bytes=float(bytes_), intensity=float(intensity),
        bound="compute" if t_compute > t_memory else "memory",
        ideal_us=max(t_compute, t_memory) * 1e6,
    )


def pyramid_roofline(art: PyramidArtifact, batch: int,
                     feats: Dict[int, int] | int = 128) -> Dict[str, Dict]:
    """Roofline per mesh level (feat per level or one feat for all)."""
    out = {}
    for k, op in enumerate(art.mesh_ops):
        f = feats[k] if isinstance(feats, dict) else feats
        out[f"level{k}_V{op.num_vertices}"] = spmm_roofline(op, batch, f).as_dict()
    return out


def fused_conv_roofline(op: LevelOperator, batch: int, fin_lanes: int,
                        fout_lanes: int, m: int = 4,
                        dtype_bytes: int = 2,
                        mxu_flops: float = V5E_FLOPS * 0.5) -> Roofline:
    """Cost model of ONE fused flat Chebyshev conv (ops.pallas_cheby).

    Counts the kernel's actual matmul volume — z1 for m+2k tiles, z2 for m,
    the 3 basis projections — and its HBM traffic (x re-read (m+4k)/m times
    across the program grid, band rows (m+2k)/m, one output write).
    `mxu_flops` defaults to half of bf16 peak: (128,128)x(128,C) batched
    matmuls sustain ~100 TF/s on v5e (measured), vs 178 for large square
    matmuls — that sustained rate IS the speed of light for this shape.
    """
    if op.kind != "band":
        return spmm_roofline(op, batch, fin_lanes, dtype_bytes)
    nbd, nt, T, _ = (int(s) for s in np.asarray(op.band_val.shape))
    k = nbd // 2
    C = batch * fin_lanes
    Co = batch * fout_lanes
    Vp = nt * T
    hop_mm = (m + 2 * k) * nbd + m * nbd          # z1 tiles + z2 tiles
    flops = 2.0 * (hop_mm / m) * nt * T * T * C   # hop matmuls
    flops += 2.0 * 3 * Vp * fin_lanes * Co        # basis projections
    bytes_ = dtype_bytes * (
        Vp * C * (m + 4 * k) / m                  # x window re-reads
        + nbd * nt * T * T * (m + 2 * k) / m      # band rows
        + Vp * Co                                 # output write
    )
    t_compute = flops / mxu_flops
    t_memory = bytes_ / V5E_HBM_BW
    return Roofline(
        flops=flops, hbm_bytes=float(bytes_),
        intensity=float(flops / bytes_),
        bound="compute" if t_compute > t_memory else "memory",
        ideal_us=max(t_compute, t_memory) * 1e6,
    )


# sustained MXU rates measured on this chip at the deploy kernels' matmul
# shapes (benchmarks/probe_shapes.py, committed in the round-3 bench notes):
# hop (128, W)@(W, 1024) ~ 129-153 TF/s; basis projection (1024, 3F)@(3F, Fo)
# and commuted K=F projections ~ 92-142 TF/s.  These replace the round-2
# guess of 0.5*peak — and resolve its 198-vs-100 TF/s contradiction: 198 was
# an under-iterated probe artifact, the real sustained band is 92-171.
MXU_HOP = 135e12
MXU_PROJ_BASIS = 142e12
MXU_PROJ_COMMUTED = 92e12


def strip_conv_roofline(op: LevelOperator, batch: int, fin_lanes: int,
                        fout_lanes: int, dtype_bytes: int = 2) -> Roofline:
    """Cost model of ONE strip-layout Chebyshev conv (ops.pallas_strip).

    Hops contract the (h + 2*bandwidth)-wide strip window; commuted convs
    (fout < fin) hop on fout lanes.  HBM traffic: x in, y out, strip rows
    once (whole-level residency: no window refetch, no halo recompute)."""
    if op.kind != "band" or op.strip_h == 0:
        return fused_conv_roofline(op, batch, fin_lanes, fout_lanes)
    Vp, W = (int(s) for s in op.strip_val.shape)
    C = batch * fin_lanes
    Co = batch * fout_lanes
    commuted = fout_lanes < fin_lanes
    hop_lanes = Co if commuted else C
    flops = 2.0 * 2 * Vp * W * hop_lanes            # two strip hops
    flops_p = 2.0 * 3 * Vp * fin_lanes * Co         # three basis projections
    bytes_ = dtype_bytes * (Vp * C + Vp * Co + Vp * W)
    t_compute = (2.0 * 2 * Vp * W * hop_lanes) / MXU_HOP + flops_p / (
        MXU_PROJ_COMMUTED if commuted else MXU_PROJ_BASIS)
    t_memory = bytes_ / V5E_HBM_BW
    return Roofline(
        flops=flops + flops_p, hbm_bytes=float(bytes_),
        intensity=float((flops + flops_p) / bytes_),
        bound="compute" if t_compute > t_memory else "memory",
        ideal_us=max(t_compute, t_memory) * 1e6,
    )


def sparse_conv_roofline(op: LevelOperator, batch: int, fin_lanes: int,
                         fout_lanes: int, dtype_bytes: int = 2) -> Roofline:
    """The HONEST lower bound for one Chebyshev conv (VERDICT r2 task 2):
    hop FLOPs counted at the nnz-minimal 2*nnz*C (the ELL view — no layout
    can do less work), projections at bf16 peak, HBM floor of one x read +
    one y write + the nnz operator stream.  No real MXU layout reaches
    this; the gap to `strip_conv_roofline` is the price of dense tiles."""
    C = batch * fin_lanes
    Co = batch * fout_lanes
    V = op.num_vertices
    nnz = op.nnz
    flops = 2.0 * 2 * nnz * max(C, Co) + 2.0 * 3 * V * fin_lanes * Co
    bytes_ = dtype_bytes * (V * C + V * Co + 2 * nnz)
    t_compute = flops / V5E_FLOPS
    t_memory = bytes_ / V5E_HBM_BW
    return Roofline(
        flops=flops, hbm_bytes=float(bytes_),
        intensity=float(flops / bytes_),
        bound="compute" if t_compute > t_memory else "memory",
        ideal_us=max(t_compute, t_memory) * 1e6,
    )
