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

__all__ = ["trace", "spmm_roofline", "pyramid_roofline"]

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
