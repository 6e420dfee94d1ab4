"""Whole-level windowed Pallas kernel for the fused Chebyshev conv (deploy).

Second-generation deploy kernel (successor of ops.pallas_cheby.fused_conv_flat,
same drop-in signature).  Rationale, measured on v5e: the group kernel
(m output tiles per program) sustains only ~½ the MXU rate a plain XLA matmul
chain reaches at the same shapes.  Its losses are structural:

  * every program re-fetches its (m+4k)-tile x halo window from HBM
    ((m+4k)/m ~ 2x read amplification at m=4) and re-computes 2k z1 halo
    tiles per group;
  * each hop first CONCATENATES the 2k+1 x tile refs into one VMEM buffer
    (a pure VPU copy of several MB per program) before the MXU sees it.

This kernel instead holds the ENTIRE level resident in VMEM (the biggest
SMPL band level is 7168 x 1024 lanes = 14.7 MB bf16 at the default column
chunk; v5e has 128 MB VMEM) and runs the grid over batch column chunks only:

  grid = (ncc,)
  loop 1 (fori over row tiles): z1[j] = win[j] @ x[s_j : s_j+W]
  loop 2 (fori over row tiles): z2   = 2 * win[j] @ z1[s_j : s_j+W] - x[j]
                                y[j] = concat(x_j, z1_j, z2) @ Wp + b (+skip)

where `win` is the level's Laplacian in *sliding-window band* form: row tile
j holds the (T, W) slice L[jT:(j+1)T, s_j:s_j+W] with s_j = clip(jT - bwp,
0, Vp - W) — edge tiles shift their entries instead of clamping block
indices, so every window read is in bounds and no masking is needed.  x is
read from HBM exactly once, z1 lives in a VMEM scratch, there is no halo
recompute and no x-window concatenation; each hop is ONE
(T, W) @ (W, lanes) MXU matmul sliced directly from resident buffers.

The window width W = (2*band_k + 1)*T today (identical FLOPs to the group
kernel); narrowing W toward T + 2*bandwidth is a further, ordering-dependent
step.  Like fused_conv_flat this path is inference-only (BN folded): no VJP.

Reference semantics being replaced: torch.sparse.mm Chebyshev hops,
/root/reference/lib/models/backbones/cheby_graph_conv.py:25-28.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graphs.artifact import LevelOperator

__all__ = ["fused_conv_flat_window", "window_supported"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def window_supported(op: LevelOperator, nt_min: int = 0, *,
                     batch: int = 0, lanes: int = 0) -> bool:
    """The window layout needs nt >= 2k+1 row tiles (edge shifting assumes
    the middle region exists), the band kind, and k <= 2 (the same cap as
    pallas_supported — wider bands take the XLA path everywhere).

    When batch/lanes are given, also checks the whole-level VMEM live set
    (win + x + z1 scratch + out, double-buffered column chunks) against the
    kernel's vmem_limit so dispatch falls back to the group kernel instead
    of failing at Mosaic compile time."""
    if op.kind != "band" or not (1 <= op.band_k <= 2):
        return False
    nt = op.band_val.shape[1]
    if nt < 2 * op.band_k + 1 or nt < nt_min:
        return False
    if batch and lanes:
        T = op.block_size
        VpR = nt * T
        cap = int(os.environ.get("P2M_WIN_LANES", "1024"))
        bc_lanes = 0
        for c in range(1, batch + 1):
            if batch % c == 0 and c * lanes <= cap:
                bc_lanes = c * lanes
        bc_lanes = bc_lanes or lanes
        win_b = VpR * (2 * op.band_k + 1) * T * 2
        # x, out, skip double-buffered per column chunk + z1 scratch
        bytes_ = win_b + VpR * bc_lanes * 2 * (3 * 2 + 1)
        if bytes_ > 100 * 1024 * 1024:
            return False
    return True


def _window_cat(band_val: jax.Array, T: int) -> jax.Array:
    """(nbd, nt, T, T) block-band -> (nt*T, W) sliding-window band.

    Row tile j covers columns [s_j, s_j + W) with
    s_j = clip((j - k) * T, 0, nt*T - W): interior tiles keep the aligned
    [t-k .. t+k] block concatenation; the first/last k tiles shift their
    entries so the window stays in bounds (the shifted-out columns are
    out-of-range blocks, all-zero by construction in _pack_band)."""
    nbd, nt = band_val.shape[0], band_val.shape[1]
    k = nbd // 2
    Wd = nbd * T
    cat = band_val.transpose(1, 2, 0, 3).reshape(nt, T, Wd)
    parts = []
    for j in range(k):  # top edge: shift left by (k-j) tiles
        sh = (k - j) * T
        parts.append(jnp.concatenate(
            [cat[j, :, sh:], jnp.zeros((T, sh), cat.dtype)], axis=1))
    parts.append(cat[k:nt - k].reshape((nt - 2 * k) * T, Wd))
    for j in range(nt - k, nt):  # bottom edge: shift right
        sh = (j + k + 1 - nt) * T
        parts.append(jnp.concatenate(
            [jnp.zeros((T, sh), cat.dtype), cat[j, :, :Wd - sh]], axis=1))
    return jnp.concatenate(parts, axis=0)


def _win_kernel_factory(T, W, BC, F, Fout, nt, VpR, bwp,
                        relu=False, skip_mode=None, Fs=0, out_3d=False,
                        unroll=1):
    def kernel(*refs):
        win_ref, x_ref = refs[0], refs[1]
        rest = list(refs[2:])
        skip_ref = rest.pop(0) if skip_mode else None
        w_ref, b_ref = rest.pop(0), rest.pop(0)
        skip_w_ref = rest.pop(0) if skip_mode == "proj" else None
        out_ref, z1_ref = rest[0], rest[1]
        dt = x_ref.dtype

        def s_of(j):
            # all candidate values are multiples of T (=128): aligned slices
            return pl.multiple_of(jnp.clip(j * T - bwp, 0, VpR - W), T)

        def hop(j, src_ref):
            bj = win_ref[pl.ds(j * T, T), :]
            window = src_ref[pl.ds(s_of(j), W), :]
            return jnp.dot(bj, window, preferred_element_type=jnp.float32)

        def loop1(j, carry):
            z1_ref[pl.ds(j * T, T), :] = hop(j, x_ref).astype(dt)
            return carry

        jax.lax.fori_loop(0, nt, loop1, 0, unroll=unroll)

        def loop2(j, carry):
            xt = x_ref[pl.ds(j * T, T), :]
            z1t = z1_ref[pl.ds(j * T, T), :]
            z2 = (2.0 * hop(j, z1_ref) - xt.astype(jnp.float32)).astype(dt)

            def rows(z):
                return z.reshape(T, BC, F).reshape(T * BC, F)

            xz = jnp.concatenate([rows(xt), rows(z1t), rows(z2)], axis=1)
            acc = jnp.dot(xz, w_ref[:], preferred_element_type=jnp.float32)
            acc += b_ref[0][None, :].astype(jnp.float32)
            if relu:
                acc = jnp.maximum(acc, 0.0)
            if skip_mode == "add":
                acc += skip_ref[pl.ds(j * T, T), :].reshape(
                    T, BC, Fout).reshape(T * BC, Fout).astype(jnp.float32)
            elif skip_mode == "proj":
                s = skip_ref[pl.ds(j * T, T), :].reshape(
                    T, BC, Fs).reshape(T * BC, Fs)
                acc += jnp.dot(s, skip_w_ref[:],
                               preferred_element_type=jnp.float32)
            if out_3d:
                out_ref[pl.ds(j * T, T)] = acc.astype(dt).reshape(T, BC, Fout)
            else:
                out_ref[pl.ds(j * T, T), :] = acc.astype(dt).reshape(
                    T, BC, Fout).reshape(T, BC * Fout)
            return carry

        jax.lax.fori_loop(0, nt, loop2, 0, unroll=unroll)

    return kernel


def fused_conv_flat_window(op: LevelOperator, x2: jax.Array, batch: int,
                           W: jax.Array, b: jax.Array, *, relu: bool = False,
                           skip: jax.Array | None = None,
                           skip_w: jax.Array | None = None,
                           out_3d: bool = False) -> jax.Array:
    """Drop-in for ops.pallas_cheby.fused_conv_flat (same contract).

    x2: (Vp, batch*Fp) flat deploy layout, Vp = nt*T pack-padded rows.
    W: (3*Fp, Fop) basis-major projection, lane-aligned; b: (Fop,).
    """
    T = op.block_size
    band_val = op.band_val
    nbd, nt = band_val.shape[0], band_val.shape[1]
    k = nbd // 2
    Wwin = nbd * T
    bwp = k * T
    VpR, C = x2.shape
    assert VpR == nt * T, (VpR, nt, T)
    F = C // batch
    Fout = W.shape[1]
    assert W.shape[0] == 3 * F, (W.shape, F)

    lane_cap = int(os.environ.get("P2M_WIN_LANES", "1024"))
    BC = 1
    for c in range(1, batch + 1):
        if batch % c == 0 and c * max(F, Fout) <= lane_cap:
            BC = c
    ncc = batch // BC

    win = _window_cat(band_val.astype(x2.dtype), T)  # (nt*T, Wwin)

    in_specs = [
        pl.BlockSpec((VpR, Wwin), lambda c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((VpR, BC * F), lambda c: (0, c), memory_space=pltpu.VMEM),
    ]
    operands = [win, x2]

    skip_mode = None
    Fs = 0
    if skip is not None:
        Fs = skip.shape[1] // batch
        skip_mode = "add" if skip_w is None else "proj"
        if skip_mode == "add" and Fs != Fout:
            raise ValueError(f"plain skip-add needs Fs == Fout ({Fs} vs {Fout})")
        in_specs.append(pl.BlockSpec((VpR, BC * Fs), lambda c: (0, c),
                                     memory_space=pltpu.VMEM))
        operands.append(skip)

    in_specs.append(pl.BlockSpec((3 * F, Fout), lambda c: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(W.astype(x2.dtype))
    in_specs.append(pl.BlockSpec((1, Fout), lambda c: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(b.reshape(1, -1).astype(x2.dtype))
    if skip_mode == "proj":
        in_specs.append(pl.BlockSpec((Fs, Fout), lambda c: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(skip_w.astype(x2.dtype))

    if out_3d:
        out_specs = pl.BlockSpec((VpR, BC, Fout), lambda c: (0, c, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((VpR, batch, Fout), x2.dtype)
    else:
        out_specs = pl.BlockSpec((VpR, BC * Fout), lambda c: (0, c),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((VpR, batch * Fout), x2.dtype)

    unroll = int(os.environ.get("P2M_WIN_UNROLL", "1"))
    return pl.pallas_call(
        _win_kernel_factory(T, Wwin, BC, F, Fout, nt, VpR, bwp,
                            relu=relu, skip_mode=skip_mode, Fs=Fs,
                            out_3d=out_3d, unroll=unroll),
        grid=(ncc,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((VpR, BC * F), x2.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*operands)
