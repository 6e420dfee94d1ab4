"""Pallas TPU kernel for the banded Laplacian hop (z = L @ x).

The hot op of the whole framework (SURVEY.md §6): the reference runs
`torch.sparse.mm(L, x)` twice per Chebyshev conv
(cheby_graph_conv.py:25-28).  The XLA banded formulation
(`ops.spmm.spmm_band`) is correct but pays pad copies and an unfused sum
over block diagonals.  This kernel is strictly 2-D (Mosaic-friendly):
x is viewed as (V, C) with C = batch*features folded into lanes, the grid
runs (column-chunks, row-tiles), and each program issues ONE MXU matmul per
hop with the 2k+1 band blocks concatenated along the contraction dim
(pack layout `_band_cat`: (nt, T, nbd*T)):

    out[t, c] = band_cat[t] @ concat(x[t-k..t+k])[, c]

K = nbd*T = 384 concatenation turns 2k+1 K=128 matmuls into one: the
corrected shape probe (benchmarks/probe_shapes.py, round-3 notes) measures
171 TF/s at (128,384)@(384,2048) vs 92 TF/s at K=N=128 shapes — the round-2
"~198 TF/s" figure was an under-iterated probe artifact (the measurement
delta sat below the relay's fetch noise).  Boundary tiles multiply
an all-zero band block (guaranteed by the packing), so index clamping needs
no masking.  The custom VJP exploits L's symmetry: the backward of a hop is
the same hop on the cotangent.  Gradients w.r.t. the Laplacian blocks are
not formed (the graph is a frozen artifact).

The full Chebyshev conv (`fused_cheby_project`) composes two hops with the
basis-split projection y = x@W0 + z1@W1 + z2@W2 + b — the elementwise
2*hop(z1) - x and the bias fuse into neighbors under XLA, so only the hops
need a kernel.  All kernels are parametric in the block-bandwidth
band_k ∈ {1, 2} (the window sizes grow to m+4k x-tiles / m+2k band rows);
wider bands or non-3D inputs fall back to the XLA path.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graphs.artifact import LevelOperator
from .spmm import spmm, spmm_band

__all__ = ["banded_hop", "fused_cheby_project", "fused_cheby_project_relu",
           "fused_conv_flat", "fused_conv_flat_dispatch", "pallas_supported"]


# measured on v5e (benchmarks/ab_conv.py, round-3 notes): the whole-level
# fori-loop strip schedule sustains only 34-64 TF/s on its hop matmuls
# (dynamic-slice loops don't pipeline), so despite its ~20% FLOP cut it
# ties/loses to the grid-pipelined group kernel; 'group' stays the default
# until the grid-scheduled strip variant lands
_FLAT_IMPL_DEFAULT = "group"


def fused_conv_flat_dispatch(op, x2, batch, W, b, **kw):
    """Deploy flat-conv entry point.  Default ('group') picks between the
    row-tile-group kernels: the COMMUTED variant (project-first, hops on
    Fout lanes) for down-convs and gr-packed outputs, the basis variant
    otherwise.  P2M_FLAT_IMPL={group,strip,window} selects the whole-level
    strip / window kernels instead for A/B measurement (both measured
    SLOWER on v5e: in-kernel dynamic-offset window reads copy at only
    0.3-0.8 TB/s); unknown values raise (a typo must not silently change
    which kernel is measured)."""
    impl = os.environ.get("P2M_FLAT_IMPL", _FLAT_IMPL_DEFAULT)
    if impl not in ("strip", "window", "group"):
        raise ValueError(
            f"P2M_FLAT_IMPL={impl!r}: expected 'strip', 'window' or 'group'")
    out_pack = kw.pop("out_pack", 1)
    if impl == "strip":
        from .pallas_strip import fused_conv_flat_strip, strip_supported
        if strip_supported(op, batch=batch, lanes=x2.shape[1] // batch,
                           fo_lanes=W.shape[1]):
            return fused_conv_flat_strip(op, x2, batch, W, b,
                                         out_pack=out_pack, **kw)
    if impl == "window":
        from .pallas_window import fused_conv_flat_window, window_supported
        if out_pack == 1 and window_supported(
                op, batch=batch, lanes=x2.shape[1] // batch):
            return fused_conv_flat_window(op, x2, batch, W, b, **kw)
    F = x2.shape[1] // batch
    Fo = W.shape[1]
    # measured on v5e (BENCH_NOTES_r3): the commuted group kernel WINS on
    # 256->128 (831 vs 916 us bound) but LOSES on out-packed 128->64 (1662
    # vs ~1456 padded basis) — its 3 separate K=F projections run at ~92
    # TF/s vs the single K=3F at ~157.  Route: commute only when the hop
    # shrink is 2x at full 128 output lanes; P2M_COMMUTE={auto,all,off}.
    commute_env = os.environ.get("P2M_COMMUTE", "auto")
    if commute_env not in ("auto", "all", "off"):
        raise ValueError(f"P2M_COMMUTE={commute_env!r}: expected auto|all|off")
    commute = (out_pack > 1 or Fo < F) and kw.get("skip") is None \
        and not kw.get("out_3d")
    if out_pack == 1 and (commute_env == "off" or (
            commute_env == "auto" and not (Fo < F and Fo >= 128))):
        commute = False
    if impl == "group" and commute and pallas_supported(
            op, jnp.zeros((1, 1, 1))) and (Fo % 128 == 0 or 128 % Fo == 0):
        W3 = W.reshape(3, F, Fo)
        Wc = jnp.concatenate([W3[0] - W3[2], W3[1], W3[2]], axis=0)
        kw2 = {k2: v for k2, v in kw.items()
               if k2 not in ("skip", "skip_w", "out_3d")}
        return fused_conv_flat_commuted(op, x2, batch, Wc, b, **kw2)
    if out_pack > 1:
        # packed output changes the result SHAPE: callers request it only
        # after flat_out_pack() said a packing kernel will run, so reaching
        # the basis kernel here is a bug, not a fallback
        raise ValueError("out_pack requested but no packing-capable kernel "
                         "was selected (see flat_out_pack)")
    return fused_conv_flat(op, x2, batch, W, b, **kw)


def flat_out_pack(op, batch: int, lanes: int, fout: int) -> int:
    """Output packing factor the deploy dispatch can honor for a flat conv
    emitting `fout` (< 128) channels: gr > 1 means the dispatched kernel
    (commuted group, or strip under P2M_FLAT_IMPL=strip) will emit
    gr-packed (128 // gr)-lane outputs (kron(I_gr, W) weights), saving the
    zero-padded hop lanes AND the downstream repack copy.  1 = emit the
    classic 128-padded layout."""
    impl = os.environ.get("P2M_FLAT_IMPL", _FLAT_IMPL_DEFAULT)
    if fout >= 128 or impl == "window" or op.kind != "band" \
            or not 1 <= op.band_k <= 2:
        return 1
    # measured on v5e (BENCH_NOTES_r3 §3): the out-packed commuted 128->64
    # conv is slower in isolation (1662 vs ~1456 us padded basis) but WINS
    # at the forward level (10.23 vs 10.60 ms) by eliminating the
    # inter-conv repack copy its packed layout makes unnecessary — so
    # packing stays on by default; P2M_COMMUTE=off disables it
    commute_env = os.environ.get("P2M_COMMUTE", "auto")
    if commute_env not in ("auto", "all", "off"):
        raise ValueError(f"P2M_COMMUTE={commute_env!r}: expected auto|all|off")
    if commute_env == "off":
        return 1
    fo_p = 1
    while fo_p < fout or 128 % fo_p:
        fo_p *= 2
    gr = 128 // fo_p
    lane_cap = int(os.environ.get(
        "P2M_STRIP_LANES" if impl == "strip" else "P2M_FUSED_LANES",
        "1024" if impl == "strip" else "2048"))
    # gr forces the batch chunk to a multiple of gr: keep the x chunk
    # within the kernel's VMEM lane budget
    if batch % gr or gr * max(lanes, fo_p) > lane_cap:
        return 1
    if impl == "strip":
        from .pallas_strip import strip_supported
        if not strip_supported(op, batch=batch, lanes=lanes, fo_lanes=fo_p):
            return 1
    return gr


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pallas_supported(op: LevelOperator, x: jax.Array) -> bool:
    # band_k in {1, 2}: kernels are parametric in the block-bandwidth (the
    # reference-exact pyramid's RCM order needs k=2 on two SMPL levels)
    return op.kind == "band" and 1 <= op.band_k <= 2 and x.ndim == 3


def _col_chunk(C: int, target: int = 4096) -> int:
    """Largest divisor of C that is a multiple of 128 and <= target; falls
    back to C itself (single chunk) when C is not 128-aligned."""
    best = None
    for c in range(128, min(C, target) + 1, 128):
        if C % c == 0:
            best = c
    return best or C


def _band_cat(band_val: jax.Array) -> jax.Array:
    """(nbd, nt, T, T) -> (nt, T, nbd*T): per row-tile, the 2k+1 band blocks
    concatenated along the contraction dim, so one hop is ONE
    (T, nbd*T) @ (nbd*T, C) MXU matmul instead of three K=128 issues
    (measured 171 vs ~92 TF/s at the deploy shapes, round-3 probe notes)."""
    nbd, nt, T, _ = band_val.shape
    return band_val.transpose(1, 2, 0, 3).reshape(nt, T, nbd * T)


def _hop_kernel_factory(nbd, m):
    """m output row-tiles per program (round-4: the ungrouped m=1 hop read
    each x tile 2k+1 times and carried one program per tile — the training
    backward, which chains hops outside the fused forward kernel, spent
    most of its time here).  Per output tile j: 2k+1 per-diagonal
    (T, T) @ (T, TC) matmuls over the shared x window refs."""
    k = nbd // 2

    def kernel(*refs):
        band_refs = refs[:m]                     # row j -> (1, T, nbd*T)
        x_refs = refs[m:m + m + 2 * k]           # tiles t*m + [-k .. m-1+k]
        out_ref = refs[-1]
        T = band_refs[0].shape[1]
        for j in range(m):
            br = band_refs[j]
            acc = jnp.dot(br[0][:, 0:T], x_refs[j][:],
                          preferred_element_type=jnp.float32)
            for d in range(1, nbd):
                acc += jnp.dot(br[0][:, d * T:(d + 1) * T], x_refs[j + d][:],
                               preferred_element_type=jnp.float32)
            out_ref[j * T:(j + 1) * T, :] = acc.astype(out_ref.dtype)
    return kernel


def _hop_call(band_val: jax.Array, x: jax.Array, T: int) -> jax.Array:
    """band_val (2k+1, nt, T, T); x (V, B, F); returns L @ x, same shape."""
    nbd, nt = band_val.shape[0], band_val.shape[1]
    k = nbd // 2
    V, B, F = x.shape
    m = _pick_m(nt, k=k)
    nt_pad = -(-nt // m) * m
    Vp = nt_pad * T
    x2 = x.reshape(V, B * F)
    if Vp != V:
        x2 = jnp.pad(x2, ((0, Vp - V), (0, 0)))
    band = band_val
    if nt_pad != nt:
        band = jnp.pad(band, ((0, 0), (0, nt_pad - nt), (0, 0), (0, 0)))
    C = B * F
    # 2048-lane chunks: the m-grouped window (m+2k x refs, double-buffered)
    # plus the m-tile output must fit VMEM alongside the surrounding
    # program's live set (4096-lane chunks OOM'd VMEM at the finest level
    # in the round-4 backward)
    TC = _col_chunk(C, target=2048)
    ncc = C // TC

    def bspec(j):
        return pl.BlockSpec(
            (1, T, nbd * T),
            lambda c, t: (jnp.clip(t * m + j, 0, nt_pad - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def xspec(shift):
        return pl.BlockSpec(
            (T, TC),
            lambda c, t: (jnp.clip(t * m + shift, 0, nt_pad - 1), c),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        _hop_kernel_factory(nbd, m),
        grid=(ncc, nt_pad // m),
        in_specs=[bspec(j) for j in range(m)]
        + [xspec(s) for s in range(-k, m + k)],
        out_specs=pl.BlockSpec((m * T, TC), lambda c, t: (t, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vp, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*([_band_cat(band.astype(x.dtype))] * m + [x2] * (m + 2 * k)))
    return out[:V].reshape(V, B, F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hop(T: int, band_val: jax.Array, x: jax.Array) -> jax.Array:
    return _hop_call(band_val, x, T)


def _hop_fwd(T, band_val, x):
    return _hop_call(band_val, x, T), (band_val,)


def _hop_bwd(T, res, g):
    (band_val,) = res
    # L is symmetric: VJP of x -> Lx is g -> Lg.  No gradient to the graph.
    return jnp.zeros_like(band_val), _hop_call(band_val, g, T)


_hop.defvjp(_hop_fwd, _hop_bwd)


def banded_hop(op: LevelOperator, x: jax.Array) -> jax.Array:
    """z = L @ x via the Pallas banded kernel (XLA fallback if unsupported)."""
    if not pallas_supported(op, x):
        return spmm_band(op, x) if op.kind == "band" else spmm(op, x)
    return _hop(op.block_size, op.band_val, x)


# ---------------------------------------------------------------------------
# commuted deploy kernel: project first, hop on OUTPUT-width lanes
# ---------------------------------------------------------------------------
#
# L acts on the vertex axis and W on the feature axis, so they commute:
#     y = x W0 + (Lx) W1 + (2L(Lx) - x) W2
#       = x (W0 - W2) + L( x W1 + 2 L (x W2) )
# When Fout < Fin this moves BOTH hops from Fin-wide to Fout-wide lanes —
# the 256->128 / 128->64 / 64->3 down-convs of the SMPL schedule cut their
# hop FLOPs 2-16x (the hop contracts a (2k+1)T-wide dense window per tile,
# ~55x the nnz-minimal work, so lane width is the only hop knob left after
# bandwidth minimization; VERDICT r2 task 1).
#
# Lane packing: Fout lanes per batch element must stay 128-aligned inside
# Mosaic's (T, BC*F) <-> (T*BC, F) reshapes, so for Fout_pad < 128 the
# caller passes gr = 128 // Fout_pad and kron(I_gr, W)-expanded weights;
# the kernel then views rows as (T*BC/gr, gr*F) and produces u/t/y in
# gr-packed 128-lane groups.  The output keeps Fout_pad lanes per batch
# element (batch-major), which downstream packed convs consume directly.

def _commuted_kernel_factory(T, BC, F, Fo, m, k=1, gr=1, relu=False):
    """m output row-tiles per program.  Window layout identical to
    _fused_kernel_factory (x refs t*m + [-2k..m-1+2k], band rows
    t*m + [-k..m-1+k]).  W ref rows: [kron(I_gr, W0-W2); kron(I_gr, W1);
    kron(I_gr, W2)] each gr*F tall, gr*Fo == 128-aligned wide."""
    nbd = 2 * k + 1
    n_band = m + 2 * k
    n_x = m + 4 * k

    def kernel(*refs):
        band_refs = refs[:n_band]
        x_refs = refs[n_band:n_band + n_x]
        w_ref, bias_ref, out_ref, u_ref, t_ref = refs[n_band + n_x:]
        dt = out_ref.dtype
        gF, gFo = gr * F, gr * Fo

        def proj(xv, s):
            # (T, BC*F) -> (T*BC/gr, gr*F) @ (gr*F, gr*Fo) -> (T, BC*Fo)
            rows = xv.reshape(T, BC // gr, gF).reshape(T * BC // gr, gF)
            w = w_ref[s * gF:(s + 1) * gF, :]
            y = jnp.dot(rows, w, preferred_element_type=jnp.float32)
            return y.reshape(T, BC // gr, gFo).reshape(T, BC * Fo)

        xs = [r[:] for r in x_refs]   # xs[i] = tile t*m + i - 2k
        # u = x @ W2 for every tile the two chained hops reach, written to
        # scratch so the hops read STATIC windows (no VPU concat; the
        # round-3 probes measured dynamic/concat window assembly at only
        # 0.3-0.8 TB/s — it dominated the kernel)
        for i, x in enumerate(xs):
            u_ref[i * T:(i + 1) * T, :] = proj(x, 2).astype(dt)

        def hop(br, src_ref, lo):
            return jnp.dot(br[0], src_ref[lo * T:(lo + nbd) * T, :],
                           preferred_element_type=jnp.float32)

        # t = x @ W1 + 2 L u   for tiles t*m + a, a in [-k .. m-1+k]
        for a in range(-k, m + k):
            t_ref[(a + k) * T:(a + k + 1) * T, :] = (
                proj(xs[a + 2 * k], 1)
                + 2.0 * hop(band_refs[a + k], u_ref, a + k)).astype(dt)

        for j in range(m):
            acc = proj(xs[j + 2 * k], 0)              # x @ (W0 - W2)
            acc += hop(band_refs[j + k], t_ref, j)
            acc += bias_ref[0][None, :].astype(jnp.float32)
            if relu:
                acc = jnp.maximum(acc, 0.0)
            out_ref[j * T:(j + 1) * T, :] = acc.astype(dt)

    return kernel


def fused_conv_flat_commuted(op: LevelOperator, x2: jax.Array, batch: int,
                             W: jax.Array, b: jax.Array, *,
                             relu: bool = False) -> jax.Array:
    """Deploy-only commuted Chebyshev conv on the flat layout.

    x2: (Vp, batch*Fp) with Fp = x2.shape[1] // batch (128-aligned).
    W: (3*Fp, Fo_pad) basis-major [W0c=W0-W2; W1; W2], Fo_pad a divisor or
       multiple of 128 (the caller pads fout up to the nearest power-of-two
       lane quantum); bias b: (Fo_pad,).
    Returns (Vp, batch*Fo_pad) — for Fo_pad < 128 the output lanes stay
    batch-major packed (no 128-lane zero padding), which the next packed
    conv or a trailing XLA reshape consumes directly.
    No VJP: training keeps the canonical path.
    """
    T = op.block_size
    band_val = op.band_val
    nbd, nt = band_val.shape[0], band_val.shape[1]
    k = nbd // 2
    Vp, C = x2.shape
    assert Vp == nt * T, (Vp, nt, T)
    F = C // batch
    Fo = W.shape[1]
    assert W.shape[0] == 3 * F, (W.shape, F)
    assert 128 % Fo == 0 or Fo % 128 == 0, Fo
    gr = max(128 // Fo, 1)
    m = _pick_m(nt, require_divisor=True, k=k)
    lane_cap = int(os.environ.get("P2M_FUSED_LANES", "2048"))
    BC = gr
    for c in range(1, batch + 1):
        if batch % c == 0 and c % gr == 0 and c * F <= lane_cap:
            BC = c
    assert batch % BC == 0 and BC % gr == 0, (batch, BC, gr)
    ncc = batch // BC

    # kron-expand each basis block to gr-packed form; bias tiled across the
    # full lane chunk (the kernel's accumulator lives in lane form)
    if gr > 1:
        eye = jnp.eye(gr, dtype=W.dtype)
        blocks = [jnp.kron(eye, W[s * F:(s + 1) * F]) for s in range(3)]
        Wk = jnp.concatenate(blocks, axis=0)          # (3*gr*F, gr*Fo)
    else:
        Wk = W
    bk = jnp.tile(b, BC)                              # (BC*Fo,)

    def bspec(shift):
        return pl.BlockSpec(
            (1, T, nbd * T),
            lambda c, t: (jnp.clip(t * m + shift, 0, nt - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def xspec(shift):
        return pl.BlockSpec(
            (T, BC * F),
            lambda c, t: (jnp.clip(t * m + shift, 0, nt - 1), c),
            memory_space=pltpu.VMEM)

    band_in = _band_cat(band_val.astype(x2.dtype))
    in_specs = [bspec(s) for s in range(-k, m + k)]
    operands = [band_in] * (m + 2 * k)
    in_specs += [xspec(i) for i in range(-2 * k, m + 2 * k)]
    operands += [x2] * (m + 4 * k)
    in_specs.append(pl.BlockSpec((3 * gr * F, gr * Fo), lambda c, t: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(Wk.astype(x2.dtype))
    in_specs.append(pl.BlockSpec((1, BC * Fo), lambda c, t: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(bk.reshape(1, -1).astype(x2.dtype))

    return pl.pallas_call(
        _commuted_kernel_factory(T, BC, F, Fo, m, k, gr, relu),
        grid=(ncc, nt // m),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m * T, BC * Fo), lambda c, t: (t, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vp, batch * Fo), x2.dtype),
        scratch_shapes=[pltpu.VMEM(((m + 4 * k) * T, BC * Fo), x2.dtype),
                        pltpu.VMEM(((m + 2 * k) * T, BC * Fo), x2.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*operands)


# ---------------------------------------------------------------------------
# fully fused conv kernel: two hops + basis projection in one pass
# ---------------------------------------------------------------------------
#
# Per (column-chunk, row-tile-group) program, with an (m+4k)-tile halo window
# of x and (m+2k) concatenated band rows, everything stays in VMEM:
#   z1_a = band_cat[a] @ xall[a-k..a+k]          (a = t*m-k .. t*m+m-1+k)
#   z2_j = 2 * band_cat[j] @ z1all[j-k..j+k] - x_j
#   y_j  = concat(x_j, z1_j, z2_j) @ W + b       (ONE K=3F projection matmul)
# The recomputation of neighbor z1 tiles ((m+2k)/m of hop-1 FLOPs) buys
# removal of all intermediate HBM traffic: x is read (m+4k)/m times and y
# written once per conv, vs ~15 tensor movements for the unfused
# composition.  Boundary tiles multiply all-zero band blocks, so index
# clamping is safe.
#
# The in-kernel projection reshapes (T, BC*F) <-> (T*BC, F); Mosaic supports
# these only when F and Fout are lane-aligned (multiples of 128), so other
# channel shapes take the two-hop + XLA-projection path.

def _fused_kernel_factory(T, BC, F, Fout, m, k=1, relu=False,
                          skip_mode=None, Fs=0, out_3d=False,
                          keep_basis=False, in_fold=False,
                          emit_stats=False, stats_rows=0, ncc=1, ntg=1):
    """m output row-tiles per program, block-bandwidth k.  Window layout per
    program (grid index t): x refs cover tiles t*m + [-2k .. m-1+2k]
    (m+4k refs), band refs cover rows t*m + [-k .. m-1+k] (m+2k refs).
    Clamped out-of-range windows only ever multiply all-zero boundary band
    blocks, so no masking.

    Copy discipline (the round-3 probes showed VPU window assembly was ~60%
    of this kernel's runtime): z1 tiles are written straight into a VMEM
    scratch so hop-2 windows are STATIC slices (no z1 concat); hop-1 runs
    per block-diagonal — 2k+1 (T,T)@(T,C) matmuls reading the x block refs
    directly — instead of concatenating an (m+4k)-tile x window
    (P2M_HOP1=cat restores the old concatenated form for A/B).

    Optional fused residual epilogue (the reference's per-block skip,
    meshnet.py:109-115) applied AFTER the activation:
      skip_mode == "add":  out += skip tile (same lane layout as out);
      skip_mode == "proj": out += reshape(skip tile (T, BC*Fs)) @ skip_w —
        the channel-interp residual as one extra in-VMEM matmul instead of
        a separate full-tensor pass.
    out_3d writes (T, BC, Fout) blocks of a (Vp, B, Fout) output (used by
    the network's last conv so no flat->3D retiling pass is needed)."""
    nbd = 2 * k + 1
    n_band = m + 2 * k
    n_x = m + 4 * k
    hop1_cat = os.environ.get("P2M_HOP1", "diag") == "cat"

    def kernel(*refs):
        band_refs = refs[:n_band]          # (1, T, nbd*T) concatenated rows
        x_refs = refs[n_band:n_band + n_x]
        rest = list(refs[n_band + n_x:])
        skip_refs = [rest.pop(0) for _ in range(m)] if skip_mode else []
        fold_refs = ()
        if in_fold:
            # BN-fold: this conv consumes relu(x*scale + shift) computed on
            # the LOADED tiles (VPU) — the activated tensor of the previous
            # conv never exists in HBM (train-path analogue of the deploy
            # BN fold)
            fold_refs = (rest.pop(0), rest.pop(0))  # scale, shift (1, BC*F)
        w_ref, bias_ref = rest[0], rest[1]
        skip_w_ref = rest[2] if skip_mode == "proj" else None
        s_ref = s2_ref = s_acc = s2_acc = None
        if keep_basis:
            # extra outputs: the Chebyshev basis tiles (z1, z2) — the
            # training backward reuses them for the weight gradients
            out_ref, z1_out_ref, z2_out_ref, z1_ref = rest[-4:]
        elif emit_stats:
            # per-channel BatchNorm batch statistics (sum y, sum y^2)
            # accumulated in VMEM f32 scratch across the whole grid and
            # flushed at the last program — the values are already in
            # registers post-projection, so the stats passes that the
            # training path otherwise pays as separate HBM reads of y
            # (VERDICT r4 item #7) cost only 2 VPU flops/element here
            out_ref, s_ref, s2_ref, z1_ref, s_acc, s2_acc = rest[-6:]
        else:
            out_ref, z1_ref = rest[-2], rest[-1]
        if emit_stats:
            c_id, t_id = pl.program_id(0), pl.program_id(1)

            @pl.when(jnp.logical_and(c_id == 0, t_id == 0))
            def _():
                s_acc[:] = jnp.zeros_like(s_acc)
                s2_acc[:] = jnp.zeros_like(s2_acc)
        if in_fold:
            # f32 VPU transform: Mosaic's vector compare/relu path wants
            # f32 (bf16 cmpf is unsupported on this target)
            sv = fold_refs[0][0][None, :].astype(jnp.float32)
            cv = fold_refs[1][0][None, :].astype(jnp.float32)
            xs = [jnp.maximum(r[:].astype(jnp.float32) * sv + cv, 0.0)
                  .astype(out_ref.dtype) for r in x_refs]
        else:
            xs = [r[:] for r in x_refs]   # xs[i] = tile t*m + i - 2k
        dt = out_ref.dtype

        # z1 for tiles t*m + a, a in [-k .. m-1+k], stored to scratch rows
        # (a+k)*T; kept as values too (the projection reuses them)
        z1 = []
        if hop1_cat:
            xall = jnp.concatenate(xs, axis=0)        # ((m+4k)*T, C)
        for a in range(-k, m + k):
            br = band_refs[a + k]
            if hop1_cat:
                window = jax.lax.slice_in_dim(
                    xall, (a + k) * T, (a + k) * T + nbd * T, axis=0)
                acc1 = jnp.dot(br[0], window,
                               preferred_element_type=jnp.float32)
            else:
                acc1 = jnp.dot(br[0][:, 0:T], xs[a + k],
                               preferred_element_type=jnp.float32)
                for d in range(1, nbd):
                    acc1 += jnp.dot(br[0][:, d * T:(d + 1) * T], xs[a + k + d],
                                    preferred_element_type=jnp.float32)
            z1t = acc1.astype(dt)
            z1.append(z1t)
            z1_ref[(a + k) * T:(a + k + 1) * T, :] = z1t

        for j in range(m):
            br = band_refs[j + k]  # central band row for output tile j
            # hop 2: STATIC window slice from the z1 scratch
            acc2 = jnp.dot(br[0], z1_ref[j * T:(j + nbd) * T, :],
                           preferred_element_type=jnp.float32)
            z2 = (2.0 * acc2 - xs[j + 2 * k].astype(jnp.float32)).astype(dt)
            if keep_basis:
                z1_out_ref[j * T:(j + 1) * T, :] = z1[j + k]
                z2_out_ref[j * T:(j + 1) * T, :] = z2
            # basis-concat projection: ONE (T*BC, 3F) @ (3F, Fout) matmul
            def _rows(z):
                return z.reshape(T, BC, F).reshape(T * BC, F)
            xz = jnp.concatenate([_rows(xs[j + 2 * k]), _rows(z1[j + k]),
                                  _rows(z2)], axis=1)
            acc = jnp.dot(xz, w_ref[:], preferred_element_type=jnp.float32)
            acc += bias_ref[0][None, :].astype(jnp.float32)
            if emit_stats:
                # pre-activation sums over REAL vertex rows only (row pads
                # carry the bias after projection and must not pollute the
                # batch statistics)
                a3 = acc.reshape(T, BC, Fout)
                row0 = (pl.program_id(1) * m + j) * T
                rmask = (jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0)
                         + row0 < stats_rows).astype(jnp.float32)
                s_acc[0, :] += (a3 * rmask).sum(axis=(0, 1))
                s2_acc[0, :] += (a3 * a3 * rmask).sum(axis=(0, 1))
            if relu:  # deploy-mode: BN folded into W/b, activation in-kernel
                acc = jnp.maximum(acc, 0.0)
            if skip_mode == "add":
                acc += skip_refs[j][:].reshape(T, BC, Fout).reshape(
                    T * BC, Fout).astype(jnp.float32)
            elif skip_mode == "proj":
                s = skip_refs[j][:].reshape(T, BC, Fs).reshape(T * BC, Fs)
                acc += jnp.dot(s, skip_w_ref[:],
                               preferred_element_type=jnp.float32)
            if out_3d:
                out_ref[j * T:(j + 1) * T] = acc.astype(dt).reshape(T, BC, Fout)
            else:
                out_ref[j * T:(j + 1) * T, :] = (
                    acc.astype(dt).reshape(T, BC, Fout).reshape(T, BC * Fout)
                )

        if emit_stats:
            @pl.when(jnp.logical_and(c_id == ncc - 1, t_id == ntg - 1))
            def _():
                s_ref[:] = s_acc[:]
                s2_ref[:] = s2_acc[:]

    return kernel


def _pick_m(nt: int, require_divisor: bool = False, k: int = 1) -> int:
    """Output row-tiles per program: prefer a divisor of nt (pack_pyramid
    pads band tile counts to multiples of the group) so no runtime row
    padding is ever needed; the (m+2k)/m halo-recompute overhead shrinks
    with m.  m=8 default for every k (round-4 A/B, benchmarks/ab_m.py:
    V=6890 128->128 1378 vs 1669 us, V=1849 commuted 773 vs 853; levels
    whose tile count m does not divide fall back to 4 automatically)."""
    m_target = int(os.environ.get("P2M_FUSED_M", "8"))
    min_ratio = int(os.environ.get("P2M_FUSED_MIN_NT_RATIO", "1"))
    for cand in (m_target, m_target // 2, m_target // 4, 2):
        if cand >= 2 and nt % cand == 0 and nt >= min_ratio * cand:
            return cand
    if not require_divisor:
        for cand in (m_target, m_target // 2, 2):
            if cand >= 2 and nt >= 2 * cand:
                return cand
    return 1


def fused_conv_flat(op: LevelOperator, x2: jax.Array, batch: int,
                    W: jax.Array, b: jax.Array, *, relu: bool = False,
                    skip: jax.Array | None = None,
                    skip_w: jax.Array | None = None,
                    out_3d: bool = False) -> jax.Array:
    """Deploy-only fused Chebyshev conv on the flat (Vp, batch*Fp) layout.

    The inference pipeline keeps band levels 2-D the whole way (Vp rows are
    the pack-time padded tile count, lanes are batch-major feature chunks),
    so XLA never re-tiles (V, B, F) <-> (V, B*F) between convs.  All lane
    counts must already be 128-aligned (the caller zero-pads weights, and
    upstream convs emit zero-padded lanes).

    skip: optional residual (Vp, batch*Fs) added after the activation;
      skip_w None -> plain add (Fs == Fout), else the channel-interp
      residual matmul with skip_w (Fs, Fout) fused into the epilogue.
    out_3d: return (Vp, batch, Fout) written directly by the kernel.
    No VJP: training uses the 3-D path with BatchNorm.
    """
    T = op.block_size
    band_val = op.band_val
    nbd, nt = band_val.shape[0], band_val.shape[1]
    k = nbd // 2
    Vp, C = x2.shape
    assert Vp == nt * T, (Vp, nt, T)
    F = C // batch
    Fout = W.shape[1]
    assert W.shape[0] == 3 * F, (W.shape, F)
    m = _pick_m(nt, require_divisor=True, k=k)
    lane_cap = int(os.environ.get("P2M_FUSED_LANES", "2048"))
    BC = 1
    for c in range(1, batch + 1):
        if batch % c == 0 and c * max(F, Fout) <= lane_cap:
            BC = c
    ncc = batch // BC

    def bspec(shift):
        return pl.BlockSpec(
            (1, T, nbd * T),
            lambda c, t: (jnp.clip(t * m + shift, 0, nt - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def xspec(shift):
        return pl.BlockSpec(
            (T, BC * F),
            lambda c, t: (jnp.clip(t * m + shift, 0, nt - 1), c),
            memory_space=pltpu.VMEM)

    band_in = _band_cat(band_val.astype(x2.dtype))
    in_specs = [bspec(s) for s in range(-k, m + k)]
    operands = [band_in] * (m + 2 * k)
    in_specs += [xspec(i) for i in range(-2 * k, m + 2 * k)]
    operands += [x2] * (m + 4 * k)

    skip_mode = None
    Fs = 0
    if skip is not None:
        Fs = skip.shape[1] // batch
        skip_mode = "add" if skip_w is None else "proj"
        if skip_mode == "add" and Fs != Fout:
            raise ValueError(f"plain skip-add needs Fs == Fout ({Fs} vs {Fout})")
        for j in range(m):
            in_specs.append(pl.BlockSpec(
                (T, BC * Fs),
                (lambda j: lambda c, t: (t * m + j, c))(j),
                memory_space=pltpu.VMEM))
            operands.append(skip)

    in_specs.append(pl.BlockSpec((3 * F, Fout), lambda c, t: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(W.astype(x2.dtype))
    in_specs.append(pl.BlockSpec((1, Fout), lambda c, t: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(b.reshape(1, -1).astype(x2.dtype))
    if skip_mode == "proj":
        in_specs.append(pl.BlockSpec((Fs, Fout), lambda c, t: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(skip_w.astype(x2.dtype))

    if out_3d:
        out_specs = pl.BlockSpec((m * T, BC, Fout), lambda c, t: (t, c, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Vp, batch, Fout), x2.dtype)
    else:
        out_specs = pl.BlockSpec((m * T, BC * Fout), lambda c, t: (t, c),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Vp, batch * Fout), x2.dtype)

    return pl.pallas_call(
        _fused_kernel_factory(T, BC, F, Fout, m, k, relu,
                              skip_mode=skip_mode, Fs=Fs, out_3d=out_3d),
        grid=(ncc, nt // m),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM(((m + 2 * k) * T, BC * F), x2.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*operands)


def _bwd_kernel_factory(T, BC, Fout, F, m, k, ncc, ntg, in_fold=False):
    """Fully fused conv backward: per program, the cotangent's Chebyshev
    basis (g1 = Lg, h2 = 2L(Lg) - g — the forward recurrence applied to g)
    feeds BOTH the input gradient (dx = g Wt0 + g1 Wt1 + h2 Wt2, Wt = W^T
    blocks) and the weight/bias gradients, which accumulate in VMEM
    scratch across the whole grid and flush once at the last program —
    the XLA formulation materialized a (V*B, 3*Fout) basis concat and two
    ~1 GB/conv gradient matmul streams per finest-level conv."""
    nbd = 2 * k + 1
    n_band = m + 2 * k
    n_x = m + 4 * k

    def kernel(*refs):
        band_refs = refs[:n_band]
        g_refs = refs[n_band:n_band + n_x]
        x_refs = refs[n_band + n_x:n_band + n_x + m]
        pos = n_band + n_x + m
        if in_fold:
            s_ref, c_ref = refs[pos], refs[pos + 1]
            pos += 2
        wt_ref = refs[pos]
        if in_fold:
            (dx_ref, dw_ref, db_ref, ds_ref, dc_ref,
             g1_ref, dw_acc, db_acc, ds_acc, dc_acc) = refs[-10:]
        else:
            dx_ref, dw_ref, db_ref, g1_ref, dw_acc, db_acc = refs[-6:]
        dt = dx_ref.dtype
        gs = [r[:] for r in g_refs]

        c_id, t_id = pl.program_id(0), pl.program_id(1)

        @pl.when(jnp.logical_and(c_id == 0, t_id == 0))
        def _():
            dw_acc[:] = jnp.zeros_like(dw_acc)
            db_acc[:] = jnp.zeros_like(db_acc)
            if in_fold:
                ds_acc[:] = jnp.zeros_like(ds_acc)
                dc_acc[:] = jnp.zeros_like(dc_acc)

        g1 = []
        for a in range(-k, m + k):
            br = band_refs[a + k]
            acc1 = jnp.dot(br[0][:, 0:T], gs[a + k],
                           preferred_element_type=jnp.float32)
            for d in range(1, nbd):
                acc1 += jnp.dot(br[0][:, d * T:(d + 1) * T], gs[a + k + d],
                                preferred_element_type=jnp.float32)
            g1t = acc1.astype(dt)
            g1.append(g1t)
            g1_ref[(a + k) * T:(a + k + 1) * T, :] = g1t

        def _rows(z, f):
            return z.reshape(T, BC, f).reshape(T * BC, f)

        if in_fold:
            sv = s_ref[0][None, :].astype(jnp.float32)
            cv = c_ref[0][None, :].astype(jnp.float32)

        for j in range(m):
            br = band_refs[j + k]
            acc2 = jnp.dot(br[0], g1_ref[j * T:(j + nbd) * T, :],
                           preferred_element_type=jnp.float32)
            h2 = (2.0 * acc2 - gs[j + 2 * k].astype(jnp.float32)).astype(dt)
            gr = _rows(gs[j + 2 * k], Fout)
            g1r = _rows(g1[j + k], Fout)
            h2r = _rows(h2, Fout)
            # dx_j = [g, g1, h2] @ [W0^T; W1^T; W2^T] — one K=3*Fout matmul
            gb = jnp.concatenate([gr, g1r, h2r], axis=1)
            acc = jnp.dot(gb, wt_ref[:], preferred_element_type=jnp.float32)
            x_raw = x_refs[j][:]
            if in_fold:
                # conv input was u = relu(x*s + c): dW uses u, and the
                # input cotangent chains dt = du * 1[t>0], dx = dt * s,
                # with the BN-affine grads accumulated per channel
                t_pre = x_raw.astype(jnp.float32) * sv + cv
                mask = (t_pre > 0.0).astype(jnp.float32)
                u = jnp.maximum(t_pre, 0.0).astype(dt)
                xr = _rows(u, F)
                du = acc.reshape(T, BC * F)             # d wrt u, f32
                dtv = du * mask
                dx_ref[j * T:(j + 1) * T, :] = (dtv * sv.astype(
                    jnp.float32)).astype(dt)
                ds_acc[0, :] += (dtv * x_raw.astype(jnp.float32)).reshape(
                    T * BC, F).sum(axis=0)
                dc_acc[0, :] += dtv.reshape(T * BC, F).sum(axis=0)
            else:
                xr = _rows(x_raw, F)
                dx_ref[j * T:(j + 1) * T, :] = (
                    acc.astype(dt).reshape(T, BC, F).reshape(T, BC * F))
            # dW accumulation: u^T @ [g, g1, h2] -> (F, 3*Fout) f32
            dw_acc[:, :] += jnp.dot(xr.T, gb,
                                    preferred_element_type=jnp.float32)
            db_acc[0, :] += gr.astype(jnp.float32).sum(axis=0)

        @pl.when(jnp.logical_and(c_id == ncc - 1, t_id == ntg - 1))
        def _():
            dw_ref[:] = dw_acc[:]
            db_ref[:] = db_acc[:]
            if in_fold:
                ds_ref[:] = ds_acc[:]
                dc_ref[:] = dc_acc[:]

    return kernel


def _fused_bwd_call(band_val, g, x, W, T, in_fold=None):
    """Fused backward launch: returns (gx (V,B,F), dW (3F,Fout) f32-cast,
    db (Fout,)).  g (V,B,Fout) cotangent, x (V,B,F) saved input, W the
    canonical basis-major (3F, Fout) weight."""
    nbd, nt = band_val.shape[0], band_val.shape[1]
    k = nbd // 2
    V, B, F = x.shape
    Fout = g.shape[-1]
    m = _pick_m(nt, k=k)
    nt_pad = -(-nt // m) * m
    Vp = nt_pad * T
    g2 = g.reshape(V, B * Fout)
    x2 = x.reshape(V, B * F)
    if Vp != V:
        g2 = jnp.pad(g2, ((0, Vp - V), (0, 0)))
        x2 = jnp.pad(x2, ((0, Vp - V), (0, 0)))
    band = band_val
    if nt_pad != nt:
        band = jnp.pad(band, ((0, 0), (0, nt_pad - nt), (0, 0), (0, 0)))
    lane_cap = int(os.environ.get("P2M_FUSED_LANES", "2048"))
    BC = 1
    for c in range(1, B + 1):
        if B % c == 0 and c * max(F, Fout) <= lane_cap:
            BC = c
    ncc = B // BC
    ntg = nt_pad // m
    Wb = W.astype(x.dtype)
    Wt = jnp.concatenate(
        [Wb[:F].T, Wb[F:2 * F].T, Wb[2 * F:].T], axis=0)  # (3*Fout, F)

    def bspec(shift):
        return pl.BlockSpec(
            (1, T, nbd * T),
            lambda c, t: (jnp.clip(t * m + shift, 0, nt_pad - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def gspec(shift):
        return pl.BlockSpec(
            (T, BC * Fout),
            lambda c, t: (jnp.clip(t * m + shift, 0, nt_pad - 1), c),
            memory_space=pltpu.VMEM)

    def xspec(j):
        return pl.BlockSpec(
            (T, BC * F), (lambda j: lambda c, t: (t * m + j, c))(j),
            memory_space=pltpu.VMEM)

    in_specs = [bspec(s) for s in range(-k, m + k)]
    operands = [_band_cat(band.astype(x.dtype))] * (m + 2 * k)
    in_specs += [gspec(i) for i in range(-2 * k, m + 2 * k)]
    operands += [g2] * (m + 4 * k)
    in_specs += [xspec(j) for j in range(m)]
    operands += [x2] * m
    if in_fold is not None:
        sc, sh = in_fold
        vecspec = pl.BlockSpec((1, BC * F), lambda c, t: (0, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [vecspec, vecspec]
        operands += [jnp.tile(sc, BC).reshape(1, -1).astype(x.dtype),
                     jnp.tile(sh, BC).reshape(1, -1).astype(x.dtype)]
    in_specs.append(pl.BlockSpec((3 * Fout, F), lambda c, t: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(Wt)

    vec_out_spec = pl.BlockSpec((1, F), lambda c, t: (0, 0),
                                memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((m * T, BC * F), lambda c, t: (t, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((F, 3 * Fout), lambda c, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Fout), lambda c, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Vp, B * F), x.dtype),
        jax.ShapeDtypeStruct((F, 3 * Fout), jnp.float32),
        jax.ShapeDtypeStruct((1, Fout), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM(((m + 2 * k) * T, BC * Fout), x.dtype),
        pltpu.VMEM((F, 3 * Fout), jnp.float32),
        pltpu.VMEM((1, Fout), jnp.float32),
    ]
    if in_fold is not None:
        out_specs += [vec_out_spec, vec_out_spec]
        out_shape += [jax.ShapeDtypeStruct((1, F), jnp.float32)] * 2
        scratch += [pltpu.VMEM((1, F), jnp.float32)] * 2

    outs = pl.pallas_call(
        _bwd_kernel_factory(T, BC, Fout, F, m, k, ncc, ntg,
                            in_fold=in_fold is not None),
        grid=(ncc, ntg),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*operands)
    dx, dW_cf, db2 = outs[:3]
    gx = dx[:V].reshape(V, B, F)
    dW_full = dW_cf.reshape(F, 3, Fout).transpose(1, 0, 2).reshape(
        3 * F, Fout)
    if in_fold is not None:
        ds2, dc2 = outs[3:]
        return gx, dW_full, db2[0], ds2[0], dc2[0]
    return gx, dW_full, db2[0]


def _fused_call(band_val, x, W, b, T, relu=False, keep_basis=False,
                in_fold=None, emit_stats=False):
    nbd, nt = band_val.shape[0], band_val.shape[1]
    k = nbd // 2
    V, B, F = x.shape
    Fout = W.shape[1]
    # m output row-tiles per program: the (m+4k)/m halo read amplification
    # drops from 5x (m=1) to 2x (m=4); larger m buys less and inflates
    # Mosaic compile time (the kernel body unrolls ~12*m matmuls)
    m = _pick_m(nt, k=k)
    nt_pad = -(-nt // m) * m
    Vp = nt_pad * T
    # batch chunk: the x window, z1 intermediates, and f32 accumulators
    # must fit VMEM; ~2048 lanes keeps the live set ~20 MB at T=128, m=8
    lane_cap = int(os.environ.get("P2M_FUSED_LANES", "2048"))
    BC = 1
    for c in range(1, B + 1):
        if B % c == 0 and c * max(F, Fout) <= lane_cap:
            BC = c
    ncc = B // BC
    x2 = x.reshape(V, B * F)
    if Vp != V:
        x2 = jnp.pad(x2, ((0, Vp - V), (0, 0)))
    band = band_val
    if nt_pad != nt:
        band = jnp.pad(band, ((0, 0), (0, nt_pad - nt), (0, 0), (0, 0)))

    def bspec(shift):
        return pl.BlockSpec(
            (1, T, nbd * T),
            lambda c, t: (jnp.clip(t * m + shift, 0, nt_pad - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def xspec(shift):
        return pl.BlockSpec(
            (T, BC * F),
            lambda c, t: (jnp.clip(t * m + shift, 0, nt_pad - 1), c),
            memory_space=pltpu.VMEM)

    band_specs = [bspec(s) for s in range(-k, m + k)]        # m+2k
    x_specs = [xspec(i) for i in range(-2 * k, m + 2 * k)]   # m+4k
    band_in = _band_cat(band.astype(x.dtype))

    out_specs = pl.BlockSpec((m * T, BC * Fout), lambda c, t: (t, c),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Vp, B * Fout), x.dtype)
    scratch = [pltpu.VMEM(((m + 2 * k) * T, BC * F), x.dtype)]
    if keep_basis:
        basis_spec = pl.BlockSpec((m * T, BC * F), lambda c, t: (t, c),
                                  memory_space=pltpu.VMEM)
        basis_shape = jax.ShapeDtypeStruct((Vp, B * F), x.dtype)
        out_specs = (out_specs, basis_spec, basis_spec)
        out_shape = (out_shape, basis_shape, basis_shape)
    elif emit_stats:
        vec_spec = pl.BlockSpec((1, Fout), lambda c, t: (0, 0),
                                memory_space=pltpu.VMEM)
        vec_shape = jax.ShapeDtypeStruct((1, Fout), jnp.float32)
        out_specs = (out_specs, vec_spec, vec_spec)
        out_shape = (out_shape, vec_shape, vec_shape)
        # z1 window scratch must stay LAST-but-one in the kernel's rest[]
        # unpack; stats accumulators follow it
        scratch = scratch + [pltpu.VMEM((1, Fout), jnp.float32)] * 2
    fold_specs, fold_ops = [], []
    if in_fold is not None:
        sc, sh = in_fold
        vecspec = pl.BlockSpec((1, BC * F), lambda c, t: (0, 0),
                               memory_space=pltpu.VMEM)
        fold_specs = [vecspec, vecspec]
        fold_ops = [jnp.tile(sc, BC).reshape(1, -1).astype(x.dtype),
                    jnp.tile(sh, BC).reshape(1, -1).astype(x.dtype)]
    out = pl.pallas_call(
        _fused_kernel_factory(T, BC, F, Fout, m, k, relu,
                              keep_basis=keep_basis,
                              in_fold=in_fold is not None,
                              emit_stats=emit_stats, stats_rows=V,
                              ncc=ncc, ntg=nt_pad // m),
        grid=(ncc, nt_pad // m),
        in_specs=band_specs + x_specs + fold_specs + [
            pl.BlockSpec((3 * F, Fout), lambda c, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fout), lambda c, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*([band_in] * (m + 2 * k) + [x2] * (m + 4 * k) + fold_ops
        + [W.astype(x.dtype), b.reshape(1, -1).astype(x.dtype)]))
    if keep_basis:
        y, z1, z2 = out
        return (y[:V].reshape(V, B, Fout), z1[:V].reshape(V, B, F),
                z2[:V].reshape(V, B, F))
    if emit_stats:
        y, s, s2 = out
        return y[:V].reshape(V, B, Fout), s[0], s2[0]
    return out[:V].reshape(V, B, Fout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(T, band_val, x, W, b):
    return _fused_call(band_val, x, W, b, T)


def _fused_fwd(T, band_val, x, W, b):
    return _fused_call(band_val, x, W, b, T), (band_val, x, W)


def fused_cheby_project_relu(op, x, W, b):
    """Inference-only fused conv + in-kernel ReLU (no VJP; BN pre-folded
    into W/b by models.fold.fold_bn_variables).  Falls back to
    relu(fused_cheby_project) off the Pallas path."""
    F = x.shape[-1]
    Fout = W.shape[1]
    if pallas_supported(op, x) and _fused_enabled():
        Fp, Fop = _pad128(F), _pad128(Fout)
        if Fp != F or Fop != Fout:
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, Fp - F))) if Fp != F else x
            Wp = W.reshape(3, F, Fout)
            Wp = jnp.pad(Wp, ((0, 0), (0, Fp - F), (0, Fop - Fout)))
            bp = jnp.pad(b, (0, Fop - Fout))
            y = _fused_call(op.band_val, xp, Wp.reshape(3 * Fp, Fop), bp,
                            op.block_size, relu=True)
            return y[..., :Fout]
        return _fused_call(op.band_val, x, W, b, op.block_size, relu=True)
    return jnp.maximum(fused_cheby_project(op, x, W, b), 0.0)


def _fused_bwd(T, res, g):
    # Round-4 rewrite (benchmarks/profile_train.py measured the backward at
    # ~98 ms/batch64 — the ENTIRE train-step overhang over a 17 ms
    # forward).  Two structural fixes over the naive VJP:
    #
    #   1. NO basis recompute.  L is symmetric, so every z1/z2 term folds
    #      onto hops of the COTANGENT instead:
    #        y  = x W0 + (Lx) W1 + (2L^2x - x) W2
    #        dW0 = x^T g          dW1 = x^T (Lg)      dW2 = 2 x^T (L^2g) - dW0
    #        gx  = g (W0-W2)^T + (Lg) W1^T + 2 (L^2g) W2^T
    #      Two hops total (g1 = Lg, g2 = L^2g), reused by BOTH the weight
    #      and input gradients — vs five hops (2 recompute + 3 chained) in
    #      the old form.
    #   2. Both gradient contractions run as ONE K=3 concatenated matmul
    #      each (the same trick as the forward's basis projection), with
    #      bf16 operands and f32 MXU accumulation — no casted (V*B, F)
    #      activation copies.
    band_val, x, W = res
    V, B, F = x.shape
    Fout = W.shape[1]
    bwd_env = os.environ.get("P2M_BWD_FUSED", "1")
    if bwd_env not in ("0", "1"):
        raise ValueError(f"P2M_BWD_FUSED={bwd_env!r}: expected 0|1")
    if bwd_env == "1":
        # fully fused backward kernel: hops + dx + in-kernel dW/db
        # accumulation in one pass (see _bwd_kernel_factory); P2M_BWD_FUSED=0
        # selects the XLA formulation below for A/B
        gx, dW_full, db = _fused_bwd_call(band_val, g, x, W, T)
        return (jnp.zeros_like(band_val), gx, dW_full.astype(W.dtype),
                db.astype(W.dtype))
    Wb = W.astype(x.dtype)
    W0, W1, W2 = Wb[:F], Wb[F:2 * F], Wb[2 * F:]

    # The cotangent obeys the SAME Chebyshev recurrence as the forward:
    # with g1 = Lg and g2h = L^2 g,
    #   gx  = g (W0-W2)^T + g1 W1^T + 2 g2h W2^T
    #   dW0 = x^T g    dW1 = x^T g1    dW2 = 2 x^T g2h - dW0
    # Two grouped hops, shared by the weight AND input gradients, plus one
    # K=3-concatenated matmul for each of dW and gx.
    # (Negative result, measured on chip: routing the dx path through the
    # forward fused kernel with keep_basis=True — mathematically identical,
    # one kernel instead of two hops + one matmul — measured grad_eval 87.1
    # vs 74.6 ms/batch64; the 3-output kernel schedules worse than the
    # plain grouped hops.  The keep_basis plumbing remains for A/B.)
    g1 = _hop_call(band_val, g, T)       # L g
    g2h = _hop_call(band_val, g1, T)     # L^2 g
    gcat = jnp.concatenate(
        [g.reshape(-1, Fout), g1.reshape(-1, Fout), g2h.reshape(-1, Fout)],
        axis=1)                           # (V*B, 3*Fout)

    # dW blocks from one (F, V*B) @ (V*B, 3*Fout) matmul
    dWcat = jnp.dot(x.reshape(-1, F).T, gcat,
                    preferred_element_type=jnp.float32)
    dW0 = dWcat[:, :Fout]
    dW1 = dWcat[:, Fout:2 * Fout]
    dW2 = 2.0 * dWcat[:, 2 * Fout:] - dW0
    dW_full = jnp.concatenate([dW0, dW1, dW2], axis=0).astype(W.dtype)
    db = g.reshape(-1, Fout).astype(jnp.float32).sum(axis=0).astype(W.dtype)

    # gx from one (V*B, 3*Fout) @ (3*Fout, F) matmul
    Wstack = jnp.concatenate([(W0 - W2).T, W1.T, 2.0 * W2.T], axis=0)
    gx = jnp.dot(gcat, Wstack, preferred_element_type=jnp.float32)
    return (jnp.zeros_like(band_val), gx.reshape(V, B, F).astype(x.dtype),
            dW_full, db)


_fused.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_fold(T, band_val, x, W, b, scale, shift):
    """Conv with the PREVIOUS conv's BatchNorm-apply + ReLU folded into the
    input read: computes conv(relu(x*scale + shift)) without ever
    materializing the activated tensor (the training analogue of the
    deploy-time BN fold).  scale/shift are per-channel vectors; their
    cotangents (and thus the BN gamma/beta/batch-stat gradients, via the
    XLA ops that produced them) flow through this VJP."""
    return _fused_call(band_val, x, W, b, T, in_fold=(scale, shift))


def _fused_fold_fwd(T, band_val, x, W, b, scale, shift):
    y = _fused_call(band_val, x, W, b, T, in_fold=(scale, shift))
    return y, (band_val, x, W, scale, shift)


def _fused_fold_bwd(T, res, g):
    band_val, x, W, scale, shift = res
    gx, dW_full, db, ds, dc = _fused_bwd_call(
        band_val, g, x, W, T, in_fold=(scale.astype(x.dtype),
                                       shift.astype(x.dtype)))
    return (jnp.zeros_like(band_val), gx, dW_full.astype(W.dtype),
            db.astype(W.dtype), ds.astype(scale.dtype),
            dc.astype(shift.dtype))


_fused_fold.defvjp(_fused_fold_fwd, _fused_fold_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_fold_stats(T, band_val, x, W, b, scale, shift):
    """Fold-consuming conv (input = relu(x*scale + shift), applied on the
    loaded tiles) that ALSO emits its own BN batch-stat sums — the fold
    chain's follow-up convs then get kernel statistics too."""
    return _fused_call(band_val, x, W, b, T, in_fold=(scale, shift),
                       emit_stats=True)


def _fused_fold_stats_fwd(T, band_val, x, W, b, scale, shift):
    y, s, s2 = _fused_call(band_val, x, W, b, T, in_fold=(scale, shift),
                           emit_stats=True)
    return (y, s, s2), (band_val, x, W, scale, shift, y)


def _fused_fold_stats_bwd(T, res, cts):
    band_val, x, W, scale, shift, y = res
    gy, gs, gs2 = cts
    g = (gy.astype(jnp.float32)
         + gs[None, None, :]
         + 2.0 * y.astype(jnp.float32) * gs2[None, None, :]).astype(y.dtype)
    gx, dW_full, db, ds, dc = _fused_bwd_call(
        band_val, g, x, W, T, in_fold=(scale.astype(x.dtype),
                                       shift.astype(x.dtype)))
    return (jnp.zeros_like(band_val), gx, dW_full.astype(W.dtype),
            db.astype(W.dtype), ds.astype(scale.dtype),
            dc.astype(shift.dtype))


_fused_fold_stats.defvjp(_fused_fold_stats_fwd, _fused_fold_stats_bwd)


def fused_cheby_project_folded_stats(op: LevelOperator, x_raw: jax.Array,
                                     W: jax.Array, b: jax.Array,
                                     scale: jax.Array, shift: jax.Array):
    """fused_cheby_project_folded + kernel-emitted BN batch-stat sums:
    returns (y, sum_y, sum_y2) over the real V*B rows.  Pad lanes carry
    zero scale/shift and zero weights, so their sums are exactly zero and
    slicing is safe."""
    F = x_raw.shape[-1]
    Fout = W.shape[1]
    Fp, Fop = _pad128(F), _pad128(Fout)
    if Fp != F or Fop != Fout:
        xp = jnp.pad(x_raw, ((0, 0), (0, 0), (0, Fp - F))) if Fp != F else x_raw
        Wp = W.reshape(3, F, Fout)
        Wp = jnp.pad(Wp, ((0, 0), (0, Fp - F), (0, Fop - Fout)))
        bp = jnp.pad(b, (0, Fop - Fout))
        sp = jnp.pad(scale, (0, Fp - F))
        cp = jnp.pad(shift, (0, Fp - F))
        y, s, s2 = _fused_fold_stats(op.block_size, op.band_val, xp,
                                     Wp.reshape(3 * Fp, Fop), bp, sp, cp)
        return y[..., :Fout], s[:Fout], s2[:Fout]
    return _fused_fold_stats(op.block_size, op.band_val, x_raw, W, b,
                             scale, shift)


def fused_cheby_project_folded(op: LevelOperator, x_raw: jax.Array,
                               W: jax.Array, b: jax.Array,
                               scale: jax.Array, shift: jax.Array) -> jax.Array:
    """Training-path conv consuming the RAW previous-conv output plus the
    BN affine (scale, shift): y = cheby_conv(relu(x_raw*scale + shift)).
    Caller guarantees pallas support and 128-aligned channels (the MeshNet
    fold path checks)."""
    F = x_raw.shape[-1]
    Fout = W.shape[1]
    Fp, Fop = _pad128(F), _pad128(Fout)
    if Fp != F or Fop != Fout:
        xp = jnp.pad(x_raw, ((0, 0), (0, 0), (0, Fp - F))) if Fp != F else x_raw
        Wp = W.reshape(3, F, Fout)
        Wp = jnp.pad(Wp, ((0, 0), (0, Fp - F), (0, Fop - Fout)))
        bp = jnp.pad(b, (0, Fop - Fout))
        # pad scale with ZEROS so pad lanes stay zero through the transform
        sp = jnp.pad(scale, (0, Fp - F))
        cp = jnp.pad(shift, (0, Fp - F))
        y = _fused_fold(op.block_size, op.band_val, xp,
                        Wp.reshape(3 * Fp, Fop), bp, sp, cp)
        return y[..., :Fout]
    return _fused_fold(op.block_size, op.band_val, x_raw, W, b, scale, shift)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_stats(T, band_val, x, W, b):
    """Conv + in-kernel per-channel batch-stat sums: returns
    (y, sum_y (Fout,) f32, sum_y2 (Fout,) f32) with the sums taken over
    the real (unpadded) V*B rows.  The training BatchNorm computes its
    batch mean/var from these for free instead of re-reading y from HBM
    (VERDICT r4 item #7)."""
    return _fused_call(band_val, x, W, b, T, emit_stats=True)


def _fused_stats_fwd(T, band_val, x, W, b):
    y, s, s2 = _fused_call(band_val, x, W, b, T, emit_stats=True)
    # y is returned AND saved: same buffer, XLA emits no copy
    return (y, s, s2), (band_val, x, W, y)


def _fused_stats_bwd(T, res, cts):
    band_val, x, W, y = res
    gy, gs, gs2 = cts
    # d(sum y)/dy = 1, d(sum y^2)/dy = 2y: both cotangents fold into the
    # output cotangent elementwise (XLA fuses this into gy's producer),
    # then the standard fully fused backward runs once
    g = (gy.astype(jnp.float32)
         + gs[None, None, :]
         + 2.0 * y.astype(jnp.float32) * gs2[None, None, :]).astype(y.dtype)
    gx, dW_full, db = _fused_bwd_call(band_val, g, x, W, T)
    return (jnp.zeros_like(band_val), gx, dW_full.astype(W.dtype),
            db.astype(W.dtype))


_fused_stats.defvjp(_fused_stats_fwd, _fused_stats_bwd)


def fused_cheby_project_stats(op: LevelOperator, x: jax.Array,
                              W: jax.Array, b: jax.Array):
    """Training-path conv that also emits BatchNorm batch-stat sums.
    Returns (y, sum_y, sum_y2) with sums over the real V*B rows in f32.
    Caller guarantees pallas support; channels are padded to 128 lanes
    like fused_cheby_project (pad lanes produce zero sums and are
    sliced off)."""
    F = x.shape[-1]
    Fout = W.shape[1]
    Fp, Fop = _pad128(F), _pad128(Fout)
    if Fp != F or Fop != Fout:
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, Fp - F))) if Fp != F else x
        Wp = W.reshape(3, F, Fout)
        Wp = jnp.pad(Wp, ((0, 0), (0, Fp - F), (0, Fop - Fout)))
        bp = jnp.pad(b, (0, Fop - Fout))
        y, s, s2 = _fused_stats(op.block_size, op.band_val, xp,
                                Wp.reshape(3 * Fp, Fop), bp)
        return y[..., :Fout], s[:Fout], s2[:Fout]
    return _fused_stats(op.block_size, op.band_val, x, W, b)


def _fused_enabled() -> bool:
    return os.environ.get("P2M_FUSED", "1") == "1"  # A/B kill-switch


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def fused_cheby_project(
    op: LevelOperator, x: jax.Array, W: jax.Array, b: jax.Array
) -> jax.Array:
    """K=3 Chebyshev conv: [x, Lx, 2L(Lx)-x] @ W + b.

    W layout: (3*Fin, Fout) in BASIS-major blocks [W_x; W_Lx; W_cheb2] —
    note this differs from the fin-major interleave of `chebyshev_stack`;
    `models.meshnet.ChebConv` permutes its canonical weight accordingly.
    Fully fused single kernel when channel counts are lane-aligned;
    otherwise two hop kernels + XLA projections (no (V, B, 3F) stack is
    ever materialized either way).
    """
    F = x.shape[-1]
    Fout = W.shape[1]
    if pallas_supported(op, x) and _fused_enabled():
        # Mosaic's in-kernel (T, BC*F) <-> (T*BC, F) reshapes need
        # lane-aligned channels; zero-pad F/Fout to 128 multiples (the MXU
        # computes the padding for free relative to the 2 unfused hops +
        # intermediate HBM traffic this kernel replaces)
        Fp, Fop = _pad128(F), _pad128(Fout)
        if Fp != F or Fop != Fout:
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, Fp - F))) if Fp != F else x
            Wp = W.reshape(3, F, Fout)
            Wp = jnp.pad(Wp, ((0, 0), (0, Fp - F), (0, Fop - Fout)))
            bp = jnp.pad(b, (0, Fop - Fout))
            y = _fused(op.block_size, op.band_val,
                       xp, Wp.reshape(3 * Fp, Fop), bp)
            return y[..., :Fout]
        return _fused(op.block_size, op.band_val, x, W, b)
    if pallas_supported(op, x):
        z1 = banded_hop(op, x)
        z2 = 2.0 * banded_hop(op, z1) - x
    else:
        z1 = spmm(op, x)
        z2 = 2.0 * spmm(op, z1) - x
    # fp32 accumulation on the XLA fallback too (the Pallas kernels
    # accumulate in f32; bf16 activations must not lose the projection sum)
    y = (
        jnp.einsum("...f,fg->...g", x, W[:F], preferred_element_type=jnp.float32)
        + jnp.einsum("...f,fg->...g", z1, W[F:2 * F], preferred_element_type=jnp.float32)
        + jnp.einsum("...f,fg->...g", z2, W[2 * F:], preferred_element_type=jnp.float32)
    )
    return (y + b).astype(x.dtype)
