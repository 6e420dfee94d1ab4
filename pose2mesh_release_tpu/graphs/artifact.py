"""Device-ready graph operator artifacts.

This module turns the host-side scipy pyramid (`graphs.build.GraphPyramid`)
into the constant tensor pack the TPU compute path consumes.  The design is
deliberately *not* a port of the reference's `torch.sparse` Laplacians
(lib/models/meshnet.py:61-62): TPUs want dense MXU tiles and static shapes,
so each pyramid level is

  1. reordered with reverse Cuthill–McKee to concentrate the Laplacian's
     nonzeros near the diagonal (the tree ordering required by the
     reference's reshape-based pooling is replaced by explicit precomputed
     gather maps, freeing the vertex ordering for bandwidth minimization);
  2. packed as block-compressed-sparse-row (BCSR) with dense
     `block_size x block_size` tiles so SpMM becomes a short sum of dense
     MXU matmuls per row-tile — or stored fully dense for small levels
     where a single matmul is cheaper than any sparse bookkeeping;
  3. also packed as ELLPACK (fixed-width neighbor lists) as a
     gather-based fallback/verification path.

Pooling (x2 nearest upsample between levels, lib/models/meshnet.py:71-78)
and the final un-permutation to original SMPL/MANO vertex order
(lib/core/base.py:130) become single precomputed index gathers.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

import jax
import jax.numpy as jnp

from .build import GraphPyramid
from .coarsen import invert_permutation

__all__ = ["LevelOperator", "PyramidArtifact", "pack_pyramid", "save_artifact", "load_artifact"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LevelOperator:
    """One pyramid level's rescaled Laplacian in device-friendly layouts.

    Array fields are pytree leaves; `kind`/`num_vertices`/`block_size` are
    static metadata so jit specializes per level.

    kind == "dense": `dense` is the (V, V) matrix, other fields empty.
    kind == "bcsr": `blk_col[t, b]` is the column-tile index of the b-th
        nonzero block in row-tile t (padded entries point at column-tile 0
        with an all-zero `blk_val` block); `blk_val` is
        (num_row_tiles, max_blocks, block_size, block_size).
    kind == "band": strict block-banded form — RCM ordering bounds the
        matrix bandwidth, so the only nonzero blocks lie on the
        2*band_k+1 block diagonals.  `band_val[d, t]` is the (T, T) block
        at block-row t, block-column t + d - band_k (out-of-range blocks
        are zero).  SpMM then needs NO gather at all: it is a sum of
        shifted batched dense matmuls that ride the MXU directly (see
        ops.spmm.spmm_band) — the TPU-native replacement for the
        reference's torch.sparse.mm (cheby_graph_conv.py:25-28).
    Band levels additionally carry the STRIP form: `strip_val[r, j]` is
        L[r, o_t + j] for row r in h-row tile t = r // strip_h, where the
        per-tile window start o_t = strip_offset(...) centres a width-W
        window (W = strip_val.shape[1] ≈ h + 2*scalar_bandwidth, 16-lane
        aligned) on the tile.  The deploy hop then contracts only the
        columns RCM actually populates — W is set by the SCALAR bandwidth
        instead of the (2k+1)*T block window, cutting hop FLOPs up to
        (2k+1)*T/W (the round-2 verdict's mandated layout change).
    All kinds carry the ELL form (`ell_idx`, `ell_w`) for gather-based
    verification; padded ELL entries self-reference with weight 0.
    """

    dense: jax.Array
    blk_col: jax.Array
    blk_val: jax.Array
    band_val: jax.Array
    ell_idx: jax.Array
    ell_w: jax.Array
    strip_val: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 0), jnp.float32))
    kind: str = dataclasses.field(metadata=dict(static=True), default="dense")
    num_vertices: int = dataclasses.field(metadata=dict(static=True), default=0)
    block_size: int = dataclasses.field(metadata=dict(static=True), default=128)
    band_k: int = dataclasses.field(metadata=dict(static=True), default=0)
    strip_h: int = dataclasses.field(metadata=dict(static=True), default=0)
    # scalar bandwidth max|r - c| (band kind): static so kernels can trim
    # off-diagonal block matmuls to the populated columns at trace time
    band_bw: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def nnz(self) -> int:
        return int((np.asarray(self.ell_w) != 0).sum())

    @property
    def padded_vertices(self) -> int:
        """Row count of the kernel-facing operator: band levels are padded
        at pack time to a whole multiple of the Pallas row-tile group
        (zero blocks), so the deploy path can keep feature maps at this
        size and never pad/slice between convs."""
        if self.kind == "band":
            return int(self.band_val.shape[1]) * self.block_size
        return self.num_vertices


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PyramidArtifact:
    """All constants the MeshNet needs for one mesh/joint-set config.

    mesh_ops: per-level operators, finest first (SMPL: V = 12288 .. 96).
    joint_op: the joint-graph operator (dense, unrescaled Laplacian).
    up_idx: up_idx[k] maps level-(k+1) device positions to level-k device
        positions: fine[p] = coarse[up_idx[k][p]]  (len(up_idx) = levels-1).
    vertex_gather: (num_mesh_vertices,) indices into the finest level's
        device ordering restoring original SMPL/MANO vertex order.
    faces: (T, 3) triangle faces in original vertex order (for losses).
    """

    mesh_ops: Tuple[LevelOperator, ...]
    joint_op: LevelOperator
    up_idx: Tuple[jax.Array, ...]
    vertex_gather: jax.Array
    faces: jax.Array
    joint_num: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_vertices: int = dataclasses.field(metadata=dict(static=True), default=0)
    # face_inv[c]: (V, Kc) int32 — faces where vertex v appears as corner c,
    # padded with num_faces.  The face-loss VJPs turn their cotangent
    # scatter-adds into gathers over these tables (TPU scatters serialize;
    # round-4 train profile measured the face losses at ~11 ms/step of the
    # backward before this).  Empty tuple = fall back to autodiff scatter.
    face_inv: Tuple[jax.Array, ...] = ()
    # BANDED face-scatter tables (round 5): (face, corner) pairs sorted by
    # the corner vertex's 128-row device tile, padded to a fixed per-tile
    # stride W — the face-loss backward then becomes ONE precomputed 0/1
    # selector batched matmul (nt, T, W) @ (nt, W, B*3) on the MXU instead
    # of an XLA scatter-add (measured 6.3 ms/step for the loss stack).
    # face_perm: (nt*W,) int32 rows into the corner-major (3F+1)-row
    # cotangent (pad slots point at the zero row 3F); face_sel: (nt, T, W)
    # f32.  Empty arrays = fall back to the autodiff scatter.
    face_perm: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0,), jnp.int32))
    face_sel: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 0, 0), jnp.float32))

    @property
    def level_sizes(self) -> Tuple[int, ...]:
        return tuple(op.num_vertices for op in self.mesh_ops)


def _pack_ell(L: sp.csr_matrix) -> Tuple[np.ndarray, np.ndarray]:
    L = sp.csr_matrix(L)
    V = L.shape[0]
    widths = np.diff(L.indptr)
    D = max(int(widths.max()) if V else 1, 1)
    idx = np.tile(np.arange(V, dtype=np.int32)[:, None], (1, D))
    w = np.zeros((V, D), dtype=np.float32)
    for v in range(V):
        lo, hi = L.indptr[v], L.indptr[v + 1]
        n = hi - lo
        idx[v, :n] = L.indices[lo:hi]
        w[v, :n] = L.data[lo:hi]
    return idx, w


def _pack_bcsr(L: sp.csr_matrix, T: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pack a (V, V) sparse matrix into padded BCSR with T x T dense blocks."""
    L = sp.csr_matrix(L)
    V = L.shape[0]
    nt = _cdiv(V, T)
    Vp = nt * T
    if Vp != V:
        L = sp.csr_matrix((L.data, L.indices, L.indptr), shape=(V, V))
        L.resize((Vp, Vp))
    coo = L.tocoo()
    bt_row = coo.row // T
    bt_col = coo.col // T
    # nonzero block set per row tile
    blocks: Dict[int, Dict[int, np.ndarray]] = {t: {} for t in range(nt)}
    for r, c, v in zip(coo.row, coo.col, coo.data):
        d = blocks[r // T]
        ct = c // T
        if ct not in d:
            d[ct] = np.zeros((T, T), dtype=np.float32)
        d[ct][r % T, c % T] = v
    maxb = max((len(d) for d in blocks.values()), default=1)
    maxb = max(maxb, 1)
    blk_col = np.zeros((nt, maxb), dtype=np.int32)
    blk_val = np.zeros((nt, maxb, T, T), dtype=np.float32)
    for t in range(nt):
        for b, (ct, val) in enumerate(sorted(blocks[t].items())):
            blk_col[t, b] = ct
            blk_val[t, b] = val
    return blk_col, blk_val


def _pack_band(L: sp.csr_matrix, T: int) -> Tuple[np.ndarray, int]:
    """Pack a (V, V) sparse matrix into strict block-band form.

    Returns band_val (nbd, nt, T, T) with nbd = 2*band_k + 1 block
    diagonals; band_val[d, t] is the block at (t, t + d - band_k).
    """
    L = sp.csr_matrix(L)
    V = L.shape[0]
    nt = _cdiv(V, T)
    coo = L.tocoo()
    bw = int(np.abs(coo.row // T - coo.col // T).max()) if coo.nnz else 0
    band_k = bw
    # round the tile count up to a multiple of the fused kernel's row-tile
    # group with all-zero blocks: feature maps can then live at nt*T rows
    # through a whole level with zero runtime padding/slicing
    # (ops.pallas_cheby).  Wider bands prefer larger groups (m=8) since the
    # halo-recompute overhead (m+2k)/m is steeper at k=2.
    group = 8 if band_k >= 2 else 4
    if nt > group:
        nt = _cdiv(nt, group) * group
    nbd = 2 * band_k + 1
    band_val = np.zeros((nbd, nt, T, T), dtype=np.float32)
    for r, c, v in zip(coo.row, coo.col, coo.data):
        t, ct = r // T, c // T
        band_val[ct - t + band_k, t, r % T, c % T] = v
    return band_val, band_k


def strip_offset(t, h: int, W: int, Vp: int, align: int = 16):
    """Window start of h-row tile t in the strip layout: a width-W window
    centred on the tile, floor-aligned to `align` sublanes, clamped in
    bounds.  Shared by `_pack_strip` (numpy, placing entries) and the strip
    kernel (traced t, slicing x/z) — the two MUST stay identical.
    Works on Python ints and traced jnp int32 alike (`//` is floor div in
    both; `(h - W) // 2` is a compile-time constant)."""
    raw = t * h + (h - W) // 2
    o = (raw // align) * align
    if isinstance(t, (int, np.integer)):
        return min(max(o, 0), Vp - W)
    return jnp.clip(o, 0, Vp - W)


def _pack_strip(L: sp.csr_matrix, T: int, nt: int, h: int,
                align: int = 16) -> Tuple[np.ndarray, int]:
    """Pack a (V, V) sparse matrix into the strip layout.

    Returns (strip_val, h): strip_val[r, j] = L[r, o_t + j] for
    t = r // h, with per-tile offsets from `strip_offset`.  The width W is
    the smallest multiple of `align` (>= h + 2*scalar_bandwidth) covering
    every tile's nonzeros after offset alignment; rows are padded to
    Vp = nt*T (matching the band pack, so the deploy feature maps need no
    re-padding between the band and strip kernels).
    """
    L = sp.csr_matrix(L)
    Vp = nt * T
    assert Vp % h == 0, (Vp, h)
    coo = L.tocoo()
    b = int(np.abs(coo.row - coo.col).max()) if coo.nnz else 0
    W = min(-(-(h + 2 * b) // align) * align, Vp)
    n_tiles = Vp // h
    while True:
        offs = np.array([strip_offset(t, h, W, Vp, align)
                         for t in range(n_tiles)], dtype=np.int64)
        t_of = coo.row // h
        rel = coo.col - offs[t_of]
        if W >= Vp or ((rel >= 0) & (rel < W)).all():
            break
        W = min(W + align, Vp)
    strip = np.zeros((Vp, W), dtype=np.float32)
    strip[coo.row, rel] = coo.data
    return strip, h


def _make_level_op(
    L: sp.csr_matrix,
    kind: str,
    block_size: int,
    strip_h: int = 0,
) -> LevelOperator:
    L = sp.csr_matrix(L, dtype=np.float64)
    V = L.shape[0]
    ell_idx, ell_w = _pack_ell(L)
    empty = jnp.zeros((0,), jnp.float32)
    empty_i = jnp.zeros((0,), jnp.int32)
    if kind == "dense":
        dense = jnp.asarray(L.toarray(), dtype=jnp.float32)
        return LevelOperator(
            dense=dense, blk_col=empty_i, blk_val=empty, band_val=empty,
            ell_idx=jnp.asarray(ell_idx), ell_w=jnp.asarray(ell_w),
            kind="dense", num_vertices=V, block_size=block_size,
        )
    if kind == "band":
        band_val, band_k = _pack_band(L, block_size)
        coo = L.tocoo()
        bw = int(np.abs(coo.row - coo.col).max()) if coo.nnz else 0
        strip = jnp.zeros((0, 0), jnp.float32)
        h = 0
        if strip_h and band_val.shape[1] * block_size % strip_h == 0:
            strip_np, h = _pack_strip(L, block_size, band_val.shape[1],
                                      strip_h)
            strip = jnp.asarray(strip_np)
        return LevelOperator(
            dense=empty, blk_col=empty_i, blk_val=empty,
            band_val=jnp.asarray(band_val),
            ell_idx=jnp.asarray(ell_idx), ell_w=jnp.asarray(ell_w),
            strip_val=strip, strip_h=h,
            kind="band", num_vertices=V, block_size=block_size, band_k=band_k,
            band_bw=bw,
        )
    blk_col, blk_val = _pack_bcsr(L, block_size)
    return LevelOperator(
        dense=empty, blk_col=jnp.asarray(blk_col), blk_val=jnp.asarray(blk_val),
        band_val=empty,
        ell_idx=jnp.asarray(ell_idx), ell_w=jnp.asarray(ell_w),
        kind="bcsr", num_vertices=V, block_size=block_size,
    )


def _min_bandwidth_order(adj: sp.csr_matrix, T: int) -> np.ndarray:
    """Bandwidth-minimizing vertex order.

    The SCALAR bandwidth b sets the strip kernels' hop window width
    (W ≈ h + 2b, `_pack_strip`), so every saved unit of b cuts hop FLOPs
    directly — not just the band_k block count.  Candidates tried, best b
    kept (deterministic): plain RCM; RCM re-seeded from a spectral
    (Fiedler-vector) relabeling — on the SMPL coarsening's level-2 mesh
    this drops b 164 -> ~127; and, only while b still exceeds one block
    row (T, the band_k=1 boundary), RCM from random relabelings."""
    adj = sp.csr_matrix(adj)

    def bw_of(order):
        P = adj[order][:, order].tocoo()
        return int(np.abs(P.row - P.col).max()) if P.nnz else 0

    def rcm_from(relab):
        sub = adj[relab][:, relab]
        r = np.asarray(reverse_cuthill_mckee(sub, symmetric_mode=True),
                       dtype=np.int64)
        return relab[r]

    best = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True),
                      dtype=np.int64)
    best_bw = bw_of(best)
    try:
        from scipy.sparse.linalg import eigsh
        deg = np.asarray(adj.sum(axis=1)).ravel()
        lap = sp.diags(deg) - adj.astype(np.float64)
        vals, vecs = eigsh(lap, k=2, which="SM", maxiter=5000)
        fiedler = vecs[:, np.argsort(vals)[1]]
        cand = rcm_from(np.argsort(fiedler))
        bw = bw_of(cand)
        if bw < best_bw:
            best, best_bw = cand, bw
    except (sp.linalg.ArpackError, ValueError) as e:
        # eigsh non-convergence / bad small-graph shapes only: RCM
        # candidates still stand, but say so — a silently skipped spectral
        # candidate degrades bandwidth (and strip-kernel perf) downstream
        import warnings
        warnings.warn(f"spectral reorder candidate skipped: {e!r}")
    if best_bw > T:
        rng = np.random.default_rng(0)
        for _ in range(16):
            cand = rcm_from(rng.permutation(adj.shape[0]))
            bw = bw_of(cand)
            if bw < best_bw:
                best, best_bw = cand, bw
            if best_bw <= T:
                break
    return best


def pack_pyramid(
    pyr: GraphPyramid,
    faces: Optional[np.ndarray] = None,
    *,
    ordering: str = "rcm",
    block_size: int = 128,
    dense_threshold: int = 768,
    sparse_kind: str = "band",
    strip_h: int = 128,
) -> PyramidArtifact:
    """Pack a host pyramid into the device artifact.

    ordering: "rcm" applies per-level reverse Cuthill–McKee on top of the
        tree order (bandwidth-minimizing, the band/BCSR-friendly default);
        "tree" keeps the reference's binary-tree order.
    dense_threshold: levels with V <= threshold are stored dense (a single
        MXU matmul beats sparse bookkeeping at these sizes).
    sparse_kind: layout for levels above the threshold: "band" (strict
        block-banded, gather-free shifted matmuls — requires RCM) or
        "bcsr" (general block-sparse).
    strip_h: row-tile height of the band levels' strip form (0 disables);
        the deploy strip kernel's hop window is W ≈ strip_h + 2*bandwidth.

    Fake-vertex elimination (rcm mode): the binary-tree padding vertices of
    the reference pyramid (39% of rows at the finest SMPL level) are
    isolated in every level's graph and only ever touched by elementwise
    ops, so their activations never reach a real vertex; all inter-level
    movement here is via precomputed gathers, so rcm-mode levels store REAL
    vertices only — except the coarsest mesh level, whose padded tree
    layout is visible to checkpoints through the fc layer's output size
    (lib/models/meshnet.py:36-37) and is kept bit-compatible.
    """
    n_levels = len(pyr.mesh_laplacians)
    real_sizes = pyr.real_sizes
    if real_sizes is None:  # legacy pyramids: fakes are the isolated slots
        real_sizes = []
        for k in range(n_levels):
            deg = np.asarray(pyr.mesh_adjacencies[k].sum(axis=0)).ravel()
            order_k = pyr.orders[k]
            real = order_k[np.flatnonzero(deg > 0)]
            real_sizes.append(int(real.max()) + 1 if len(real) else 0)

    # layouts[k][p] = padded-tree slot stored at device position p
    layouts: List[np.ndarray] = []
    for k in range(n_levels):
        P = pyr.mesh_laplacians[k].shape[0]
        drop_fakes = ordering == "rcm" and k < n_levels - 1
        if drop_fakes:
            keep = np.flatnonzero(np.asarray(pyr.orders[k]) < real_sizes[k])
        else:
            keep = np.arange(P, dtype=np.int64)
        V = len(keep)
        if ordering == "rcm" and V > dense_threshold:
            adj = sp.csr_matrix(pyr.mesh_adjacencies[k])[keep][:, keep]
            rho = _min_bandwidth_order(adj, block_size)
        else:
            rho = np.arange(V, dtype=np.int64)
        layouts.append(keep[rho])

    mesh_ops: List[LevelOperator] = []
    for k in range(n_levels):
        lay = layouts[k]
        L = sp.csr_matrix(pyr.mesh_laplacians[k])[lay][:, lay]
        V = L.shape[0]
        kind = "dense" if V <= dense_threshold else sparse_kind
        if kind == "band" and ordering != "rcm":
            kind = "bcsr"  # band layout needs the bandwidth-minimized order
        # band levels always use the full 128-lane MXU tile (pack-time zero
        # padding beats shrinking the tile: T=64 would double band_k and the
        # M=64 matmuls run at half the MXU rate); bcsr keeps divisor tiles
        T = block_size
        if kind == "bcsr":
            for cand in (block_size, 64, 32):
                if V % cand == 0:
                    T = cand
                    break
        mesh_ops.append(_make_level_op(L, kind, T, strip_h=strip_h))

    joint_op = _make_level_op(pyr.joint_laplacian, "dense", block_size)

    up_idx: List[jnp.ndarray] = []
    for k in range(n_levels - 1):
        lay_f, lay_c = layouts[k], layouts[k + 1]
        P_c = pyr.mesh_laplacians[k + 1].shape[0]
        pos_c = np.zeros(P_c, dtype=np.int64)
        pos_c[lay_c] = np.arange(len(lay_c))
        # parent of tree slot s is slot s//2 one level up (binary-tree
        # invariant, lib/coarsening.py:214-258); real slots have real
        # parents, so the lookup always lands on a kept coarse position
        up = pos_c[lay_f // 2]
        up_idx.append(jnp.asarray(up.astype(np.int32)))

    P0 = pyr.mesh_laplacians[0].shape[0]
    pos0 = np.zeros(P0, dtype=np.int64)
    pos0[layouts[0]] = np.arange(len(layouts[0]))
    vertex_gather = jnp.asarray(pos0[pyr.vertex_slot].astype(np.int32))

    faces_np = (np.asarray(faces, dtype=np.int32) if faces is not None
                else np.zeros((0, 3), np.int32))
    face_perm, face_sel = face_band_tables(
        faces_np, np.asarray(vertex_gather), pyr.num_vertices, block_size)
    return PyramidArtifact(
        mesh_ops=tuple(mesh_ops),
        joint_op=joint_op,
        up_idx=tuple(up_idx),
        vertex_gather=vertex_gather,
        faces=jnp.asarray(faces_np),
        joint_num=pyr.joint_num,
        num_vertices=pyr.num_vertices,
        face_inv=face_inverse_tables(faces_np, pyr.num_vertices),
        face_perm=face_perm,
        face_sel=face_sel,
    )


def face_band_tables(faces_np: np.ndarray, vertex_gather: np.ndarray,
                     num_v: int, T: int = 128,
                     max_w: int = 1536) -> Tuple[jax.Array, jax.Array]:
    """Banded face-scatter tables (see PyramidArtifact.face_perm docs).

    faces_np: (F, 3) ORIGINAL vertex ids; vertex_gather: device position of
    each original vertex (the artifact's un-permute map).  Returns
    (face_perm (nt*W,) int32, face_sel (nt, T, W) f32); empty arrays when
    there are no faces or a pathological tile needs W > max_w."""
    F = faces_np.shape[0]
    empty = (jnp.zeros((0,), jnp.int32), jnp.zeros((0, 0, 0), jnp.float32))
    if F == 0:
        return empty
    dev = np.asarray(vertex_gather)[faces_np]          # (F, 3) device pos
    # tree-ordered artifacts keep fake slots: device positions run past
    # num_v, so the tile grid must cover the LARGEST position
    nt = _cdiv(max(num_v, int(dev.max()) + 1), T)
    # corner-major cotangent row index: row = c*F + f
    rows = (np.arange(3)[None, :] * F + np.arange(F)[:, None]).reshape(-1)
    pos = dev.reshape(-1)
    order = np.argsort(pos, kind="stable")
    pos_s, rows_s = pos[order], rows[order]
    tiles = pos_s // T
    counts = np.bincount(tiles, minlength=nt)
    W = _cdiv(max(int(counts.max()), 1), 128) * 128
    if W > max_w:
        import warnings
        warnings.warn(f"face_band_tables: per-tile face count {counts.max()}"
                      f" needs W > {max_w}; falling back to scatter")
        return empty
    perm = np.full((nt * W,), 3 * F, np.int32)        # pad -> zero row
    sel = np.zeros((nt, T, W), np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(pos_s)) - starts[tiles]       # slot within tile
    perm[tiles * W + slot] = rows_s.astype(np.int32)
    sel[tiles, pos_s % T, slot] = 1.0
    return jnp.asarray(perm), jnp.asarray(sel)


def face_inverse_tables(faces_np: np.ndarray,
                        num_v: int) -> Tuple[jax.Array, ...]:
    """Per-corner ELL inverse of the face list: table[c][v] lists the faces
    where vertex v is corner c (padded with num_faces, pointing at a zero
    pad row of the cotangent)."""
    F = faces_np.shape[0]
    if F == 0:
        return ()
    out = []
    for c in range(3):
        col = faces_np[:, c].astype(np.int64)
        order = np.argsort(col, kind="stable")
        counts = np.bincount(col, minlength=num_v)
        K = max(int(counts.max()), 1)
        tab = np.full((num_v, K), F, np.int32)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(F) - starts[col[order]]
        tab[col[order], pos] = order.astype(np.int32)
        out.append(jnp.asarray(tab))
    return tuple(out)


def _flatten_for_save(art: PyramidArtifact) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {
        "meta/num_levels": np.int64(len(art.mesh_ops)),
        "meta/joint_num": np.int64(art.joint_num),
        "meta/num_vertices": np.int64(art.num_vertices),
        "vertex_gather": np.asarray(art.vertex_gather),
        "faces": np.asarray(art.faces),
    }
    for c, tab in enumerate(art.face_inv):
        out[f"face_inv/{c}"] = np.asarray(tab)
    out["face_perm"] = np.asarray(art.face_perm)
    out["face_sel"] = np.asarray(art.face_sel)
    def put(prefix: str, op: LevelOperator):
        out[f"{prefix}/kind"] = np.bytes_(op.kind)
        out[f"{prefix}/num_vertices"] = np.int64(op.num_vertices)
        out[f"{prefix}/block_size"] = np.int64(op.block_size)
        out[f"{prefix}/band_k"] = np.int64(op.band_k)
        out[f"{prefix}/strip_h"] = np.int64(op.strip_h)
        out[f"{prefix}/band_bw"] = np.int64(op.band_bw)
        for f in ("dense", "blk_col", "blk_val", "band_val", "ell_idx",
                  "ell_w", "strip_val"):
            out[f"{prefix}/{f}"] = np.asarray(getattr(op, f))
    for k, op in enumerate(art.mesh_ops):
        put(f"mesh/{k}", op)
    put("joint", art.joint_op)
    for k, up in enumerate(art.up_idx):
        out[f"up/{k}"] = np.asarray(up)
    return out


def save_artifact(path: str, art: PyramidArtifact) -> None:
    np.savez_compressed(path, **_flatten_for_save(art))


def load_artifact(path: str) -> PyramidArtifact:
    z = np.load(path, allow_pickle=False)
    n = int(z["meta/num_levels"])

    def get(prefix: str) -> LevelOperator:
        return LevelOperator(
            dense=jnp.asarray(z[f"{prefix}/dense"]),
            blk_col=jnp.asarray(z[f"{prefix}/blk_col"]),
            blk_val=jnp.asarray(z[f"{prefix}/blk_val"]),
            band_val=jnp.asarray(z[f"{prefix}/band_val"]),
            ell_idx=jnp.asarray(z[f"{prefix}/ell_idx"]),
            ell_w=jnp.asarray(z[f"{prefix}/ell_w"]),
            strip_val=(jnp.asarray(z[f"{prefix}/strip_val"])
                       if f"{prefix}/strip_val" in z
                       else jnp.zeros((0, 0), jnp.float32)),
            kind=bytes(z[f"{prefix}/kind"]).decode(),
            num_vertices=int(z[f"{prefix}/num_vertices"]),
            block_size=int(z[f"{prefix}/block_size"]),
            band_k=int(z[f"{prefix}/band_k"]),
            strip_h=(int(z[f"{prefix}/strip_h"])
                     if f"{prefix}/strip_h" in z else 0),
            band_bw=(int(z[f"{prefix}/band_bw"])
                     if f"{prefix}/band_bw" in z else 0),
        )

    return PyramidArtifact(
        mesh_ops=tuple(get(f"mesh/{k}") for k in range(n)),
        joint_op=get("joint"),
        up_idx=tuple(jnp.asarray(z[f"up/{k}"]) for k in range(n - 1)),
        vertex_gather=jnp.asarray(z["vertex_gather"]),
        faces=jnp.asarray(z["faces"]),
        joint_num=int(z["meta/joint_num"]),
        num_vertices=int(z["meta/num_vertices"]),
        face_inv=tuple(jnp.asarray(z[f"face_inv/{c}"]) for c in range(3)
                       if f"face_inv/{c}" in z),
        face_perm=(jnp.asarray(z["face_perm"]) if "face_perm" in z
                   else jnp.zeros((0,), jnp.int32)),
        face_sel=(jnp.asarray(z["face_sel"]) if "face_sel" in z
                  else jnp.zeros((0, 0, 0), jnp.float32)),
    )
