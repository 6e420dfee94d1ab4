"""Multilevel Graclus/HEM graph coarsening (host-side, NumPy/SciPy).

Builds the mesh-coarsening pyramid consumed by the TPU compute path. This is
an *offline* artifact pipeline: it runs once per (mesh, joint-set, levels)
configuration and everything downstream treats its outputs as constants.

Two matcher implementations are provided:

* ``impl="reference"`` (default) reproduces the reference coarsening
  (/root/reference/lib/coarsening.py:67-211) *behaviorally exactly*,
  including its quirks, because the published pretrained checkpoints were
  trained on the pyramid those quirks produce (SMPL: 24 coarse vertices →
  12288 padded finest rows; a cleaned-up HEM yields 15 → 7680 and the
  checkpoints cannot load).  Preserved quirks:

  - the pair score's "W_ii"/"W_jj" are the FIRST stored entry of each row
    (lowest column index), not the diagonal (coarsening.py:192-194:
    ``Wii = vv[rowstart[tid]]``);
  - visit order is a *default-kind* (introsort, unstable) ``np.argsort`` of
    the column sums INCLUDING self-loops (coarsening.py:92-93,146-147),
    while the score's degree weights EXCLUDE self-loops at the finest level
    only (coarsening.py:96 vs :139);
  - edges are enumerated via ``scipy.sparse.find`` with a swap-to-row-sorted
    fixup (coarsening.py:111-121), so within a row neighbors are scanned in
    ascending column order and ties go to the lowest column;
  - ``tval > wmax`` with ``wmax`` starting at 0.0 — a marked neighbor
    (score forced to 0) can never be chosen.

* ``impl="clean"`` is the re-derived textbook Graclus HEM (diagonal W_ii,
  stable visit order) — better-conditioned pyramids for training new models
  from scratch inside this framework.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np
import scipy.sparse as sp

__all__ = [
    "normalized_laplacian",
    "lmax",
    "rescale_laplacian",
    "heavy_edge_matching",
    "hem_pyramid",
    "hem_pyramid_reference",
    "tree_permutation",
    "invert_permutation",
    "permute_adjacency",
    "coarsen",
    "CoarseningResult",
]


def normalized_laplacian(W: sp.spmatrix) -> sp.csr_matrix:
    """Symmetric normalized Laplacian L = I - D^-1/2 W D^-1/2.

    Matches /root/reference/lib/coarsening.py:6-25 (normalized branch),
    including the epsilon guard for isolated (fake) vertices.
    """
    W = sp.csr_matrix(W, dtype=np.float64)
    d = np.asarray(W.sum(axis=0)).ravel()
    d = d + np.spacing(np.float64(0))
    d_inv_sqrt = 1.0 / np.sqrt(d)
    D = sp.diags(d_inv_sqrt)
    L = sp.identity(W.shape[0], dtype=W.dtype, format="csr") - D @ W @ D
    L = sp.csr_matrix(L)
    asym = np.abs(L - L.T).mean()
    if asym >= 1e-9:
        raise ValueError(f"Laplacian not symmetric: mean |L-L^T| = {asym}")
    return L


def lmax(L: sp.spmatrix) -> float:
    """Largest eigenvalue of a symmetric sparse matrix (for Chebyshev rescale).

    Reference: /root/reference/lib/coarsening.py:37-39.
    """
    return float(
        sp.linalg.eigsh(L, k=1, which="LM", return_eigenvectors=False)[0]
    )


def rescale_laplacian(L: sp.spmatrix, lam_max: float) -> sp.csr_matrix:
    """Shift/scale the Laplacian into the Chebyshev stability domain.

    NOTE: the reference's `rescale_L` (/root/reference/lib/coarsening.py:28-34)
    computes ``L / (2 * lmax) - I`` (its comment claims ``2 L / lmax - I`` but
    the code divides).  The published accuracy numbers were obtained with the
    as-written semantics, so we reproduce them exactly: eigenvalues land in
    [-1, -0.75] for a normalized Laplacian with lmax ~ 2.
    """
    L = sp.csr_matrix(L, dtype=np.float64, copy=True)
    M = L.shape[0]
    I = sp.identity(M, format="csr", dtype=L.dtype)
    return sp.csr_matrix(L / (2.0 * lam_max) - I)


def heavy_edge_matching(W: sp.spmatrix, visit_order: np.ndarray) -> np.ndarray:
    """One level of greedy heavy-edge matching.

    Visits vertices in `visit_order`; each unmarked vertex is matched with its
    best unmarked neighbor by the Graclus normalized-cut score
    ``(2 W_ij + W_ii + W_jj) / (d_i + d_j + 1e-9)`` (self-loop weights W_ii on
    the diagonal), falling back to a singleton cluster when all neighbors are
    taken.  Returns cluster_id: vertex -> coarse vertex, with coarse ids
    assigned in visit order (reference: lib/coarsening.py:153-211).
    """
    W = sp.csr_matrix(W)
    N = W.shape[0]
    degrees = np.asarray(W.sum(axis=0)).ravel()
    diag = W.diagonal()
    indptr, indices, data = W.indptr, W.indices, W.data

    marked = np.zeros(N, dtype=bool)
    cluster_id = np.zeros(N, dtype=np.int64)
    next_cluster = 0
    for tid in visit_order:
        if marked[tid]:
            continue
        marked[tid] = True
        best_score = 0.0
        best_nb = -1
        for p in range(indptr[tid], indptr[tid + 1]):
            nid = indices[p]
            if marked[nid]:
                continue
            score = (2.0 * data[p] + diag[tid] + diag[nid]) / (
                degrees[tid] + degrees[nid] + 1e-9
            )
            if score > best_score:
                best_score = score
                best_nb = nid
        cluster_id[tid] = next_cluster
        if best_nb >= 0:
            cluster_id[best_nb] = next_cluster
            marked[best_nb] = True
        next_cluster += 1
    return cluster_id


def hem_pyramid(W: sp.spmatrix, levels: int):
    """Repeated HEM coarsening.

    Returns (graphs, parents): graphs[0] is the input adjacency and
    graphs[k+1] the k-th coarsening; parents[k] maps level-k vertices to
    level-(k+1) vertices.  Visit order at every level is ascending total
    vertex weight (degree incl. self-loops), the deterministic "Graclus
    weights" strategy of the reference (lib/coarsening.py:89-93,142-147).
    """
    W = sp.csr_matrix(W, dtype=np.float64)
    graphs: List[sp.csr_matrix] = [W]
    parents: List[np.ndarray] = []
    for _ in range(levels):
        strengths = np.asarray(W.sum(axis=0)).ravel()
        visit_order = np.argsort(strengths, kind="stable")
        cluster_id = heavy_edge_matching(W, visit_order)
        parents.append(cluster_id)

        # Contract: accumulate edge weights between clusters (self-loops keep
        # the intra-cluster weight, which feeds the next level's HEM score).
        coo = W.tocoo()
        n_new = int(cluster_id.max()) + 1
        W = sp.csr_matrix(
            (coo.data, (cluster_id[coo.row], cluster_id[coo.col])),
            shape=(n_new, n_new),
        )
        W.eliminate_zeros()
        graphs.append(W)
    return graphs, parents


def _match_level_reference(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    visit_order: np.ndarray,
    weights: np.ndarray,
) -> np.ndarray:
    """One greedy matching pass with the reference's exact tie/score behavior.

    `rows` must be sorted ascending (row-major edge list, the canonical
    ``scipy.sparse.find`` order of a CSR matrix) and every vertex must own at
    least one stored entry — true for contracted mesh graphs, where matched
    pairs leave self-loops and singletons keep their cut edges.  The
    reference (lib/coarsening.py:153-211) rebuilds row offsets with a
    sequential counter under the same assumption.

    Quirks preserved (see module docstring): the score's "W_ii"/"W_jj" are
    each row's FIRST stored value, neighbors are scanned in storage order
    with strict `>` so the first maximum wins, and marked neighbors are
    skipped (score 0 can never exceed the 0.0 floor).
    """
    nnz = rows.shape[0]
    n = int(rows[-1]) + 1
    # First-entry offset of each row in the row-sorted edge list.
    first = np.concatenate([[0], np.flatnonzero(np.diff(rows)) + 1])
    if first.shape[0] != n:
        raise ValueError("reference HEM requires every vertex to have edges")
    count = np.diff(np.concatenate([first, [nnz]]))
    # The reference's sequential row-length counter (coarsening.py:166-171)
    # increments BEFORE testing for a row change, so every row's first entry
    # is attributed to the previous row.  Net scan lengths: row 0 reads one
    # entry past its row (row 1's first stored neighbor), the last row never
    # reads its final stored neighbor, middle rows are unaffected.  Matching
    # decisions for vertices 0 and n-1 depend on this, so we keep it.
    scan = count.copy()
    if n > 1:
        scan[0] += 1
        scan[-1] -= 1

    marked = np.zeros(n, dtype=bool)
    cluster = np.zeros(n, dtype=np.int32)
    n_clusters = 0
    for tid in visit_order:
        if marked[tid]:
            continue
        marked[tid] = True
        rs = first[tid]
        w_ii = vals[rs]  # the reference's "W_ii": first stored entry, NOT diag
        d_i = weights[tid]
        best = 0.0
        best_nb = -1
        for p in range(rs, rs + scan[tid]):
            nid = cols[p]
            if marked[nid]:
                continue
            # Same fp evaluation order as coarsening.py:192-197 so near-tie
            # comparisons resolve identically.
            score = (2.0 * vals[p] + w_ii + vals[first[nid]]) * 1.0 / (
                d_i + weights[nid] + 1e-9
            )
            if score > best:
                best = score
                best_nb = nid
        cluster[tid] = n_clusters
        if best_nb > -1:
            cluster[best_nb] = n_clusters
            marked[best_nb] = True
        n_clusters += 1
    return cluster


def hem_pyramid_reference(W: sp.spmatrix, levels: int):
    """Repeated HEM coarsening, bit-compatible with the reference pipeline.

    Returns (graphs, parents) exactly like :func:`hem_pyramid`, but every
    behavioral quirk of /root/reference/lib/coarsening.py:67-149 is
    reproduced so the resulting pyramid (and hence the shapes of every
    published pretrained checkpoint) is identical:

    - visit order: default-kind ``np.argsort`` of column sums incl.
      self-loops, recomputed per level;
    - score weights: column sums EXCLUDING the diagonal at the finest level,
      INCLUDING it at every coarser level;
    - edge enumeration via ``scipy.sparse.find`` (row-major canonical order),
      transposing if rows come back unsorted — a no-op for symmetric W;
    - contraction by relabeling the same edge list, duplicates summed by
      CSR construction in the same order.
    """
    W = sp.csr_matrix(W)
    graphs: List[sp.csr_matrix] = [W]
    parents: List[np.ndarray] = []
    weights = np.asarray(W.sum(axis=0)).ravel() - W.diagonal()
    for _ in range(levels):
        visit_order = np.argsort(np.asarray(W.sum(axis=0)).ravel())
        rows, cols, vals = sp.find(W)
        if np.any(np.diff(rows) < 0):  # keep rows sorted, as the matcher needs
            rows, cols = cols, rows
        cluster = _match_level_reference(rows, cols, vals, visit_order, weights)
        parents.append(cluster)

        n_new = int(cluster.max()) + 1
        W = sp.csr_matrix(
            (vals, (cluster[rows], cluster[cols])), shape=(n_new, n_new)
        )
        W.eliminate_zeros()
        graphs.append(W)
        # Coarse levels: score weights now INCLUDE self-loops (the contracted
        # intra-cluster weight), mirroring lib/coarsening.py:139.
        weights = np.asarray(W.sum(axis=0)).ravel()
    return graphs, parents


def tree_permutation(parents: List[np.ndarray]) -> List[np.ndarray]:
    """Vertex orderings making every parent's children {2i, 2i+1}.

    Works from the coarsest level down, appending "fake" vertices so each
    coarse vertex has exactly two children; fake ids start at the original
    vertex count of the level.  Returns one permutation per level, finest
    first; perm[k][i] = original (possibly fake) vertex id placed at slot i.
    Reference: lib/coarsening.py:214-258.
    """
    if not parents:
        return []
    orders: List[np.ndarray] = []
    m_coarsest = int(parents[-1].max()) + 1
    orders.append(np.arange(m_coarsest, dtype=np.int64))

    for parent in parents[::-1]:
        n_real = len(parent)
        next_fake = n_real
        # children lists in original-id order (np.where order of the reference)
        order_fine = []
        children: List[List[int]] = [[] for _ in range(int(parent.max()) + 1)]
        for v, p in enumerate(parent):
            children[p].append(v)
        for slot in orders[-1]:
            kids = children[slot] if slot < len(children) else []
            if len(kids) > 2:
                raise AssertionError("HEM produced a cluster of size > 2")
            if len(kids) == 1:  # singleton: pair with one fake vertex
                kids = kids + [next_fake]
                next_fake += 1
            elif len(kids) == 0:  # fake parent: two fake children
                kids = [next_fake, next_fake + 1]
                next_fake += 2
            order_fine.extend(kids)
        orders.append(np.asarray(order_fine, dtype=np.int64))

    orders = orders[::-1]
    # Sanity: each level's order is a permutation of its padded size, and the
    # padded sizes form an exact binary tree.
    for k, order in enumerate(orders):
        expected = m_coarsest * 2 ** (len(orders) - 1 - k)
        assert len(order) == expected, (len(order), expected)
        assert np.array_equal(np.sort(order), np.arange(expected))
    return orders


def invert_permutation(perm: np.ndarray) -> np.ndarray:
    """inv[perm[i]] = i (reference: lib/coarsening.py:322-328)."""
    perm = np.asarray(perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv


def permute_adjacency(A: sp.spmatrix, order: np.ndarray) -> sp.csr_matrix:
    """Pad A with isolated fake vertices and relabel so vertex order[i] -> i.

    Reference: lib/coarsening.py:265-290.
    """
    A = A.tocoo()
    m_new = len(order)
    A = sp.coo_matrix((A.data, (A.row, A.col)), shape=(m_new, m_new))
    inv = invert_permutation(np.asarray(order))
    A = sp.coo_matrix((A.data, (inv[A.row], inv[A.col])), shape=(m_new, m_new))
    A = A.tocsr()
    A.eliminate_zeros()
    return A


@dataclass
class CoarseningResult:
    """Outputs of the multilevel coarsening.

    adjacencies[k]: padded, tree-ordered adjacency of level k (0 = finest).
    laplacians[k]: normalized Laplacian of adjacencies[k] (NOT yet rescaled).
    orders[k]: tree permutation (slot -> original vertex id) of level k.
    parents[k]: original-id parent map level k -> k+1 (no padding).
    """

    adjacencies: List[sp.csr_matrix] = field(default_factory=list)
    laplacians: List[sp.csr_matrix] = field(default_factory=list)
    orders: List[np.ndarray] = field(default_factory=list)
    parents: List[np.ndarray] = field(default_factory=list)


def coarsen(A: sp.spmatrix, levels: int, impl: str = "reference") -> CoarseningResult:
    """Full pipeline: HEM pyramid + tree ordering + per-level Laplacians.

    Reference: lib/coarsening.py:43-64.  Level k has
    ``M_coarsest * 2**(levels-k)`` vertices after fake-node padding; data at
    fake vertices is zero-initialized and they are isolated in the graph.

    impl: "reference" reproduces the reference matcher exactly (required for
    loading published checkpoints — SMPL coarsens to 24, padding the finest
    level to 12288); "clean" is the textbook HEM (see module docstring).
    """
    if impl == "reference":
        graphs, parents = hem_pyramid_reference(A, levels)
    elif impl == "clean":
        graphs, parents = hem_pyramid(A, levels)
    else:
        raise ValueError(f"unknown HEM impl: {impl!r}")
    orders = tree_permutation(parents)
    res = CoarseningResult(parents=parents, orders=orders)
    for k, G in enumerate(graphs):
        # NB: coarse levels keep their self-loops (contracted intra-cluster
        # weight) exactly as the reference does — they shape the normalized
        # Laplacian (lib/coarsening.py:49-62 never strips the diagonal).
        if k < len(orders):
            G = permute_adjacency(G, orders[k])
        G = sp.csr_matrix(G)
        G.eliminate_zeros()
        res.adjacencies.append(G)
        res.laplacians.append(normalized_laplacian(G))
    return res
