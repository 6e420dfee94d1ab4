"""Multilevel Graclus/HEM graph coarsening (host-side, NumPy/SciPy).

Builds the mesh-coarsening pyramid consumed by the TPU compute path. This is
an *offline* artifact pipeline: it runs once per (mesh, joint-set, levels)
configuration and everything downstream treats its outputs as constants.

Reference semantics: /root/reference/lib/coarsening.py:43-258 (Graclus
heavy-edge matching with degree-sorted visit order, binary-tree vertex
permutation with fake-node padding). Re-derived here from the algorithm, not
translated: the matcher is a clean Graclus HEM whose pair score for a
candidate edge (i, j) is (2*W_ij + W_ii + W_jj) / (d_i + d_j + eps) with
W_ii/W_jj the *diagonal* (self-loop) weights.  For the binary 0/1 mesh
adjacencies used by Pose2Mesh this is identical to the reference's scoring.
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


def coarsen(A: sp.spmatrix, levels: int) -> CoarseningResult:
    """Full pipeline: HEM pyramid + tree ordering + per-level Laplacians.

    Reference: lib/coarsening.py:43-64.  Level k has
    ``M_coarsest * 2**(levels-k)`` vertices after fake-node padding; data at
    fake vertices is zero-initialized and they are isolated in the graph.
    """
    graphs, parents = hem_pyramid(A, levels)
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
