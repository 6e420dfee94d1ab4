"""Graph pipeline tests: coarsening invariants, Laplacian math, artifact
packing equivalence (dense == bcsr == ell)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from pose2mesh_release_tpu.body.synthetic import uv_sphere
from pose2mesh_release_tpu.graphs.build import (
    build_pyramid,
    joint_adjacency,
    mesh_adjacency,
)
from pose2mesh_release_tpu.graphs.coarsen import (
    coarsen,
    heavy_edge_matching,
    hem_pyramid,
    invert_permutation,
    lmax,
    normalized_laplacian,
    rescale_laplacian,
    tree_permutation,
)
from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
from pose2mesh_release_tpu.ops.spmm import spmm_bcsr, spmm_dense, spmm_ell


@pytest.fixture(scope="module")
def sphere():
    verts, faces = uv_sphere(770)  # small but realistic closed surface
    return verts, faces


@pytest.fixture(scope="module")
def pyramid(sphere):
    _, faces = sphere
    skeleton = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6)]
    return build_pyramid(faces, joint_num=7, skeleton=skeleton, levels=6)


def test_mesh_adjacency_symmetric_binary(sphere):
    _, faces = sphere
    A = mesh_adjacency(faces, faces.max() + 1)
    assert (A != A.T).nnz == 0
    assert set(np.unique(A.data)) == {1.0}
    assert A.diagonal().sum() == 0
    deg = np.asarray(A.sum(axis=0)).ravel()
    assert deg.min() >= 3 and abs(deg.mean() - 6.0) < 0.1  # closed triangulated surface


def test_joint_adjacency_self_loops():
    A = joint_adjacency(5, [(0, 1), (1, 2)], [(3, 4)]).toarray()
    assert np.array_equal(A, A.T)
    assert np.all(np.diag(A) == 1)
    assert A[0, 1] == 1 and A[3, 4] == 1 and A[0, 2] == 0


def test_normalized_laplacian_spectrum(sphere):
    _, faces = sphere
    A = mesh_adjacency(faces, faces.max() + 1)
    L = normalized_laplacian(A)
    lam = lmax(L)
    assert 1.0 < lam <= 2.0 + 1e-9
    # rescale semantics (as-written reference quirk): L/(2 lmax) - I
    Lr = rescale_laplacian(L, lam)
    dense = Lr.toarray()
    expect = L.toarray() / (2 * lam) - np.eye(L.shape[0])
    np.testing.assert_allclose(dense, expect, atol=1e-12)


def test_hem_matching_is_perfect_or_singleton(sphere):
    _, faces = sphere
    A = mesh_adjacency(faces, faces.max() + 1)
    order = np.argsort(np.asarray(A.sum(axis=0)).ravel(), kind="stable")
    cid = heavy_edge_matching(A, order)
    sizes = np.bincount(cid)
    assert sizes.max() <= 2
    assert cid.max() + 1 < A.shape[0]  # actually coarsened
    # most clusters should be pairs on a regular mesh
    assert (sizes == 2).mean() > 0.8


def test_tree_permutation_binary_tree(sphere):
    _, faces = sphere
    A = mesh_adjacency(faces, faces.max() + 1)
    _, parents = hem_pyramid(A, 3)
    orders = tree_permutation(parents)
    m_last = int(parents[-1].max()) + 1
    for k, order in enumerate(orders):
        assert len(order) == m_last * 2 ** (len(orders) - 1 - k)
    # child relation: slots {2i, 2i+1} at level k map to slot i at level k+1
    for k in range(len(orders) - 1):
        fine, coarse = orders[k], orders[k + 1]
        parent = parents[k]
        n_real_f = len(parent)
        for i, slot in enumerate(coarse):
            for child in (fine[2 * i], fine[2 * i + 1]):
                if child < n_real_f and slot < parent.max() + 1:
                    assert parent[child] == slot


def test_coarsen_sizes_and_padding(sphere):
    _, faces = sphere
    A = mesh_adjacency(faces, faces.max() + 1)
    res = coarsen(A, 4)
    sizes = [L.shape[0] for L in res.laplacians]
    for a, b in zip(sizes, sizes[1:]):
        assert a == 2 * b
    # fake vertices are isolated: zero rows in adjacency
    A0 = res.adjacencies[0]
    fake = np.asarray(A0.sum(axis=0)).ravel() == 0
    assert fake.sum() == sizes[0] - (faces.max() + 1)


def test_invert_permutation():
    p = np.array([2, 0, 3, 1])
    inv = invert_permutation(p)
    assert np.array_equal(p[inv], np.arange(4))
    assert np.array_equal(inv[p], np.arange(4))


def test_build_pyramid_structure(pyramid):
    # levels=6 -> used mesh levels = 5, finest padded to coarsest * 2^4
    assert len(pyramid.mesh_laplacians) == 5
    sizes = [L.shape[0] for L in pyramid.mesh_laplacians]
    for a, b in zip(sizes, sizes[1:]):
        assert a == 2 * b
    assert pyramid.joint_laplacian.shape == (7, 7)
    # joint level NOT rescaled: its eigenvalues live in [0, 2]
    ev = np.linalg.eigvalsh(pyramid.joint_laplacian.toarray())
    assert ev.min() > -1e-9 and ev.max() <= 2.0 + 1e-9
    # mesh levels rescaled: eigenvalues in [-1, -0.5] (reference quirk)
    ev0 = np.linalg.eigvalsh(pyramid.mesh_laplacians[0].toarray())
    assert ev0.min() >= -1.0 - 1e-9 and ev0.max() <= -0.5 + 1e-6
    # vertex_slot is injective into the finest level
    vs = pyramid.vertex_slot
    assert len(np.unique(vs)) == len(vs) == pyramid.num_vertices


def test_artifact_strategies_agree(pyramid):
    from pose2mesh_release_tpu.ops.spmm import spmm_band

    for kind in ("bcsr", "band"):
        art = pack_pyramid(pyramid, ordering="rcm", block_size=128,
                           dense_threshold=256, sparse_kind=kind)
        rng = np.random.default_rng(0)
        for op in art.mesh_ops:
            V = op.num_vertices
            x = jnp.asarray(rng.standard_normal((V, 2, 3)).astype(np.float32))
            y_ell = spmm_ell(op, x)
            if op.kind == "dense":
                y = spmm_dense(op, x)
            elif op.kind == "band":
                y = spmm_band(op, x)
            else:
                y = spmm_bcsr(op, x)
            np.testing.assert_allclose(np.asarray(y), np.asarray(y_ell), atol=1e-4)


def test_band_is_narrow(pyramid):
    """RCM must give a narrow band (the whole point of the reordering)."""
    art = pack_pyramid(pyramid, ordering="rcm", dense_threshold=256,
                       sparse_kind="band")
    for op in art.mesh_ops:
        if op.kind == "band":
            assert op.band_k <= 1, (op.num_vertices, op.band_k)


def test_artifact_matches_scipy(pyramid):
    """Device operator (in its own ordering) must equal the scipy Laplacian
    permuted consistently — checked through a random feature vector."""
    art = pack_pyramid(pyramid, ordering="rcm", dense_threshold=256)
    rng = np.random.default_rng(1)
    # finest level: verify via vertex_gather round trip on an SpMM output
    op0 = art.mesh_ops[0]
    V = op0.num_vertices
    x = rng.standard_normal((V, 4)).astype(np.float32)
    y_dev = np.asarray(spmm_ell(op0, jnp.asarray(x)))
    idx, w = np.asarray(op0.ell_idx), np.asarray(op0.ell_w)
    y_np = (x[idx] * w[..., None]).sum(axis=1)
    np.testing.assert_allclose(y_dev, y_np, atol=1e-5)
    # row sums of ell weights must match scipy Laplacian row sums as a
    # permutation-invariant multiset; rcm-mode levels store REAL vertices
    # only, so restrict the scipy matrix to real (non-fake) tree slots
    L0 = sp.csr_matrix(pyramid.mesh_laplacians[0])
    real_slots = np.flatnonzero(
        np.asarray(pyramid.orders[0]) < pyramid.real_sizes[0])
    scipy_rows = np.sort(
        np.asarray(L0[real_slots][:, real_slots].sum(axis=1)).ravel())
    art_rows = np.sort(w.sum(axis=1))
    np.testing.assert_allclose(art_rows, scipy_rows, atol=1e-5)


def test_up_idx_maps_children(pyramid):
    art = pack_pyramid(pyramid, ordering="tree", dense_threshold=256)
    # in tree ordering, up_idx[k][p] == p // 2
    for up in art.up_idx:
        up = np.asarray(up)
        assert np.array_equal(up, np.arange(len(up)) // 2)


def test_artifact_save_load(tmp_path, pyramid):
    from pose2mesh_release_tpu.graphs.artifact import load_artifact, save_artifact

    art = pack_pyramid(pyramid, dense_threshold=256)
    p = str(tmp_path / "pyr.npz")
    save_artifact(p, art)
    art2 = load_artifact(p)
    assert art2.level_sizes == art.level_sizes
    assert art2.joint_num == art.joint_num
    np.testing.assert_array_equal(np.asarray(art2.vertex_gather), np.asarray(art.vertex_gather))
    for a, b in zip(art.mesh_ops, art2.mesh_ops):
        assert a.kind == b.kind
        np.testing.assert_array_equal(np.asarray(a.ell_w), np.asarray(b.ell_w))
