"""Golden pyramid tests: our coarsening vs the ACTUAL reference code.

Imports /root/reference/lib/coarsening.py (and graph_utils.py) directly and
asserts that `hem_impl="reference"` reproduces parents, perms, adjacencies and
Laplacians bit-for-bit on realistic closed meshes (SMPL-sized 6890-vertex and
MANO-sized 778-vertex spheres).  This is the parity gate VERDICT.md #1/#2
called out: the published checkpoints only load on the exact pyramid the
reference builder produces.

The reference uses `np.bool` (removed in numpy>=1.24); we restore the alias
for the duration of the test.  Reference files under /root/reference are
treated as untrusted data: we execute their *algorithms* to obtain golden
outputs, nothing else.
"""
import sys

import numpy as np
import pytest
import scipy.sparse as sp

from pose2mesh_release_tpu.body.synthetic import uv_sphere, SMPL_VERTS, MANO_VERTS
from pose2mesh_release_tpu.graphs.build import build_pyramid, mesh_adjacency
from pose2mesh_release_tpu.graphs.coarsen import coarsen, invert_permutation

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def ref_coarsening():
    import os.path as osp

    if not osp.isdir(REF_LIB):
        pytest.skip("reference checkout not available")
    had_bool = hasattr(np, "bool")
    if not had_bool:
        np.bool = np.bool_  # legacy alias used at coarsening.py:157
    sys.path.insert(0, REF_LIB)
    try:
        import coarsening as refc

        yield refc
    finally:
        sys.path.remove(REF_LIB)
        if not had_bool:
            del np.bool


def _csr(m):
    m = sp.csr_matrix(m)
    m.sum_duplicates()
    m.eliminate_zeros()
    return m


@pytest.mark.parametrize("num_verts,levels", [(SMPL_VERTS, 9), (MANO_VERTS, 6)])
def test_pyramid_bitwise_matches_reference(ref_coarsening, num_verts, levels):
    """parents/perms/adjacencies/Laplacians identical to the reference run."""
    _, faces = uv_sphere(num_verts)
    A = mesh_adjacency(faces, num_verts)

    ref_adjs, ref_Ls, ref_perms = ref_coarsening.coarsen(A.copy(), levels)
    mine = coarsen(A, levels, impl="reference")

    assert [a.shape[0] for a in ref_adjs] == [a.shape[0] for a in mine.adjacencies]
    for k, (rp, mp) in enumerate(zip(ref_perms, mine.orders)):
        assert np.array_equal(np.asarray(rp), mp), f"perm mismatch at level {k}"
    for k, (ra, ma) in enumerate(zip(ref_adjs, mine.adjacencies)):
        ra, ma = _csr(ra), _csr(ma)
        assert np.array_equal(ra.indptr, ma.indptr), f"adj indptr level {k}"
        assert np.array_equal(ra.indices, ma.indices), f"adj indices level {k}"
        assert np.array_equal(ra.data, ma.data), f"adj data level {k}"
    for k, (rL, mL) in enumerate(zip(ref_Ls, mine.laplacians)):
        rL, mL = _csr(rL), _csr(mL)
        assert np.array_equal(rL.indices, mL.indices), f"L indices level {k}"
        assert np.array_equal(rL.data, mL.data), f"L data level {k}"


def test_build_pyramid_matches_reference_build_coarse_graphs(ref_coarsening):
    """Full orchestration parity: rescaled mesh Laplacians for the used levels,
    the (unrescaled) joint swap, and the vertex un-permute gather all match
    the reference's build_coarse_graphs + meshnet `del graph_L[-2]` combo
    (lib/graph_utils.py:75-95, lib/models/meshnet.py:35)."""
    refc = ref_coarsening
    num_verts, levels, joints = MANO_VERTS, 6, 7
    _, faces = uv_sphere(num_verts)
    skeleton = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    flip = [(2, 5)]

    # Reference pipeline, re-staged here because graph_utils.py imports torch
    # and mutates globals; semantics from build_coarse_graphs.
    A = mesh_adjacency(faces, num_verts)
    g_adj, g_L, g_perm = refc.coarsen(A.copy(), levels)
    joint_A = np.zeros((joints, joints))
    for i, j in skeleton + flip:
        joint_A[i, j] = joint_A[j, i] = 1
    joint_A = sp.csr_matrix(joint_A + np.eye(joints))
    g_L[-1] = refc.laplacian(joint_A, normalized=True)
    for i in range(levels):
        g_L[i] = refc.rescale_L(g_L[i], refc.lmax_L(g_L[i]))
    ref_reverse = refc.perm_index_reverse(g_perm[0])

    pyr = build_pyramid(faces, joints, skeleton, flip, levels=levels,
                        hem_impl="reference")

    used = levels - 1  # meshnet drops the 2nd-coarsest mesh level
    assert len(pyr.mesh_laplacians) == used
    for k in range(used):
        rL, mL = _csr(g_L[k]), _csr(pyr.mesh_laplacians[k])
        assert rL.shape == mL.shape, f"level {k}"
        assert np.array_equal(rL.indices, mL.indices), f"rescaled L idx level {k}"
        # eigsh uses a random start vector, so lmax (and hence the rescale)
        # differs in trailing ulps run-to-run; unrescaled Ls are compared
        # bitwise in test_pyramid_bitwise_matches_reference.
        np.testing.assert_allclose(rL.data, mL.data, rtol=1e-9, atol=1e-12)
    jL, mjL = _csr(g_L[-1]), _csr(pyr.joint_laplacian)
    assert np.array_equal(jL.indices, mjL.indices)
    np.testing.assert_allclose(jL.data, mjL.data, rtol=0, atol=1e-15)
    # vertex_slot == graph_perm_reverse[:V] (lib/core/base.py:130 gather)
    assert np.array_equal(pyr.vertex_slot,
                          np.asarray(ref_reverse)[:num_verts])


def test_reference_impl_is_default():
    """build_pyramid defaults to the checkpoint-compatible coarsener."""
    _, faces = uv_sphere(770)
    pyr_default = build_pyramid(faces, 7, [(0, 1), (1, 2)], levels=4)
    pyr_ref = build_pyramid(faces, 7, [(0, 1), (1, 2)], levels=4,
                            hem_impl="reference")
    assert [L.shape for L in pyr_default.mesh_laplacians] == \
           [L.shape for L in pyr_ref.mesh_laplacians]
    for a, b in zip(pyr_default.mesh_laplacians, pyr_ref.mesh_laplacians):
        a, b = _csr(a), _csr(b)
        assert np.array_equal(a.indices, b.indices)
        # rescale uses eigsh (random start vector) → equal only to ~1e-9
        np.testing.assert_allclose(a.data, b.data, rtol=1e-9, atol=1e-12)
