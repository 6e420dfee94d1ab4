"""Pallas kernel tests (interpreter mode on CPU): banded hop and the fused
Chebyshev conv must match the XLA reference path in values AND gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose2mesh_release_tpu.body.synthetic import uv_sphere
from pose2mesh_release_tpu.graphs.artifact import pack_pyramid
from pose2mesh_release_tpu.graphs.build import build_pyramid
from pose2mesh_release_tpu.ops.cheby import chebyshev_stack
from pose2mesh_release_tpu.ops.pallas_cheby import (
    banded_hop,
    fused_cheby_project,
    pallas_supported,
)
from pose2mesh_release_tpu.ops.spmm import spmm_band


@pytest.fixture(scope="module")
def band_op():
    _, faces = uv_sphere(770)
    pyr = build_pyramid(faces, joint_num=7, skeleton=[(0, 1), (1, 2)], levels=4)
    art = pack_pyramid(pyr, dense_threshold=128, sparse_kind="band")
    # pick a band level with exact tiling
    for op in art.mesh_ops:
        if op.kind == "band" and pallas_supported(
            op, jnp.zeros((op.num_vertices, 2, 8))
        ):
            return op
    pytest.skip("no pallas-supported band level in test pyramid")


def test_banded_hop_matches_xla(band_op):
    V = band_op.num_vertices
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((V, 4, 8)).astype(np.float32))
    y_pallas = banded_hop(band_op, x)
    y_xla = spmm_band(band_op, x)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_xla), atol=1e-4)


def test_banded_hop_gradient(band_op):
    V = band_op.num_vertices
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((V, 2, 8)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((V, 2, 8)).astype(np.float32))

    def f_pallas(x):
        return (banded_hop(band_op, x) * g).sum()

    def f_xla(x):
        return (spmm_band(band_op, x) * g).sum()

    gp = jax.grad(f_pallas)(x)
    gx = jax.grad(f_xla)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4)


def test_fused_cheby_matches_stack(band_op):
    V = band_op.num_vertices
    F, Fout = 8, 16
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((V, 2, F)).astype(np.float32))
    # canonical fin-major kernel, permute to basis-major for the fused op
    Wc = jnp.asarray(rng.standard_normal((F * 3, Fout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((Fout,)).astype(np.float32))
    Wb = Wc.reshape(F, 3, Fout).transpose(1, 0, 2).reshape(3 * F, Fout)

    y_ref = chebyshev_stack(band_op, x, 3) @ Wc + b
    y_fused = fused_cheby_project(band_op, x, Wb, b)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), atol=1e-3)


def test_fully_fused_kernel_matches_stack(band_op):
    """Lane-aligned channels route through the single fused kernel."""
    V = band_op.num_vertices
    F, Fout = 128, 128
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((V, 2, F)).astype(np.float32))
    Wc = jnp.asarray(rng.standard_normal((F * 3, Fout)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal((Fout,)).astype(np.float32))
    Wb = Wc.reshape(F, 3, Fout).transpose(1, 0, 2).reshape(3 * F, Fout)

    y_ref = chebyshev_stack(band_op, x, 3) @ Wc + b
    y_fused = fused_cheby_project(band_op, x, Wb, b)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-3, atol=5e-3)

    # gradient path of the fully fused kernel
    def f_fused(x, Wb):
        return (fused_cheby_project(band_op, x, Wb, b) ** 2).sum()

    def f_ref(x, Wc):
        return ((chebyshev_stack(band_op, x, 3) @ Wc + b) ** 2).sum()

    gx_f, gW_f = jax.grad(f_fused, argnums=(0, 1))(x, Wb)
    gx_r, gW_r = jax.grad(f_ref, argnums=(0, 1))(x, Wc)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-2, atol=1e-1)
    gW_r_basis = np.asarray(gW_r).reshape(F, 3, Fout).transpose(1, 0, 2).reshape(3 * F, Fout)
    np.testing.assert_allclose(np.asarray(gW_f), gW_r_basis, rtol=1e-2, atol=1e-1)


def test_fused_cheby_gradients(band_op):
    V = band_op.num_vertices
    F, Fout = 8, 4
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((V, 2, F)).astype(np.float32))
    Wb = jnp.asarray(rng.standard_normal((3 * F, Fout)).astype(np.float32) * 0.1)
    b = jnp.zeros((Fout,), jnp.float32)
    Wc = Wb.reshape(3, F, Fout).transpose(1, 0, 2).reshape(F * 3, Fout)

    def f_fused(x, Wb, b):
        return (fused_cheby_project(band_op, x, Wb, b) ** 2).sum()

    def f_ref(x, Wc, b):
        return ((chebyshev_stack(band_op, x, 3) @ Wc + b) ** 2).sum()

    gx_f, gW_f, gb_f = jax.grad(f_fused, argnums=(0, 1, 2))(x, Wb, b)
    gx_r, gW_r, gb_r = jax.grad(f_ref, argnums=(0, 1, 2))(x, Wc, b)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=2e-4, atol=2e-3)
    # permute reference weight grad to basis-major before comparing
    gW_r_basis = np.asarray(gW_r).reshape(F, 3, Fout).transpose(1, 0, 2).reshape(3 * F, Fout)
    np.testing.assert_allclose(np.asarray(gW_f), gW_r_basis, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_r), rtol=2e-4, atol=2e-3)


def _synthetic_band_op(k: int, nt: int = 6, T: int = 128, seed: int = 0,
                       strip_h: int = 0):
    """Random symmetric banded operator with block-bandwidth exactly k at
    tile size T (scalar bandwidth ~ k*T - T/2), via the production packer."""
    import scipy.sparse as sp

    from pose2mesh_release_tpu.graphs.artifact import _make_level_op

    V = nt * T
    bw = k * T - T // 2
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(V), 4)
    offs = rng.integers(-bw, bw + 1, size=rows.shape)
    cols = np.clip(rows + offs, 0, V - 1)
    vals = rng.standard_normal(rows.shape) * 0.2
    L = sp.coo_matrix((vals, (rows, cols)), shape=(V, V))
    L = ((L + L.T) * 0.5).tocsr()
    # guarantee the extremal diagonals are populated so band_k == k
    L[0, bw] = L[bw, 0] = 0.1
    op = _make_level_op(L, "band", T, strip_h=strip_h)
    assert op.band_k == k, (op.band_k, k)
    return op


@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.parametrize("variant", ["plain", "skip_add", "skip_proj", "out_3d"])
def test_flat_window_matches_group_kernel(k, variant):
    """fused_conv_flat (row-tile groups) and fused_conv_flat_window
    (whole-level resident) are interchangeable deploy kernels: equal
    outputs over band_k in {1,2}, residual epilogues, and the 3-D final
    write (ADVICE r2: the window kernel had no test coverage)."""
    from pose2mesh_release_tpu.ops.pallas_cheby import fused_conv_flat
    from pose2mesh_release_tpu.ops.pallas_window import (
        fused_conv_flat_window, window_supported)

    op = _synthetic_band_op(k)
    nt, T = op.band_val.shape[1], op.block_size
    Vp = nt * T
    B, F, Fout = 4, 128, 128
    rng = np.random.default_rng(5)
    x2 = jnp.asarray(rng.standard_normal((Vp, B * F)) * 0.3, jnp.float32)
    W = jnp.asarray(rng.standard_normal((3 * F, Fout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Fout,)) * 0.1, jnp.float32)

    kw = dict(relu=True)
    if variant == "skip_add":
        kw["skip"] = jnp.asarray(
            rng.standard_normal((Vp, B * Fout)) * 0.3, jnp.float32)
    elif variant == "skip_proj":
        kw["skip"] = jnp.asarray(
            rng.standard_normal((Vp, B * F)) * 0.3, jnp.float32)
        kw["skip_w"] = jnp.asarray(
            rng.standard_normal((F, Fout)) * 0.05, jnp.float32)
    elif variant == "out_3d":
        kw["out_3d"] = True

    assert window_supported(op, batch=B, lanes=F)
    y_group = fused_conv_flat(op, x2, B, W, b, **kw)
    y_window = fused_conv_flat_window(op, x2, B, W, b, **kw)
    assert y_group.shape == y_window.shape
    np.testing.assert_allclose(np.asarray(y_group), np.asarray(y_window),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.parametrize("fo", [128, 64, 8])
def test_flat_commuted_kernel_matches_reference(k, fo):
    """fused_conv_flat_commuted (project-first, hops on Fout-wide lanes,
    gr-packed output for Fout < 128) == the canonical Chebyshev conv."""
    from pose2mesh_release_tpu.ops.pallas_cheby import fused_conv_flat_commuted

    op = _synthetic_band_op(k)
    nt, T = op.band_val.shape[1], op.block_size
    Vp = nt * T
    V = op.num_vertices
    # gr = 128 // fo batch elements share each 128-lane group, so batch
    # must be a multiple of gr (the production call sites satisfy this:
    # fo=8 only occurs at the packed final conv with batch' = 32)
    B, F = max(128 // fo, 4), 128
    rng = np.random.default_rng(6)
    x3 = jnp.asarray(rng.standard_normal((V, B, F)) * 0.3, jnp.float32)
    W0, W1, W2 = (jnp.asarray(rng.standard_normal((F, fo)) * 0.05, jnp.float32)
                  for _ in range(3))
    b = jnp.asarray(rng.standard_normal((fo,)) * 0.1, jnp.float32)

    # canonical reference via the tested hop path
    z1 = spmm_band(op, x3)
    z2 = 2.0 * spmm_band(op, z1) - x3
    y_ref = jnp.maximum(x3 @ W0 + z1 @ W1 + z2 @ W2 + b, 0.0)  # (V, B, fo)

    x2 = jnp.pad(x3.reshape(V, B * F), ((0, Vp - V), (0, 0)))
    Wc = jnp.concatenate([W0 - W2, W1, W2], axis=0)  # commuted basis-major
    y = fused_conv_flat_commuted(op, x2, B, Wc, b, relu=True)
    assert y.shape == (Vp, B * fo)
    np.testing.assert_allclose(np.asarray(y[:V].reshape(V, B, fo)),
                               np.asarray(y_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.parametrize("strip_h", [64, 128])
@pytest.mark.parametrize("variant", ["plain", "skip_add", "skip_proj", "out_3d"])
@pytest.mark.parametrize("mode", ["basis", "commuted"])
def test_flat_strip_matches_group_kernel(k, strip_h, variant, mode,
                                         monkeypatch):
    """fused_conv_flat_strip (narrow-window commuted, whole-level resident)
    is a drop-in for fused_conv_flat: equal outputs over band_k, strip tile
    heights, residual epilogues, and the 3-D final write."""
    from pose2mesh_release_tpu.ops.pallas_cheby import fused_conv_flat
    from pose2mesh_release_tpu.ops.pallas_strip import (
        fused_conv_flat_strip, strip_supported)

    op = _synthetic_band_op(k, strip_h=strip_h)
    nt, T = op.band_val.shape[1], op.block_size
    Vp = nt * T
    # the synthetic band has scalar bandwidth ~ k*T - T/2: the strip window
    # must be NARROWER than the (2k+1)*T block window (the layout's point)
    assert op.strip_h == strip_h
    assert op.strip_val.shape == (Vp, op.strip_val.shape[1])
    assert op.strip_val.shape[1] < (2 * k + 1) * T
    B, F, Fout = 4, 128, 128
    rng = np.random.default_rng(5)
    x2 = jnp.asarray(rng.standard_normal((Vp, B * F)) * 0.3, jnp.float32)
    W = jnp.asarray(rng.standard_normal((3 * F, Fout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Fout,)) * 0.1, jnp.float32)

    kw = dict(relu=True)
    if variant == "skip_add":
        kw["skip"] = jnp.asarray(
            rng.standard_normal((Vp, B * Fout)) * 0.3, jnp.float32)
    elif variant == "skip_proj":
        kw["skip"] = jnp.asarray(
            rng.standard_normal((Vp, B * F)) * 0.3, jnp.float32)
        kw["skip_w"] = jnp.asarray(
            rng.standard_normal((F, Fout)) * 0.05, jnp.float32)
    elif variant == "out_3d":
        kw["out_3d"] = True

    assert strip_supported(op, batch=B, lanes=F, fo_lanes=Fout)
    monkeypatch.setenv("P2M_STRIP_MODE", mode)
    y_group = fused_conv_flat(op, x2, B, W, b, **kw)
    y_strip = fused_conv_flat_strip(op, x2, B, W, b, **kw)
    assert y_group.shape == y_strip.shape
    np.testing.assert_allclose(np.asarray(y_group), np.asarray(y_strip),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["group", "strip"])
def test_flat_dispatch_commuted_and_out_pack(impl, monkeypatch):
    """The deploy dispatch routes down-convs to the commuted kernels and
    honors out_pack (gr-packed outputs) identically under both the group
    and strip impls: results match the canonical conv."""
    from pose2mesh_release_tpu.ops.pallas_cheby import fused_conv_flat_dispatch

    monkeypatch.setenv("P2M_FLAT_IMPL", impl)
    op = _synthetic_band_op(1, strip_h=128)
    nt, T = op.band_val.shape[1], op.block_size
    Vp, V = nt * T, op.num_vertices
    B, F = 4, 256
    rng = np.random.default_rng(9)
    x3 = jnp.asarray(rng.standard_normal((V, B, F)) * 0.3, jnp.float32)

    def canonical(W0, W1, W2, b):
        z1 = spmm_band(op, x3)
        z2 = 2.0 * spmm_band(op, z1) - x3
        return jnp.maximum(x3 @ W0 + z1 @ W1 + z2 @ W2 + b, 0.0)

    x2 = jnp.pad(x3.reshape(V, B * F), ((0, Vp - V), (0, 0)))
    # down-conv 256 -> 128: dispatch must take the commuted route
    W0, W1, W2 = (jnp.asarray(rng.standard_normal((F, 128)) * 0.05,
                              jnp.float32) for _ in range(3))
    b = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    y = fused_conv_flat_dispatch(op, x2, B, jnp.concatenate([W0, W1, W2]),
                                 b, relu=True)
    np.testing.assert_allclose(np.asarray(y[:V].reshape(V, B, 128)),
                               np.asarray(canonical(W0, W1, W2, b)),
                               rtol=1e-4, atol=1e-4)
    # out-packed down-conv 256 -> 64 (gr=2): per-element 64-lane outputs
    W0, W1, W2 = (jnp.asarray(rng.standard_normal((F, 64)) * 0.05,
                              jnp.float32) for _ in range(3))
    b = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    y = fused_conv_flat_dispatch(op, x2, B, jnp.concatenate([W0, W1, W2]),
                                 b, relu=True, out_pack=2)
    assert y.shape == (Vp, B * 64)
    np.testing.assert_allclose(np.asarray(y[:V].reshape(V, B, 64)),
                               np.asarray(canonical(W0, W1, W2, b)),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fo,gr", [(64, 2), (32, 4)])
def test_flat_strip_output_packing(fo, gr):
    """out_pack=gr emits gr-packed outputs (each element keeps only fo
    lanes) matching the canonical conv, so downstream packed convs consume
    them directly and both hops contract gr-fold fewer lanes."""
    from pose2mesh_release_tpu.ops.pallas_strip import fused_conv_flat_strip

    op = _synthetic_band_op(1, strip_h=64)
    nt, T = op.band_val.shape[1], op.block_size
    Vp = nt * T
    V = op.num_vertices
    B, F = 2 * gr, 128
    rng = np.random.default_rng(7)
    x3 = jnp.asarray(rng.standard_normal((V, B, F)) * 0.3, jnp.float32)
    W0, W1, W2 = (jnp.asarray(rng.standard_normal((F, fo)) * 0.05, jnp.float32)
                  for _ in range(3))
    b = jnp.asarray(rng.standard_normal((fo,)) * 0.1, jnp.float32)

    z1 = spmm_band(op, x3)
    z2 = 2.0 * spmm_band(op, z1) - x3
    y_ref = jnp.maximum(x3 @ W0 + z1 @ W1 + z2 @ W2 + b, 0.0)  # (V, B, fo)

    x2 = jnp.pad(x3.reshape(V, B * F), ((0, Vp - V), (0, 0)))
    W = jnp.concatenate([W0, W1, W2], axis=0)
    y = fused_conv_flat_strip(op, x2, B, W, b, relu=True, out_pack=gr)
    assert y.shape == (Vp, B * fo)
    np.testing.assert_allclose(np.asarray(y[:V].reshape(V, B, fo)),
                               np.asarray(y_ref), rtol=1e-4, atol=1e-4)


def test_fused_backward_impls_agree(band_op, monkeypatch):
    """The two _fused backward implementations — the fully fused kernel
    (P2M_BWD_FUSED=1, default: in-kernel hops + dx + dW/db accumulation)
    and the XLA grouped-hop formulation (=0) — must produce matching
    gradients (both are exact algebra; only the schedule differs)."""
    V = band_op.num_vertices
    F, Fout = 8, 4
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((V, 2, F)).astype(np.float32))
    Wb = jnp.asarray(rng.standard_normal((3 * F, Fout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((Fout,)).astype(np.float32) * 0.1)

    def loss(x, Wb, b):
        return (fused_cheby_project(band_op, x, Wb, b) ** 2).sum()

    grads = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("P2M_BWD_FUSED", flag)
        jax.clear_caches()  # env is read at trace time
        grads[flag] = jax.grad(loss, argnums=(0, 1, 2))(x, Wb, b)
    for a, bb in zip(grads["1"], grads["0"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-3)


@pytest.mark.slow
def test_fused_backward_asymmetric_channels(band_op):
    """The fused backward kernel at production-like ASYMMETRIC channel
    widths (Fin != Fout after lane padding — e.g. the SMPL schedule's
    128->256 and 256->128 convs hit (F, Fout) = (128, 256)/(256, 128) in
    the kernel).  Gradient parity vs the XLA chebyshev_stack reference."""
    V = band_op.num_vertices
    rng = np.random.default_rng(11)
    for F, Fout in ((128, 256), (256, 128)):
        x = jnp.asarray(rng.standard_normal((V, 1, F)).astype(np.float32) * 0.1)
        Wb = jnp.asarray(
            rng.standard_normal((3 * F, Fout)).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.standard_normal((Fout,)).astype(np.float32) * 0.1)
        Wc = Wb.reshape(3, F, Fout).transpose(1, 0, 2).reshape(F * 3, Fout)

        def f_fused(x, Wb, b):
            return (fused_cheby_project(band_op, x, Wb, b) ** 2).sum()

        def f_ref(x, Wc, b):
            return ((chebyshev_stack(band_op, x, 3) @ Wc + b) ** 2).sum()

        gx_f, gW_f, gb_f = jax.grad(f_fused, argnums=(0, 1, 2))(x, Wb, b)
        gx_r, gW_r, gb_r = jax.grad(f_ref, argnums=(0, 1, 2))(x, Wc, b)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   rtol=1e-3, atol=1e-2)
        gW_r_basis = np.asarray(gW_r).reshape(F, 3, Fout).transpose(
            1, 0, 2).reshape(3 * F, Fout)
        np.testing.assert_allclose(np.asarray(gW_f), gW_r_basis,
                                   rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_r),
                                   rtol=1e-3, atol=1e-2)


def test_fused_fold_matches_unfused(band_op):
    """fused_cheby_project_folded(x_raw, W, b, s, c) ==
    fused_cheby_project(relu(x_raw*s + c), W, b) in value AND in gradients
    wrt every input (the BN-fold training path, round 4)."""
    from pose2mesh_release_tpu.ops.pallas_cheby import (
        fused_cheby_project_folded,
    )

    V = band_op.num_vertices
    F, Fout = 8, 8
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((V, 2, F)).astype(np.float32))
    Wb = jnp.asarray(rng.standard_normal((3 * F, Fout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((Fout,)).astype(np.float32) * 0.1)
    s = jnp.asarray(rng.standard_normal((F,)).astype(np.float32) * 0.5 + 1.0)
    c = jnp.asarray(rng.standard_normal((F,)).astype(np.float32) * 0.1)

    def f_fold(x, Wb, b, s, c):
        return (fused_cheby_project_folded(band_op, x, Wb, b, s, c) ** 2).sum()

    def f_ref(x, Wb, b, s, c):
        u = jnp.maximum(x * s + c, 0.0)
        return (fused_cheby_project(band_op, u, Wb, b) ** 2).sum()

    vf = f_fold(x, Wb, b, s, c)
    vr = f_ref(x, Wb, b, s, c)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-4)
    gf = jax.grad(f_fold, argnums=(0, 1, 2, 3, 4))(x, Wb, b, s, c)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, Wb, b, s, c)
    for a, bb in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-3)


def test_fused_stats_kernel_matches(band_op):
    """fused_cheby_project_stats: y equals the plain fused conv; the
    emitted (sum_y, sum_y2) equal direct reductions of y; and the VJP
    (including cotangents flowing through the sums, the BatchNorm-stats
    path) matches the XLA reference formulation."""
    from pose2mesh_release_tpu.ops.pallas_cheby import (
        fused_cheby_project_stats,
    )

    V = band_op.num_vertices
    F, Fout = 128, 64  # asymmetric + lane-padded output
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((V, 2, F)).astype(np.float32))
    Wc = jnp.asarray(rng.standard_normal((F * 3, Fout)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal((Fout,)).astype(np.float32))
    Wb = Wc.reshape(F, 3, Fout).transpose(1, 0, 2).reshape(3 * F, Fout)

    y, s, s2 = fused_cheby_project_stats(band_op, x, Wb, b)
    y_ref = chebyshev_stack(band_op, x, 3) @ Wc + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(s), np.asarray(y_ref).sum((0, 1)),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s2),
                               (np.asarray(y_ref) ** 2).sum((0, 1)),
                               rtol=1e-3, atol=1e-2)

    # gradients: a BN-like loss consuming y AND the sums (mean/var path)
    n = V * 2

    def f_stats(x, Wb, b):
        y, s, s2 = fused_cheby_project_stats(band_op, x, Wb, b)
        mean = s / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        yn = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        return (yn ** 2).mean() + (jnp.maximum(yn, 0.0)).sum() * 1e-3

    def f_ref(x, Wc, b):
        y = chebyshev_stack(band_op, x, 3) @ Wc + b
        mean = y.mean(axis=(0, 1))
        var = jnp.maximum((y * y).mean(axis=(0, 1)) - mean * mean, 0.0)
        yn = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        return (yn ** 2).mean() + (jnp.maximum(yn, 0.0)).sum() * 1e-3

    gx_f, gW_f, gb_f = jax.grad(f_stats, argnums=(0, 1, 2))(x, Wb, b)
    gx_r, gW_r, gb_r = jax.grad(f_ref, argnums=(0, 1, 2))(x, Wc, b)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-2, atol=1e-3)
    gW_r_basis = np.asarray(gW_r).reshape(F, 3, Fout).transpose(1, 0, 2)         .reshape(3 * F, Fout)
    np.testing.assert_allclose(np.asarray(gW_f), gW_r_basis,
                               rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_r),
                               rtol=1e-2, atol=1e-3)


def test_kernel_bn_model_parity(monkeypatch):
    """Full MeshNet train step: P2M_KERNEL_BN=1 (stats from the fused
    kernel) must reproduce P2M_KERNEL_BN=0 (flax nn.BatchNorm) — outputs,
    gradients AND updated batch_stats."""
    from pose2mesh_release_tpu.models.meshnet import MeshNet

    _, faces = uv_sphere(770)
    pyr = build_pyramid(faces, joint_num=7, skeleton=[(0, 1), (1, 2)],
                        levels=4)
    art = pack_pyramid(pyr, dense_threshold=128, sparse_kind="band")
    n_mesh = len(art.mesh_ops)
    blocks = ((5, 16, 16),) + tuple((16, 16) for _ in range(n_mesh)) \
        + ((16, 8, 3),)
    model = MeshNet(blocks=blocks)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 7, 5)).astype(np.float32))

    monkeypatch.setenv("P2M_KERNEL_BN", "0")
    variables = model.init(jax.random.PRNGKey(0), art, x, True)

    def loss(params, flag):
        monkeypatch.setenv("P2M_KERNEL_BN", flag)
        out, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            art, x, True, mutable=["batch_stats"])
        return (out ** 2).mean(), (out, mut["batch_stats"])

    outs = {}
    for flag in ("0", "1"):
        (l, (out, bs)), g = jax.value_and_grad(loss, has_aux=True)(
            variables["params"], flag)
        outs[flag] = (l, out, bs, g)
    l0, out0, bs0, g0 = outs["0"]
    l1, out1, bs1, g1 = outs["1"]
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-3, atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3), bs0, bs1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3), g0, g1)


def test_fold_plus_kernel_bn_model_parity(monkeypatch):
    """P2M_FOLD_BN=1 + P2M_KERNEL_BN=1 (fold-consuming convs emit their own
    batch-stat sums from the fused kernel) must match the plain
    nn.BatchNorm path — outputs, gradients, updated batch_stats."""
    from pose2mesh_release_tpu.models.meshnet import MeshNet

    _, faces = uv_sphere(770)
    pyr = build_pyramid(faces, joint_num=7, skeleton=[(0, 1), (1, 2)],
                        levels=4)
    art = pack_pyramid(pyr, dense_threshold=128, sparse_kind="band")
    n_mesh = len(art.mesh_ops)
    # 3-conv blocks so the fold chain (conv_i -> conv_{i+1}) engages
    blocks = ((5, 16, 16),) + tuple((16, 16, 16) for _ in range(n_mesh)) \
        + ((16, 8, 3),)
    model = MeshNet(blocks=blocks)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 7, 5)).astype(np.float32))

    monkeypatch.setenv("P2M_FOLD_BN", "0")
    monkeypatch.setenv("P2M_KERNEL_BN", "0")
    variables = model.init(jax.random.PRNGKey(0), art, x, True)

    def loss(params, fold, kbn):
        monkeypatch.setenv("P2M_FOLD_BN", fold)
        monkeypatch.setenv("P2M_KERNEL_BN", kbn)
        out, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            art, x, True, mutable=["batch_stats"])
        return (out ** 2).mean(), (out, mut["batch_stats"])

    outs = {}
    for fold, kbn in (("0", "0"), ("1", "1")):
        (l, (out, bs)), g = jax.value_and_grad(loss, has_aux=True)(
            variables["params"], fold, kbn)
        outs[(fold, kbn)] = (l, out, bs, g)
    l0, out0, bs0, g0 = outs[("0", "0")]
    l1, out1, bs1, g1 = outs[("1", "1")]
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-3, atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3), bs0, bs1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3), g0, g1)
